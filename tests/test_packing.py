"""Sequence packing: greedy first-fit into token-budget windows within
deterministic hash buckets (operators/packing.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 37) % 90 + 5)), "s")
        for i in range(200)
    ]
    rows.append((1000, "", "s"))          # empty text: 0 tokens
    rows.append((None, "x y z", "s"))     # null id: dropped
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return df.cache()


def test_pack_invariants(docs):
    packed = pack_sequences(docs, context_tokens=64, num_buckets=8)
    pdf = packed.toPandas()

    # every non-null-id doc assigned exactly once
    assert pdf.doc_id.is_unique and len(pdf) == 201

    # capacity: window fill <= context unless the window is one oversize doc
    g = pdf.groupby(["bucket", "window_idx"]).agg(
        fill=("n_tokens", "sum"), n=("doc_id", "count"), ov=("oversize", "max")
    )
    bad = g[(g.fill > 64) & ~((g.n == 1) & g.ov)]
    assert bad.empty

    # oversize flag is exactly n_tokens > context
    assert (pdf.oversize == (pdf.n_tokens > 64)).all()

    # window_idx dense and pos_in_window contiguous within each window
    for b, grp in pdf.groupby("bucket"):
        wins = sorted(grp.window_idx.unique())
        assert wins == list(range(len(wins)))
    for (_, _), grp in pdf.groupby(["bucket", "window_idx"]):
        assert sorted(grp.pos_in_window) == list(range(len(grp)))


def test_pack_deterministic_across_partitioning(docs):
    a = pack_sequences(docs, context_tokens=64, num_buckets=8).toPandas()
    b = pack_sequences(
        docs.repartition(13, "text"), context_tokens=64, num_buckets=8
    ).toPandas()
    key = ["doc_id", "bucket", "window_idx", "pos_in_window"]
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True)[key],
        b.sort_values("doc_id").reset_index(drop=True)[key],
    )


def test_packing_summary(docs):
    packed = pack_sequences(docs, context_tokens=64, num_buckets=8).cache()
    summ = packing_summary(packed, context_tokens=64).toPandas()
    pdf = packed.toPandas()
    assert len(summ) == pdf.groupby(["bucket", "window_idx"]).ngroups
    # padding negative exactly for oversize windows
    merged = summ.merge(
        pdf.groupby(["bucket", "window_idx"])
        .agg(ov=("oversize", "max"))
        .reset_index(),
        on=["bucket", "window_idx"],
    )
    assert ((merged.padding_tokens < 0) == merged.ov).all()
    assert (merged.fill_tokens + merged.padding_tokens == 64).all()
    packed.unpersist()


def test_pack_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, context_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, context_tokens=64, num_buckets=0)


def test_pack_ffd_tighter_and_deterministic(docs):
    hash_order = pack_sequences(docs, context_tokens=64, num_buckets=8)
    ffd = pack_sequences(docs, context_tokens=64, num_buckets=8, order="size")
    n_hash = hash_order.select("bucket", "window_idx").distinct().count()
    n_ffd = ffd.select("bucket", "window_idx").distinct().count()
    # first-fit-decreasing never needs more windows than hash order here,
    # and on this size mix it strictly saves some
    assert n_ffd <= n_hash
    # capacity invariant holds in size order too
    pdf = ffd.toPandas()
    g = pdf.groupby(["bucket", "window_idx"]).agg(
        fill=("n_tokens", "sum"), n=("doc_id", "count"), ov=("oversize", "max")
    )
    assert g[(g.fill > 64) & ~((g.n == 1) & g.ov)].empty
    # deterministic across partitioning
    a = ffd.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        pack_sequences(
            docs.repartition(11, "text"), context_tokens=64, num_buckets=8,
            order="size",
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pack_string_ids_round_trip(spark):
    # round-3 verdict #5: a string-keyed corpus (URLs, content hashes —
    # the common case in LLM pipelines) must keep doc identity: the id
    # column's NATIVE type survives to the output, no silent cast-to-long
    # nulls
    rows = [
        (f"sha256:{i:04x}", " ".join(f"w{j}" for j in range((i * 19) % 70 + 3)))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    packed = pack_sequences(df, context_tokens=64, num_buckets=8)
    assert packed.schema["doc_id"].dataType.simpleString() == "string"
    pdf = packed.toPandas()
    assert pdf.doc_id.notna().all()
    assert set(pdf.doc_id) == {r[0] for r in rows}
    # capacity invariant holds with string keys too
    g = pdf.groupby(["bucket", "window_idx"]).agg(
        fill=("n_tokens", "sum"), n=("doc_id", "count"), ov=("oversize", "max")
    )
    assert g[(g.fill > 64) & ~((g.n == 1) & g.ov)].empty
    # deterministic across partitioning
    b = (
        pack_sequences(df.repartition(9, "text"), context_tokens=64, num_buckets=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        pdf.sort_values("doc_id").reset_index(drop=True), b
    )


def test_pack_rejects_bad_order(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, context_tokens=64, order="random")
