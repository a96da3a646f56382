"""Standing ANN index maintenance (plans/ann_index.py, round-4 verdict
item 8): each validation increment appends its PQ codes and snippet
landmarks; searches see old + new rows; old increments' code files are
provably never rewritten; codebooks are fit once and frozen."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.plans.ann_index import (
    AnnIndexConfig,
    append_increment_index,
    landmark_index_search,
    load_pq_codebooks,
    pq_index_topk,
    read_landmarks,
    read_pq_codes,
)
from semantic_log_detector_spark.plans.incremental import validate_increment
from semantic_log_detector_spark.plans.runner import SuiteConfig

N_PARTS = 8
CFG = SuiteConfig(num_parts=N_PARTS, checks=("row_rules",))
# small ksub + bounded fit so the test corpus trains in seconds
ANN = AnnIndexConfig(ksub=16, max_train_vectors=400, landmarks=True)


def _write_batch(spark, table_dir, n, seed):
    from semantic_log_detector_spark.sources.synth import clips_table

    # clip ids unique ACROSS increments (synth reuses the id space per
    # seed; an index keyed on clip_id needs the uniqueness the suite's
    # own uniqueness check enforces on real corpora)
    clips_table(spark, n, seed=seed, num_parts=N_PARTS, with_bytes=True) \
        .withColumn("clip_id", F.concat(F.lit(f"s{seed}_"), "clip_id")) \
        .write.mode("append").parquet(table_dir)


def _tree_state(path):
    """(relpath, size, mtime_ns) of every file under path — byte-rewrite
    detector for the old-codes-never-recomputed claim."""
    out = []
    for root, _, names in os.walk(path):
        for n in sorted(names):
            p = os.path.join(root, n)
            st = os.stat(p)
            out.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    return sorted(out)


def test_increments_append_codes_and_search_spans_both(spark, tmp_path):
    table = str(tmp_path / "table")
    out = str(tmp_path / "out")
    _write_batch(spark, table, 250, seed=1)
    n1, res1 = validate_increment(spark, table, out, CFG, ann=ANN)
    assert n1 > 0 and res1 is not None

    idx = f"{out}/ann_index"
    incr_dirs = lambda sub: sorted(
        d for d in os.listdir(f"{idx}/{sub}") if d.startswith("incr="))
    assert len(incr_dirs("pq_codes")) == 1
    ids1 = {r["clip_id"]
            for r in read_pq_codes(spark, out).select("clip_id").collect()}
    n_codes1 = len(ids1)
    assert n_codes1 > 0
    cb1 = load_pq_codebooks(spark, f"{idx}/pq_codebooks")
    assert cb1.shape == (ANN.m, ANN.ksub, 40 // ANN.m)

    # snapshot increment-1's on-disk state before appending increment 2
    # (key by the actual incr dir name — fingerprints sort arbitrarily)
    dir1 = {sub: incr_dirs(sub)[0] for sub in ("pq_codes", "landmarks")}
    state1 = {
        sub: _tree_state(os.path.join(idx, sub, dir1[sub]))
        for sub in ("pq_codes", "landmarks")
    }
    cb_state = _tree_state(f"{idx}/pq_codebooks")

    _write_batch(spark, table, 150, seed=2)
    n2, res2 = validate_increment(spark, table, out, CFG, ann=ANN)
    assert n2 > 0 and res2 is not None

    # append, not rebuild: a second incr dir appears; increment 1's code
    # and landmark part files are byte-for-byte untouched (size + mtime),
    # and the frozen codebooks were not refit
    assert len(incr_dirs("pq_codes")) == 2
    for sub in ("pq_codes", "landmarks"):
        assert _tree_state(os.path.join(idx, sub, dir1[sub])) \
            == state1[sub], f"{sub}: increment 1 files were rewritten"
    assert _tree_state(f"{idx}/pq_codebooks") == cb_state
    assert np.array_equal(load_pq_codebooks(spark, f"{idx}/pq_codebooks"), cb1)

    # the combined codes table covers every embeddable clip of BOTH
    # increments, exactly once each
    codes = read_pq_codes(spark, out)
    assert codes.count() > n_codes1
    assert codes.select("clip_id").distinct().count() == codes.count()

    # search finds old and new rows: query with the exact embedding of one
    # clip per increment; exact rerank must return it at rank 1, dist 0
    from semantic_log_detector_spark.plans.ann_index import (
        _increment_embeddings,
    )

    emb = _increment_embeddings(spark.read.parquet(table), ANN).cache()
    ids = {r["clip_id"] for r in codes.select("clip_id").collect()}
    want = sorted(ids & ids1)[:1] + sorted(ids - ids1)[:1]
    assert len(want) == 2, "need one probe per increment"
    probes = emb.filter(F.col("clip_id").isin(want)) \
        .select(F.concat(F.lit("probe_"), "clip_id").alias("q_id"),
                "embedding")
    hits = pq_index_topk(spark, out, probes, k=3,
                         rerank=10, rerank_base=emb).toPandas()
    top1 = hits[hits["rank"] == 1].set_index("q_id")
    for cid in want:
        assert top1.loc[f"probe_{cid}", "clip_id"] == cid
        assert top1.loc[f"probe_{cid}", "dist"] == pytest.approx(0.0)
    emb.unpersist()


def test_rerun_same_increment_overwrites_not_duplicates(spark, tmp_path):
    # crash-idempotency: re-encoding the same fingerprint lands in the
    # same incr dir via overwrite — row count is unchanged
    from semantic_log_detector_spark.sources.synth import clips_table

    out = str(tmp_path / "out")
    clips = clips_table(spark, 120, seed=5, num_parts=N_PARTS,
                        with_bytes=True)
    s1 = append_increment_index(spark, clips, out, "fp_same", ANN)
    s2 = append_increment_index(spark, clips, out, "fp_same", ANN)
    assert s1 == s2
    assert read_pq_codes(spark, out).count() == s1["pq_rows"]
    assert read_landmarks(spark, out).count() == s1["landmark_rows"]


def test_landmark_index_serves_snippets_from_both_increments(spark, tmp_path):
    # melody corpus (landmark-dense) appended as two increments directly;
    # snippet cut from a clip of each increment retrieves its source at
    # the right offset through the persisted index
    from semantic_log_detector_spark.sources.synth import melody_clips
    from tests.test_audio_search import _cut_snippet

    out = str(tmp_path / "out")
    cfg = AnnIndexConfig(pq=False, landmarks=True)
    b1 = melody_clips(spark, 30, seed=11).cache()
    b2 = melody_clips(spark, 30, seed=22) \
        .withColumn("clip_id", F.concat(F.lit("b2_"), "clip_id")).cache()
    append_increment_index(spark, b1, out, "fp1", cfg)
    append_increment_index(spark, b2, out, "fp2", cfg)

    r1 = b1.filter(F.col("idx") == 3).collect()[0]
    r2 = b2.filter(F.col("idx") == 7).collect()[0]
    q = spark.createDataFrame(
        [("q_old", _cut_snippet(r1["bytes"], r1["codec"], 1.5, 3.0), "mulaw"),
         ("q_new", _cut_snippet(r2["bytes"], r2["codec"], 2.2, 3.0), "mulaw")],
        "clip_id string, bytes binary, codec string")
    hits = landmark_index_search(spark, out, q).toPandas()
    top1 = hits[hits["rank"] == 1].set_index("query_id")
    assert top1.loc["q_old", "clip_id"] == r1["clip_id"]
    assert top1.loc["q_new", "clip_id"] == r2["clip_id"]
    assert abs(top1.loc["q_old", "offset_s"] - 1.5) <= 0.2
    assert abs(top1.loc["q_new", "offset_s"] - 2.2) <= 0.2
    b1.unpersist()
    b2.unpersist()


def test_search_without_index_raises(spark, tmp_path):
    q = spark.createDataFrame([("q0", [0.0] * 40)],
                              "q_id string, embedding array<double>")
    with pytest.raises(ValueError, match="no PQ index"):
        pq_index_topk(spark, str(tmp_path / "nowhere"), q)
