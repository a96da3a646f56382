"""Standing acoustic-dedup state (plans/ann_index.py, round 5): every
validation increment appends its 8-byte melody fingerprints; a new feed is
checked for content duplicates against the WHOLE corpus so far without
re-decoding a single old payload, and old-vs-old pairs are never
re-reported (they were the output of their own increment's check)."""

import os

import pytest

from semantic_log_detector_spark.plans.ann_index import (
    AnnIndexConfig,
    append_increment_index,
    incremental_dup_pairs,
    read_dedup_fps,
)
from semantic_log_detector_spark.sources.synth import content_dup_clips

# fingerprints only — PQ/landmark maintenance has its own tests
CFG = AnnIndexConfig(pq=False, landmarks=False, dedup_fps=True)


@pytest.fixture(scope="module")
def corpus(spark):
    df = content_dup_clips(spark, 240, seed=13).cache()
    df.count()
    yield df
    df.unpersist()


def _planted(df):
    """{(dup_clip_id, src_clip_id)} — dups are odd rows, sources even."""
    return {
        (r.clip_id, r.src_clip_id)
        for r in df.filter("is_dup").select("clip_id", "src_clip_id").collect()
    }


def _tree_state(path):
    out = []
    for root, _, names in os.walk(path):
        for n in sorted(names):
            p = os.path.join(root, n)
            st = os.stat(p)
            out.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    return sorted(out)


def test_cross_increment_dups_found_without_old_decode(spark, corpus, tmp_path):
    # increment A = every source (even idx), increment B = every dup +
    # odd non-dups: ALL planted pairs cross the increment boundary
    out = str(tmp_path / "out")
    inc_a = corpus.filter("idx % 2 = 0")
    inc_b = corpus.filter("idx % 2 = 1")
    sa = append_increment_index(spark, inc_a, out, "incrA", CFG)
    assert sa["dedup_fp_rows"] > 0 and sa["pq_rows"] == 0
    assert sa["text_fp_rows"] == 0  # corpus has no transcript column

    # A alone: no earlier increments, no planted intra pairs → empty
    first = incremental_dup_pairs(spark, out, "incrA")
    assert first.count() == 0
    assert set(first.columns) == {"id_a", "id_b", "hamming", "match_kind"}

    a_state = _tree_state(f"{out}/ann_index/dedup_fps/incr=incrA")
    append_increment_index(spark, inc_b, out, "incrB", CFG)
    # appending B never rewrites A's fingerprint files
    assert _tree_state(f"{out}/ann_index/dedup_fps/incr=incrA") == a_state

    got = incremental_dup_pairs(spark, out, "incrB").collect()
    expected = _planted(corpus)
    assert len(expected) > 20  # the plant actually planted
    assert all(r.match_kind == "existing" for r in got)
    assert {(r.id_a, r.id_b) for r in got} == expected  # recall AND precision 1.0


def test_within_increment_dups_and_no_old_old_rereport(spark, corpus, tmp_path):
    # split by idx instead: planted pairs are adjacent (even, odd) so each
    # pair lands WHOLLY inside one half — A's pairs must NOT come back
    # when B is checked, B's must come back as match_kind='increment'
    out = str(tmp_path / "out")
    inc_a = corpus.filter("idx < 120")
    inc_b = corpus.filter("idx >= 120")
    append_increment_index(spark, inc_a, out, "incrA", CFG)
    append_increment_index(spark, inc_b, out, "incrB", CFG)

    got = incremental_dup_pairs(spark, out, "incrB").collect()
    assert all(r.match_kind == "increment" for r in got)  # no cross matches
    found = {frozenset((r.id_a, r.id_b)) for r in got}
    exp_b = {frozenset(p) for p in _planted(inc_b)}
    exp_a = {frozenset(p) for p in _planted(inc_a)}
    assert exp_b and exp_a  # both halves carry planted pairs
    assert found == exp_b  # B's pairs exactly; none of A's re-reported
    assert not (found & exp_a)


def test_standing_table_reads_all_increments(spark, corpus, tmp_path):
    out = str(tmp_path / "out")
    append_increment_index(spark, corpus.filter("idx < 120"), out, "i1", CFG)
    append_increment_index(spark, corpus.filter("idx >= 120"), out, "i2", CFG)
    fps = read_dedup_fps(spark, out)
    assert set(fps.columns) >= {"id", "fp", "incr"}
    assert fps.select("incr").distinct().count() == 2
    # every non-fake, non-silent clip is represented exactly once
    assert fps.count() == fps.select("id").distinct().count()


def test_no_state_raises_clearly(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="dedup fingerprint state"):
        incremental_dup_pairs(spark, str(tmp_path / "nowhere"), "x")


def test_validate_increment_dup_check_end_to_end(spark, corpus, tmp_path):
    # the product path: each feed validated + dup-checked as it lands
    from semantic_log_detector_spark.plans.incremental import validate_increment
    from semantic_log_detector_spark.plans.runner import SuiteConfig

    from pyspark.sql import functions as F

    table = str(tmp_path / "table")
    out = str(tmp_path / "out")
    suite = SuiteConfig(num_parts=4, checks=("row_rules",))

    # the sketch writer expects the input_hint schema (transcript present)
    corpus = corpus.withColumn("transcript", F.concat(F.lit("t "), "clip_id"))
    corpus.filter("idx % 2 = 0").write.mode("append").parquet(table)
    n1, r1 = validate_increment(spark, table, out, suite, ann=CFG,
                                dup_check=True)
    assert n1 > 0
    assert r1.dup_check["existing"] == 0 and r1.dup_check["increment"] == 0
    # transcript present → the text axis rides along
    assert set(r1.dup_check["by_axis"]) == {"audio", "text"}

    corpus.filter("idx % 2 = 1").write.mode("append").parquet(table)
    n2, r2 = validate_increment(spark, table, out, suite, ann=CFG,
                                dup_check=True)
    assert n2 > 0
    n_planted = corpus.filter("is_dup").count()
    # the planted pairs duplicate CONTENT, not words: audio axis flags
    # them all, the text axis (distinct per-clip transcripts) stays quiet
    assert r2.dup_check["by_axis"]["audio"]["existing"] == n_planted
    assert r2.dup_check["by_axis"]["text"] == {"existing": 0, "increment": 0}
    assert r2.dup_check["increment"] == 0
    pairs = spark.read.parquet(r2.dup_check["path"])
    assert {
        (r.id_a, r.id_b)
        for r in pairs.filter("axis = 'audio'").collect()
    } == _planted(corpus)

    # the report surfaces the ingest dup-check from the pairs table alone
    from semantic_log_detector_spark.plans.report import write_report

    rep = write_report(spark, out)
    assert rep["incremental_dups"] == {
        "n_pairs_existing": n_planted,
        "n_pairs_within_feed": 0,
        "feeds_checked": 2,
        "by_axis": {"audio": {"existing": n_planted}},
    }
    md = open(os.path.join(out, "report.md")).read()
    assert "ingest dup-check over 2 feed(s)" in md


def test_dup_check_requires_fingerprint_state(spark, corpus, tmp_path):
    from semantic_log_detector_spark.plans.incremental import validate_increment
    from semantic_log_detector_spark.plans.runner import SuiteConfig

    table = str(tmp_path / "t")
    corpus.limit(10).write.parquet(table)
    with pytest.raises(ValueError, match="dup_check"):
        validate_increment(spark, table, str(tmp_path / "o"),
                           SuiteConfig(num_parts=2, checks=("row_rules",)),
                           dup_check=True)


def test_text_axis_catches_rerecorded_words(spark, corpus, tmp_path):
    # the cross-modal gate: a feed clip that RE-RECORDS an existing
    # transcript (different audio, same words) is invisible to the melody
    # fp but caught on the text axis — and vice versa nothing false-fires
    from pyspark.sql import functions as F

    from semantic_log_detector_spark.plans.incremental import validate_increment
    from semantic_log_detector_spark.plans.runner import SuiteConfig

    table = str(tmp_path / "table")
    out = str(tmp_path / "out")
    suite = SuiteConfig(num_parts=4, checks=("row_rules",))

    # genuinely distinct word sets per clip (8 md5-derived tokens): a
    # shared-carrier-phrase fixture ("the quick brown fox ... <id>") is
    # itself a NEAR-DUP corpus — SimHash correctly flagged all of it —
    # so distinctness has to be by construction, not by suffix
    base = corpus.filter("NOT is_dup").withColumn(
        "transcript",
        F.concat_ws(" ", *[
            F.substring(
                F.md5(F.concat(F.col("clip_id"), F.lit(f"#{k}"))), 1, 8)
            for k in range(8)
        ]),
    )
    inc_a = base.filter("idx % 2 = 0")
    a_row = inc_a.orderBy("idx").first()
    # increment B: fresh audio content everywhere (non-dup rows), but one
    # clip re-records a_row's exact transcript
    inc_b = base.filter("idx % 2 = 1").withColumn(
        "transcript",
        F.when(F.col("clip_id") == base.filter("idx % 2 = 1")
               .orderBy("idx").first()["clip_id"],
               F.lit(a_row["transcript"]))
        .otherwise(F.col("transcript")),
    )
    b_id = inc_b.orderBy("idx").first()["clip_id"]

    inc_a.write.mode("append").parquet(table)
    validate_increment(spark, table, out, suite, ann=CFG, dup_check=True)
    inc_b.write.mode("append").parquet(table)
    _, r2 = validate_increment(spark, table, out, suite, ann=CFG,
                               dup_check=True)

    assert r2.dup_check["by_axis"]["text"]["existing"] == 1
    assert r2.dup_check["by_axis"]["audio"]["existing"] == 0
    pair = spark.read.parquet(r2.dup_check["path"]) \
        .filter("axis = 'text'").collect()
    assert len(pair) == 1
    assert (pair[0]["id_a"], pair[0]["id_b"]) == (b_id, a_row["clip_id"])
    assert pair[0]["hamming"] == 0


def test_same_id_across_increments_is_not_a_dup_pair(spark, corpus, tmp_path):
    # crash-window rerun whose recomputed fingerprint diverged: the SAME
    # clip appended under two incr tags is a self-row, never an
    # 'existing' duplicate of itself
    out = str(tmp_path / "out")
    inc_a = corpus.filter("idx % 2 = 0")
    append_increment_index(spark, inc_a, out, "incrA", CFG)
    append_increment_index(spark, inc_a, out, "incrB", CFG)  # re-append
    got = incremental_dup_pairs(spark, out, "incrB").collect()
    assert not [r for r in got if r["id_a"] == r["id_b"]]
    assert not [r for r in got if r["match_kind"] == "existing"]
