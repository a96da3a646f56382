"""Quarantine split: clean ∪ quarantined partitions the corpus exactly,
reasons ride along, rule/severity scoping works."""

import pyspark.sql.functions as F
import pytest

from semantic_log_detector_spark.checks.base import RunContext
from semantic_log_detector_spark.checks.row_rules import default_clip_rules, run_row_rules
from semantic_log_detector_spark.plans.quarantine import split_quarantine

CTX = RunContext(run_id="q", num_parts=64)


@pytest.fixture(scope="module")
def suite(meta_4k):
    res = run_row_rules(meta_4k, default_clip_rules(), CTX)
    viol = res.violations.persist()
    yield meta_4k, viol
    viol.unpersist()


def test_partition_is_exact(suite):
    clips, viol = suite
    r = split_quarantine(clips, viol)
    n, nc, nq = clips.count(), r.clean.count(), r.quarantined.count()
    assert nc + nq == n
    # every ROW whose id is named (duplicated ids fan out — R020 names the
    # id once, both physical rows quarantine) and nothing else
    named = viol.filter("clip_id IS NOT NULL").select("clip_id").distinct()
    assert nq == clips.join(named, "clip_id", "left_semi").count()
    # no id appears on both sides
    both = r.clean.select("clip_id").intersect(r.quarantined.select("clip_id"))
    assert both.count() == 0


def test_reasons_and_planted_ids(suite):
    clips, viol = suite
    r = split_quarantine(clips, viol)
    null_sr_ids = {x["clip_id"] for x in clips.filter("sr_hz IS NULL")
                   .select("clip_id").collect()}
    got = {x["clip_id"]: x["quarantine_rules"]
           for x in r.quarantined.select("clip_id", "quarantine_rules").collect()}
    assert null_sr_ids and null_sr_ids <= set(got)
    for cid in null_sr_ids:
        assert "R010_sr_null" in got[cid]
    # rule lists are sorted distinct
    for rules in got.values():
        assert rules == sorted(set(rules))


def test_rule_scoping(suite):
    clips, viol = suite
    r = split_quarantine(clips, viol, rules=["R010_sr_null"])
    named = viol.filter("rule_id = 'R010_sr_null'").select("clip_id").distinct()
    assert r.quarantined.count() == clips.join(named, "clip_id", "left_semi").count()
    only = {x[0] for x in r.quarantined.select(
        F.explode("quarantine_rules")).collect()}
    assert only == {"R010_sr_null"}


def test_severity_scoping(suite):
    clips, viol = suite
    sevs = {x["severity"] for x in viol.select("severity").distinct().collect()}
    assert len(sevs) > 1  # the fixture spans severities
    pick = sorted(sevs)[0]
    r = split_quarantine(clips, viol, severities=[pick])
    named = viol.filter(
        (F.col("severity") == pick) & F.col("clip_id").isNotNull()
    ).select("clip_id").distinct()
    assert r.quarantined.count() == clips.join(named, "clip_id", "left_semi").count()
