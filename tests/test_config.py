"""Config loading: YAML → SuiteConfig with validation."""

import pytest

from semantic_log_detector_spark.config import from_dict, load_config


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "checks.yaml"
    p.write_text(
        """
num_parts: 32
waves: 4
checks: [schema, row_rules, stats]
sr_range: [8000, 48000]
psi_threshold: 0.3
stats_expectations:
  sr_hz:
    - [null_rate, "<=", 0.05]
"""
    )
    cfg = load_config(str(p))
    assert cfg.num_parts == 32 and cfg.waves == 4
    assert cfg.checks == ("schema", "row_rules", "stats")
    assert cfg.sr_range == (8000, 48000)
    assert cfg.stats_expectations == (("sr_hz", (("null_rate", "<=", 0.05),)),)
    assert cfg.config_hash() != from_dict({}).config_hash()


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown config keys"):
        from_dict({"frobnicate": 1})


def test_bad_range_rejected():
    with pytest.raises(ValueError, match="lo <= hi"):
        from_dict({"sr_range": [96000, 4000]})


def test_unknown_check_rejected():
    with pytest.raises(ValueError, match="unknown checks"):
        from_dict({"checks": ["row_rules", "mystery"]})
