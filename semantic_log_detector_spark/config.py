"""Declarative check-suite configuration (YAML/JSON).

Mirrors the reference's config tree with defaults + validation
(`src/ids/config_loader.py:15-95`, `config/ids_config.yaml`): a checks.yaml
compiles to a SuiteConfig. Unknown keys are rejected (the reference warns
and drops; rejecting is safer for a validation engine).

Example checks.yaml:

    num_parts: 64
    waves: 4
    checks: [schema, row_rules, stats, uniqueness, referential, frequency, drift]
    allowed_codecs: [pcm_s16le, flac, mulaw, alaw, adpcm_ima, opus, mp3]
    sr_range: [4000, 96000]
    rate_range: [6.5, 26.5]   # R018 transcript chars/sec band
    psi_threshold: 0.2
    stats_expectations:
      sr_hz:
        - [null_rate, "<=", 0.01]
        - [min, ">=", 4000]
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

from .plans.runner import SuiteConfig

_FIELDS = {f.name for f in dataclasses.fields(SuiteConfig)}


def load_config(path: str) -> SuiteConfig:
    text = Path(path).read_text()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore

            raw = yaml.safe_load(text)
        except ImportError as e:  # pragma: no cover - yaml is in-container
            raise RuntimeError("pyyaml unavailable; use a .json config") from e
    else:
        raw = json.loads(text)
    return from_dict(raw or {})


def from_dict(raw: dict) -> SuiteConfig:
    unknown = set(raw) - _FIELDS
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)} (known: {sorted(_FIELDS)})")
    kw = dict(raw)
    for key in ("checks", "allowed_codecs"):
        if key in kw:
            kw[key] = tuple(kw[key])
    for key in ("sr_range", "dur_range"):
        if key in kw:
            v = kw[key]
            if len(v) != 2 or v[0] > v[1]:
                raise ValueError(f"{key} must be [lo, hi] with lo <= hi, got {v}")
            kw[key] = (int(v[0]), int(v[1]))
    if "rate_range" in kw:
        v = kw["rate_range"]
        if len(v) != 2 or v[0] > v[1]:
            raise ValueError(f"rate_range must be [lo, hi] with lo <= hi, got {v}")
        kw["rate_range"] = (float(v[0]), float(v[1]))
    if "stats_expectations" in kw:
        kw["stats_expectations"] = tuple(
            (col, tuple((f, op, float(t)) for f, op, t in exps))
            for col, exps in dict(kw["stats_expectations"]).items()
        )
    cfg = SuiteConfig(**kw)
    from .plans.runner import ALL_CHECKS

    bad = set(cfg.checks) - set(ALL_CHECKS)
    if bad:
        raise ValueError(f"unknown checks: {sorted(bad)}")
    if cfg.waves < 1 or cfg.num_parts < 1:
        raise ValueError("waves and num_parts must be >= 1")
    return cfg
