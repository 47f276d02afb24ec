"""Mutated-data differential fuzz: artifact freshness + determinism
(round 16 — tools/data_fuzz.py).

Every other parity artifact shares ONE clean data distribution; the
fuzz sweep re-runs the full oracle comparison over seeded mutations
(nulls / unicode / content-dups / extremes / tiny / empty).  These
tests pin (a) that the mutation builders are deterministic — the
committed FUZZ_PARITY.json must be reproducible — and (b) that the
committed artifact is fingerprint-fresh, covers every variant, and is
green, with every exemption carried in the artifact itself.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import data_fuzz  # noqa: E402


def _dir_hashes(d: str) -> dict:
    out = {}
    for name in sorted(os.listdir(d)):
        p = os.path.join(d, name)
        if os.path.islink(p):
            out[name] = "link:" + os.readlink(p)
        else:
            out[name] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def test_variant_build_is_deterministic():
    """Rebuilding a variant produces byte-identical parquet — without
    this the committed FUZZ_PARITY.json would not be reproducible."""
    d1, _ = data_fuzz.build_variant("nulls")
    h1 = _dir_hashes(d1)
    d2, _ = data_fuzz.build_variant("nulls")
    h2 = _dir_hashes(d2)
    assert h1 == h2
    assert any(not v.startswith("link:") for v in h1.values())
    assert any(v.startswith("link:") for v in h1.values())


def test_variants_cover_documented_axes():
    assert set(data_fuzz.VARIANTS) == {
        "nulls",
        "unicode",
        "dups",
        "extremes",
        "tiny",
        "empty",
    }


def test_fuzz_artifact_fresh_green_and_covering():
    path = os.path.join(REPO, "FUZZ_PARITY.json")
    assert os.path.exists(path), (
        "FUZZ_PARITY.json missing — run `python tools/data_fuzz.py`"
    )
    with open(path) as f:
        art = json.load(f)
    from pyspark_anomaly_detection_spark.registry import registry_fingerprint

    live = registry_fingerprint()
    stamped = art["registry_fingerprint"]
    assert stamped["registry_hash"] == live["registry_hash"], (
        "FUZZ_PARITY.json stale vs the registry — rerun tools/data_fuzz.py"
    )
    assert stamped["package_hash"] == live["package_hash"], (
        "FUZZ_PARITY.json stale vs the package tree — rerun "
        "tools/data_fuzz.py"
    )
    assert set(art["variants"]) == set(data_fuzz.VARIANTS)
    for name, v in art["variants"].items():
        assert v["n_fail"] == 0, (name, v["failures"])
        # exemptions in the artifact must match the live table — a code
        # edit to FUZZ_EXEMPT invalidates the artifact
        live_exempt = {
            q: why
            for (var, q), why in data_fuzz.FUZZ_EXEMPT.items()
            if var == name
        }
        assert v["exempt"] == live_exempt, name


def test_exempt_keys_are_known_variants_and_queries():
    from pyspark_anomaly_detection_spark.registry import all_queries

    names = set(all_queries())
    for variant, query in data_fuzz.FUZZ_EXEMPT:
        assert variant in data_fuzz.VARIANTS, variant
        assert query in names, query
