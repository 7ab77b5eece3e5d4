"""Differentially-private group counts (dq.dp_group_counts): Laplace
mechanism with per-entity contribution bounding. The invariants that make
the release meaningful: one entity's influence on any published number is
capped regardless of how much data it injects, noise scale tracks 1/eps
exactly, and a re-run of the same release publishes identical numbers."""

from __future__ import annotations

import math

from kafka2iceberg_spark.dq import dp_group_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, source string")


def _release(spark, rows, **kw):
    out = dp_group_counts(
        _docs(spark, rows), "lang", "source", "doc_id", **kw
    ).collect()
    return {r["lang"]: r["released_count"] for r in out}


BASE = [(i, "en" if i % 2 else "de", f"s{i % 5}") for i in range(40)]


def test_deterministic_and_noisy(spark):
    a = _release(spark, BASE, release_id="r1")
    b = _release(spark, BASE, release_id="r1")
    c = _release(spark, BASE, release_id="r2")
    assert a == b  # pinned draw: re-publishing burns no extra budget
    assert a != c  # a fresh seed is a fresh draw
    true = {"en": 20.0, "de": 20.0}
    for lang, v in a.items():
        assert v != true[lang]  # noise actually applied
        # Laplace(b=32) tail: |X| > 20b has probability e^-20
        assert abs(v - true[lang]) < 20 * 32.0


def test_contribution_bounded(spark):
    """A single source spamming 1000 extra rows into one group moves the
    released number by at most row_cap (the noise term is pinned, so the
    difference isolates the bounded count)."""
    spam = BASE + [(1000 + i, "en", "s0") for i in range(1000)]
    clean = _release(spark, BASE, row_cap=8, release_id="r1")
    spammed = _release(spark, spam, row_cap=8, release_id="r1")
    assert spammed["en"] - clean["en"] <= 8.0 + 1e-9
    assert spammed["de"] == clean["de"]


def test_group_cap_limits_spread(spark):
    """An entity present in many groups counts toward at most group_cap of
    them: with group_cap=1 a single-source corpus publishes its rows in
    exactly one group."""
    rows = [(i, f"g{i % 6}", "only") for i in range(60)]
    rel = _release(spark, rows, row_cap=100, group_cap=1, release_id="r1")
    # every group still gets a (possibly noise-only) row; exactly one
    # carries the 10 bounded rows. Subtracting the pinned noise recovers
    # the bounded counts exactly.
    bounded = sorted(
        round(v - _noise("r1", g, 100 * 1)) for g, v in rel.items()
    )
    assert bounded == [0, 0, 0, 0, 0, 10]


def test_epsilon_scales_noise_exactly(spark):
    """Same pinned u, b twice as large at half the epsilon: the noise term
    doubles exactly."""
    hi = _release(spark, BASE, epsilon_ppm=1_000_000, release_id="r1")
    lo = _release(spark, BASE, epsilon_ppm=500_000, release_id="r1")
    for lang in hi:
        n_hi = hi[lang] - _true(lang)
        n_lo = lo[lang] - _true(lang)
        assert math.isclose(n_lo, 2 * n_hi, rel_tol=1e-12)


def _true(lang):
    return 20.0


def _noise(release_id, group, sensitivity, epsilon=1.0):
    import hashlib

    h = int(hashlib.md5(f"{release_id}:{group}".encode()).hexdigest()[:15], 16)
    u = (h + 0.5) / 2**60
    b = sensitivity / epsilon
    return -b * math.copysign(1.0, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
