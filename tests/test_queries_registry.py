"""Registry-wide smoke at sf0.001: every declared query runs and returns a
stable schema; bench-tagged queries return rows."""

from __future__ import annotations

import pytest

from weather_api_automate_etl_spark.queries import REGISTRY, _load_extensions

_load_extensions()
SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF)
    assert df.columns, f"{name} produced no columns"
    if spec.oracle is not None:
        complex_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        assert not complex_cols, (
            f"{name}: complex-typed columns {complex_cols} break the driver's "
            "pandas canonicalization — serialize to strings in both twins"
        )
    n = df.count()
    # violation-style and threshold queries may legitimately be empty;
    # everything else must produce rows at sf0.001. The triangle/LPA pair
    # queries inherit q_minhash_pairs' emptiness (no candidate pairs on a
    # tiny/regenerated fixture is a legitimate outcome, not a bug)
    may_be_empty = {
        "q_minhash_pairs", "q_ngram_jaccard", "q_neardup_cosine",
        "q_triangle_count", "q_label_propagation", "q_kcore",
    }
    if name not in may_be_empty:
        assert n > 0, f"{name} returned 0 rows"


def test_oracle_keys_subset():
    from weather_api_automate_etl_spark.queries import oracle_sql, queries

    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 34


def test_priority_order_names_are_registered():
    """Every PRIORITY_ORDER name must exist in the registry — a dangling
    name is silently skipped by _ordered_registry, which would quietly
    shift the verification window (the round-3 advice finding)."""
    from weather_api_automate_etl_spark.queries import PRIORITY_ORDER

    dangling = [n for n in PRIORITY_ORDER if n not in REGISTRY]
    assert not dangling, f"PRIORITY_ORDER lists unregistered queries: {dangling}"


def _driver_verified() -> set[str]:
    """Union of green rows across every recorded CORRECTNESS_r*.json.

    The evidence files are tracked in git, so their absence is a broken
    checkout, not a skippable condition (round-3 advice finding)."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    assert len(files) >= 3, (
        f"expected the tracked CORRECTNESS_r01..r03 evidence files, found {files}"
    )
    verified: set[str] = set()
    for p in files:
        rows = json.loads(p.read_text())
        verified |= {
            name for name, row in rows.items()
            if row.get("rows_match") and row.get("schema_match")
        }
    return verified


def _last_verified_round() -> dict[str, int]:
    """Map each query to the LAST round whose CORRECTNESS file recorded a
    green row for it — the staleness metric the rotation plan runs on."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    last: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        for name, row in json.loads(p.read_text()).items():
            if row.get("rows_match") and row.get("schema_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def test_priority_prefix_covers_every_family():
    """External verification records exactly the first 50 registry entries
    per round; the union of rounds 1-8 drove 205 of 295 queries green, and
    the 90-name residue (ROUND9_PENDING, waves 13-39) has never been
    sampled. Pin round 9's evidence strategy: the whole window is the
    first 50 pending names in registration order (no re-verification
    slots — every §2 backbone query holds an r07/r08 green row, the
    freshest possible), the remaining 40 plus any round-9 additions are
    explicitly queued for round 10 (ROUND10_PENDING), and everything
    outside the window already holds a green driver row (or is queued, or
    is rows-only-by-nature with a hash twin)."""
    from weather_api_automate_etl_spark.queries import (
        ROUND9_PENDING,
        ROUND9_WINDOW_HEAD,
        ROUND10_PENDING,
        queries,
    )

    q = queries()
    assert len(q) == len(REGISTRY), "ordering must not drop registered queries"
    names = list(q)
    verified = _driver_verified()
    unverified = set(REGISTRY) - verified
    k = len(ROUND9_WINDOW_HEAD)
    assert k == 50, "the driver records exactly the first 50 entries"
    assert names[:k] == list(ROUND9_WINDOW_HEAD)
    assert ROUND9_WINDOW_HEAD == ROUND9_PENDING[:50], (
        "round 9's window is exactly the first 50 never-driver-checked "
        "names in registration order (round-8 verdict item 1)"
    )
    # the former rows-only residue gained hash oracles in round 9
    # (portable md5-HLL profile; precomputed zlib lookup) and is queued
    # in ROUND10_NEW for its first triple-green driver rows — no
    # registered query records `no_oracle` anymore.
    from weather_api_automate_etl_spark.queries import oracle_sql

    assert set(oracle_sql()) == set(REGISTRY), (
        "every registered query must carry a DuckDB oracle: "
        f"missing {set(REGISTRY) - set(oracle_sql())}"
    )
    rows_only: set[str] = set()
    assert unverified - rows_only <= set(ROUND9_WINDOW_HEAD) | set(
        ROUND10_PENDING
    ), (
        "every never-driver-verified query must open the round-9 window "
        "(or be explicitly queued in ROUND10_PENDING): "
        f"missing {unverified - rows_only - set(ROUND9_WINDOW_HEAD) - set(ROUND10_PENDING)}"
    )
    # staleness guard: after r8 landed, the stalest green rows are the 22
    # r4-era names; the committed round-10 schedule (queries.py docstring
    # at ROUND10_PENDING) takes 10 of them in slots 41-50 and round 11
    # takes the rest, so nothing pre-r4 may exist at all.
    last = _last_verified_round()
    stalest = {n for n, r in last.items() if r <= 3}
    assert not stalest, (
        f"rows with pre-r4 evidence must have re-verified by round 8: {stalest}"
    )
    prefix = names[:50]
    tags_in_prefix = {tag for name in prefix for tag in REGISTRY[name].tags}
    # ingest is deliberately absent this round: its members all hold
    # r07/r08 rows and the window is 100% never-checked rotation.
    for family in ("dedup", "similarity", "text", "windows", "streaming",
                   "multimodal", "ledger", "cdc", "stats"):
        assert family in tags_in_prefix, f"family {family!r} missing from prefix"
    # everything outside the window must already be driver-verified, save
    # the explicitly-queued round-10 schedule and the rows-only residue
    outside = set(names[50:]) - verified - set(ROUND10_PENDING) - rows_only
    assert not outside, (
        f"queries outside the window lack prior driver rows: {outside}"
    )
