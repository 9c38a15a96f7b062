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
    per round; the union of rounds 1-7 drove every query green except the
    round-7 hand-off (ROUND8_PENDING) and the rows-only residue. Pin
    round 8's evidence strategy: the window opens with every query no
    prior round verified (derived from the CORRECTNESS files themselves,
    so this test self-maintains as evidence lands), continues with ALL
    rows whose last green round is r3 (the stalest cohort — nothing may
    turn 4+ rounds old), keeps one representative per LLM-pipeline family
    inside the window, and everything outside the window already holds a
    green driver row no older than r4 (or is explicitly queued in
    ROUND9_PENDING for the next hand-off, or is rows-only-by-nature with
    a hash twin)."""
    from weather_api_automate_etl_spark.queries import (
        ROUND8_PENDING,
        ROUND8_WINDOW_HEAD,
        ROUND9_PENDING,
        queries,
    )

    q = queries()
    assert len(q) == len(REGISTRY), "ordering must not drop registered queries"
    names = list(q)
    verified = _driver_verified()
    unverified = set(REGISTRY) - verified
    k = len(ROUND8_WINDOW_HEAD)
    assert k == 50, "the driver records exactly the first 50 entries"
    assert names[:k] == list(ROUND8_WINDOW_HEAD)
    assert set(ROUND8_PENDING) == set(ROUND8_WINDOW_HEAD[:10]), (
        "the round-7 hand-off must open the round-8 window"
    )
    # rows-only-by-nature entries record `no_oracle`, never a green row;
    # each carries a hash twin or bounded test (see PARITY.md). They are
    # exempt from the must-open-the-window rule. q_pca_project LEFT this
    # set in round 8 (fixed-round deflated power iteration gave it a hash
    # oracle) and sits in the window to land its first triple-green row.
    rows_only = {"q_compression_ratio", "q_profile_table_approx"}
    assert unverified - rows_only <= set(ROUND8_WINDOW_HEAD) | set(
        ROUND9_PENDING
    ), (
        "every never-driver-verified query must open the round-8 window "
        "(or be explicitly queued in ROUND9_PENDING): "
        f"missing {unverified - rows_only - set(ROUND8_WINDOW_HEAD) - set(ROUND9_PENDING)}"
    )
    last = _last_verified_round()
    stalest = {n for n, r in last.items() if r <= 3}
    assert stalest <= set(ROUND8_WINDOW_HEAD), (
        f"r3-era rows must re-verify this round, missing: "
        f"{stalest - set(ROUND8_WINDOW_HEAD)}"
    )
    prefix = names[:50]
    tags_in_prefix = {tag for name in prefix for tag in REGISTRY[name].tags}
    for family in ("dedup", "similarity", "text", "windows", "streaming",
                   "multimodal", "ingest"):
        assert family in tags_in_prefix, f"family {family!r} missing from prefix"
    # everything outside the window must already be driver-verified, save
    # the explicitly-queued round-9 hand-off set and the rows-only residue
    outside = set(names[50:]) - verified - set(ROUND9_PENDING) - rows_only
    assert not outside, (
        f"queries outside the window lack prior driver rows: {outside}"
    )
