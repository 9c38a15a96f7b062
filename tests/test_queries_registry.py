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
    shift the verification window (the round-3 advice finding). Names
    retired via the documented displacement ledger (DISPLACED) are the
    one exception: the historical window-head tuples stay verbatim."""
    from weather_api_automate_etl_spark.queries import DISPLACED, PRIORITY_ORDER

    dangling = [
        n for n in PRIORITY_ORDER if n not in REGISTRY and n not in DISPLACED
    ]
    assert not dangling, f"PRIORITY_ORDER lists unregistered queries: {dangling}"
    ghosts = set(DISPLACED) & set(REGISTRY)
    assert not ghosts, f"DISPLACED queries still registered: {ghosts}"
    # a displaced name must not occupy a slot in the CURRENT window
    from weather_api_automate_etl_spark.queries import ROUND10_WINDOW_HEAD

    assert not set(DISPLACED) & set(ROUND10_WINDOW_HEAD)


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
    per round; the union of rounds 1-9 drove 255 of 327 queries green,
    leaving the 72-name residue (waves 40-58 + the ROUND9_PENDING tail)
    never-sampled. Pin round 10's evidence strategy, executed exactly as
    staged last round (round-9 verdict item 1): the window is the 34
    ROUND10_NEW names plus the first 16 of the ROUND9_PENDING tail; the
    remaining 24 tail names, any round-10 additions (ROUND11_NEW), and
    the 22 r4-era stale rows are explicitly queued for round 11; and
    everything outside the window already holds a green driver row (or
    is queued)."""
    from weather_api_automate_etl_spark.queries import (
        ROUND9_TAIL,
        ROUND10_NEW,
        ROUND10_WINDOW_HEAD,
        ROUND11_PENDING,
        queries,
    )

    q = queries()
    assert len(q) == len(REGISTRY), "ordering must not drop registered queries"
    names = list(q)
    verified = _driver_verified()
    unverified = set(REGISTRY) - verified
    k = len(ROUND10_WINDOW_HEAD)
    assert k == 50, "the driver records exactly the first 50 entries"
    assert names[:k] == list(ROUND10_WINDOW_HEAD)
    assert ROUND10_WINDOW_HEAD == ROUND10_NEW + ROUND9_TAIL[:16], (
        "round 10's window is exactly the staged schedule: all 34 round-9 "
        "additions + the first 16 pending-tail names (round-9 verdict item 1)"
    )
    # every registered query carries a DuckDB oracle (no no_oracle rows
    # since the round-9 portable-HLL / zlib-lookup upgrades).
    from weather_api_automate_etl_spark.queries import oracle_sql

    assert set(oracle_sql()) == set(REGISTRY), (
        "every registered query must carry a DuckDB oracle: "
        f"missing {set(REGISTRY) - set(oracle_sql())}"
    )
    assert unverified <= set(ROUND10_WINDOW_HEAD) | set(ROUND11_PENDING), (
        "every never-driver-verified query must open the round-10 window "
        "(or be explicitly queued in ROUND11_PENDING): "
        f"missing {unverified - set(ROUND10_WINDOW_HEAD) - set(ROUND11_PENDING)}"
    )
    # staleness guard: the stalest green rows are the 22 r4-era names,
    # all explicitly queued in ROUND11_PENDING; nothing pre-r4 may exist.
    last = _last_verified_round()
    stalest = {n for n, r in last.items() if r <= 3}
    assert not stalest, (
        f"rows with pre-r4 evidence must have re-verified by round 8: {stalest}"
    )
    from weather_api_automate_etl_spark.queries import R4_ERA_STALE, ROUND11_NEW

    r4_era = {n for n, r in last.items() if r == 4}
    assert r4_era <= set(R4_ERA_STALE) | set(ROUND10_WINDOW_HEAD), (
        f"r4-era rows missing from the round-11 schedule: "
        f"{r4_era - set(R4_ERA_STALE) - set(ROUND10_WINDOW_HEAD)}"
    )
    assert set(ROUND11_NEW).isdisjoint(verified), (
        "ROUND11_NEW is reserved for never-driver-sampled round-10 additions"
    )
    prefix = names[:50]
    tags_in_prefix = {tag for name in prefix for tag in REGISTRY[name].tags}
    # the round-10 window is 100% never-checked rotation; the staged names
    # span the stats/eval/multimodal/text/quality/corpus families. Ledger,
    # streaming, dedup and the §2 ingest backbone all hold r07-r09 rows
    # (the freshest possible) so they take no slots this round.
    for family in ("stats", "multimodal", "text", "quality", "corpus"):
        assert family in tags_in_prefix, f"family {family!r} missing from prefix"
    # everything outside the window must already be driver-verified, save
    # the explicitly-queued round-11 schedule
    outside = set(names[50:]) - verified - set(ROUND11_PENDING)
    assert not outside, (
        f"queries outside the window lack prior driver rows: {outside}"
    )
