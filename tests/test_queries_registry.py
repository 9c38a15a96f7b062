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
    from weather_api_automate_etl_spark.queries import ROUND12_WINDOW_HEAD

    assert not set(DISPLACED) & set(ROUND12_WINDOW_HEAD)


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
    per round; round 11 drove the never-driver-sampled set to ZERO, so
    from round 12 on the window is pure rotation. Pin round 12's evidence
    strategy, executed exactly as staged last round (round-11 verdict
    item 1): the window is the committed ROUND12_PENDING schedule
    verbatim — the 38 remaining r5-era rows + the 12-name r6-era cohort
    head. Everything outside the window already holds a green driver row,
    and the stalest of those rows are explicitly queued in the committed
    ROUND13_PENDING schedule."""
    from weather_api_automate_etl_spark.queries import (
        R5_ERA_STALE,
        R6_ERA_HEAD,
        ROUND12_PENDING,
        ROUND12_WINDOW_HEAD,
        ROUND13_PENDING,
        queries,
    )

    q = queries()
    assert len(q) == len(REGISTRY), "ordering must not drop registered queries"
    names = list(q)
    verified = _driver_verified()
    unverified = set(REGISTRY) - verified
    assert not unverified, (
        "round 11 drove the never-driver-sampled set to zero; it must "
        f"stay zero: {unverified}"
    )
    k = len(ROUND12_WINDOW_HEAD)
    assert k == 50, "the driver records exactly the first 50 entries"
    assert names[:k] == list(ROUND12_WINDOW_HEAD)
    assert ROUND12_WINDOW_HEAD == R5_ERA_STALE[3:] + R6_ERA_HEAD, (
        "round 12's window is exactly the staged schedule: the 38 "
        "remaining r5-era rows + the r6-era cohort head (round-11 "
        "verdict item 1)"
    )
    assert names[50:100] == list(ROUND13_PENDING) and len(ROUND13_PENDING) == 50, (
        "round 13's committed schedule must hold slots 51-100"
    )
    assert not set(ROUND12_PENDING) & set(ROUND13_PENDING)
    # every registered query carries a DuckDB oracle (no no_oracle rows
    # since the round-9 portable-HLL / zlib-lookup upgrades).
    from weather_api_automate_etl_spark.queries import oracle_sql

    assert set(oracle_sql()) == set(REGISTRY), (
        "every registered query must carry a DuckDB oracle: "
        f"missing {set(REGISTRY) - set(oracle_sql())}"
    )
    # Staleness guard — the HONEST bound. With 327 queries and a 50-slot
    # window the full cycle is ceil(327/50) = 7 rounds, so "≤4 rounds
    # stale" is impossible registry-wide. What the committed schedule
    # guarantees: a row last verified in round r exceeds 7 rounds at the
    # close of round r+8, so with evidence through round N every row
    # with r <= N-6 must already sit in the current or committed-next
    # window (it re-verifies within two rounds, before the bound trips).
    last = _last_verified_round()
    n_max = max(last.values())  # latest recorded round
    overdue = {n for n, r in last.items() if r <= n_max - 6}
    scheduled = set(ROUND12_WINDOW_HEAD) | set(ROUND13_PENDING)
    assert overdue <= scheduled, (
        f"rows about to exceed the 7-round freshness bound are unscheduled: "
        f"{overdue - scheduled}"
    )
    prefix = names[:50]
    tags_in_prefix = {tag for name in prefix for tag in REGISTRY[name].tags}
    # the round-12 window spans the r5-era corpus/embedding/streaming
    # cohort and the r6-era changepoint/analytics head. Multimodal and
    # the §2 ingest backbone hold r11 rows (the freshest possible) so
    # they take no slots this round.
    for family in ("corpus", "streaming", "text", "quality", "dedup"):
        assert family in tags_in_prefix, f"family {family!r} missing from prefix"
    # everything outside the window must already be driver-verified
    outside = set(names[50:]) - verified
    assert not outside, (
        f"queries outside the window lack prior driver rows: {outside}"
    )
