"""Wave-21 operator tests: pointer-doubling hierarchy flattening and the
2-D skyline."""

from __future__ import annotations

import pytest

from weather_api_automate_etl_spark.operators import graph, stats


def _forest(spark, rows):
    return spark.createDataFrame(rows, "node long, parent long")


# ---------------------------------------------------------------------------
# pointer doubling
# ---------------------------------------------------------------------------


def test_pointer_doubling_depths_and_roots(spark):
    # two trees + one isolated root
    rows = [(1, 1), (2, 1), (3, 1), (4, 2), (5, 4), (6, 5), (7, 6),
            (10, 10), (11, 10)]
    out = {r["node"]: (r["root"], r["depth"]) for r in
           graph.pointer_doubling_roots(_forest(spark, rows)).collect()}
    assert out == {
        1: (1, 0), 2: (1, 1), 3: (1, 1), 4: (1, 2), 5: (1, 3),
        6: (1, 4), 7: (1, 5), 10: (10, 0), 11: (10, 1),
    }


def test_pointer_doubling_needs_log_rounds(spark):
    """A depth-31 chain must flatten within 5 doubling rounds (2^5=32) —
    the O(log D) property; the one-level-per-round walk would need 31."""
    rows = [(0, 0)] + [(i, i - 1) for i in range(1, 32)]
    out = graph.pointer_doubling_roots(
        _forest(spark, rows), max_rounds=6
    ).collect()
    depths = {r["node"]: r["depth"] for r in out}
    assert depths[31] == 31 and all(r["root"] == 0 for r in out)


def test_pointer_doubling_null_parent_is_root(spark):
    df = spark.createDataFrame([(5, None), (6, 5)], "node long, parent long")
    out = {r["node"]: (r["root"], r["depth"]) for r in
           graph.pointer_doubling_roots(df).collect()}
    assert out == {5: (5, 0), 6: (5, 1)}


@pytest.mark.slow
def test_pointer_doubling_rejects_dangling_and_cycles(spark):
    with pytest.raises(ValueError, match="not closed"):
        graph.pointer_doubling_roots(_forest(spark, [(1, 99)]))
    with pytest.raises(RuntimeError, match="cycle"):
        graph.pointer_doubling_roots(
            _forest(spark, [(1, 2), (2, 1)]), max_rounds=6
        )
    with pytest.raises(RuntimeError):
        graph.pointer_doubling_roots(
            _forest(spark, [(1, 2), (2, 3), (3, 1)]), max_rounds=6
        )


# ---------------------------------------------------------------------------
# 2-D skyline
# ---------------------------------------------------------------------------


def _pts(spark, rows):
    return spark.createDataFrame(rows, "grp string, mx double, mn double")


def test_skyline_matches_bruteforce_dominance(spark):
    rows = [("g", float((i * 17) % 23), float((i * 29) % 19))
            for i in range(60)]
    df = _pts(spark, rows)
    got = sorted((r["mx"], r["mn"]) for r in
                 stats.skyline_2d(df, "grp", "mx", "mn").collect())
    pts = sorted(set((x, y) for _, x, y in rows))
    ref = sorted(
        p for p in pts
        if not any(
            q != p and q[0] >= p[0] and q[1] <= p[1] for q in pts
        )
    )
    assert got == ref


def test_skyline_tie_semantics(spark):
    """Equal-max rows: only the min-cost one survives; exact duplicates
    collapse to one frontier row; a strictly-dominated point dies."""
    rows = [("g", 10.0, 5.0), ("g", 10.0, 3.0), ("g", 10.0, 3.0),
            ("g", 9.0, 3.0), ("g", 8.0, 1.0)]
    got = sorted((r["mx"], r["mn"]) for r in
                 stats.skyline_2d(_pts(spark, rows), "grp", "mx", "mn")
                 .collect())
    assert got == [(8.0, 1.0), (10.0, 3.0)]


def test_skyline_groups_are_independent(spark):
    rows = [("a", 1.0, 1.0), ("b", 100.0, 0.1)]
    got = stats.skyline_2d(_pts(spark, rows), "grp", "mx", "mn").collect()
    assert len(got) == 2  # a's weak point is b-dominated but survives in a
