"""Round-11 property differentials, tenth batch: entity resolution and
intra-document repetition vs independent Python references."""


from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from weather_api_automate_etl_spark.operators import dedup

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------
# fuzzy_match_blocked vs brute-force Levenshtein
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),  # block
            st.text(alphabet="abc", min_size=0, max_size=5),
        ),
        min_size=2,
        max_size=12,
    ),
    max_dist=st.sampled_from([1, 2, 3]),
)
@SETTINGS
@pytest.mark.slow
def test_fuzzy_match_matches_brute_force(spark, rows, max_dist):
    data = [(i, f"b{blk}", name) for i, (blk, name) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, blk string, name string")
    got = {
        (r["p1"], r["p2"]): r["dist"]
        for r in dedup.fuzzy_match_blocked(
            df, "k", "blk", "name", max_dist
        ).collect()
    }
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if rows[i][0] != rows[j][0]:
                continue  # different blocks never pair
            d = _lev(rows[i][1], rows[j][1])
            if d <= max_dist:
                want[(i, j)] = d
    assert got == want


# ---------------------------------------------------------------------------
# fellegi_sunter_link vs python weight sum
# ---------------------------------------------------------------------------


@given(
    left=st.lists(
        st.tuples(
            st.integers(0, 1),
            st.one_of(st.none(), st.integers(0, 2)),
            st.one_of(st.none(), st.integers(0, 2)),
        ),
        min_size=1,
        max_size=8,
    ),
    right=st.lists(
        st.tuples(
            st.integers(0, 1),
            st.one_of(st.none(), st.integers(0, 2)),
            st.one_of(st.none(), st.integers(0, 2)),
        ),
        min_size=1,
        max_size=8,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_fellegi_sunter_matches_python(spark, left, right):
    schema_a = "ka long, blk int, f1 int, f2 int"
    schema_b = "kb long, blk int, f1 int, f2 int"
    da = spark.createDataFrame(
        [(i, b, x, y) for i, (b, x, y) in enumerate(left)], schema_a
    )
    db = spark.createDataFrame(
        [(i, b, x, y) for i, (b, x, y) in enumerate(right)], schema_b
    )
    fields = [("f1", 3.0, -1.0), ("f2", 1.5, -0.5)]
    got = {
        (r["ka"], r["kb"]): r["score"]
        for r in dedup.fellegi_sunter_link(
            da, db, "ka", "kb", ["blk"], fields
        ).collect()
    }
    want = {}
    for i, (ba, xa, ya) in enumerate(left):
        for j, (bb, xb, yb) in enumerate(right):
            if ba != bb:
                continue
            s = 0.0
            # agreement weight ONLY for non-NULL equal values; both-NULL
            # carries zero information -> disagreement weight
            s += 3.0 if (xa is not None and xa == xb) else -1.0
            s += 1.5 if (ya is not None and ya == yb) else -0.5
            want[(i, j)] = round(s, 6)
    assert got == want


# ---------------------------------------------------------------------------
# remove_intradoc_repeats vs python first-occurrence cover
# ---------------------------------------------------------------------------


@given(
    words=st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=14
    ),
    k=st.sampled_from([2, 3]),
)
@SETTINGS
@pytest.mark.slow
def test_intradoc_repeats_matches_python(spark, words, k):
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = dedup.remove_intradoc_repeats(df, k=k).collect()
    spans: dict[tuple, int] = {}
    covered: set[int] = set()
    for s in range(len(words) - k + 1):
        sp = tuple(words[s:s + k])
        first = spans.setdefault(sp, s)
        # repeat iff it starts >= k after the span's FIRST occurrence
        if s >= first + k:
            covered.update(range(s, s + k))
    clean = " ".join(w for p, w in enumerate(words) if p not in covered)
    assert r["clean_text"] == clean
    assert r["n_removed"] == len(covered)
