"""Round-11 property differentials, sixth batch: the dedup backbone
(connected components, blocked Jaccard, containment) vs independent
Python references on arbitrary inputs. CC had a real latent convergence
defect in round 10 — a randomized union-find differential is the guard
that class of bug deserves."""


from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from weather_api_automate_etl_spark.operators import dedup

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# connected_components vs union-find
# ---------------------------------------------------------------------------


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=25,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(df, max_iterations=30).collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {
        n: min(m for m in parent if find(m) == find(n))
        for n in parent
    }
    assert got == want


# ---------------------------------------------------------------------------
# ngram_jaccard_pairs / containment_pairs vs brute force
# ---------------------------------------------------------------------------

_doc_st = st.lists(
    st.sampled_from(["apple", "banana", "cherry", "dog", "elk", "fox"]),
    min_size=1,
    max_size=8,
).map(" ".join)


@given(
    docs=st.lists(_doc_st, min_size=2, max_size=8),
    threshold=st.sampled_from([0.2, 0.5, 0.8]),
)
@SETTINGS
@pytest.mark.slow
def test_ngram_jaccard_matches_brute_force(spark, docs, threshold):
    df = spark.createDataFrame(
        [(i, t, "blk") for i, t in enumerate(docs)],
        "doc_id long, text string, b string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", "b", threshold
        ).collect()
    }
    sets = [set(t.split()) for t in docs]
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            jac = round(inter / len(sets[i] | sets[j]), 6)
            if jac >= threshold:
                want[(i, j)] = jac
    assert got == want


@given(
    docs=st.lists(_doc_st, min_size=2, max_size=8),
    threshold=st.sampled_from([0.3, 0.6, 1.0]),
)
@SETTINGS
@pytest.mark.slow
def test_containment_matches_brute_force(spark, docs, threshold):
    df = spark.createDataFrame(
        [(i, t, "blk") for i, t in enumerate(docs)],
        "doc_id long, text string, b string",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["c_ab"], r["c_ba"], r["containment"])
        for r in dedup.containment_pairs(
            df, "doc_id", "text", "b", threshold
        ).collect()
    }
    sets = [set(t.split()) for t in docs]
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            c_ab = round(inter / len(sets[i]), 6)
            c_ba = round(inter / len(sets[j]), 6)
            if max(c_ab, c_ba) >= threshold:
                want[(i, j)] = (c_ab, c_ba, max(c_ab, c_ba))
    assert got == want


# ---------------------------------------------------------------------------
# dedup_exact keep-rule vs python
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 100)),
        min_size=1,
        max_size=25,
    ),
)
@SETTINGS
def test_dedup_exact_matches_python_keep_first(spark, rows):
    # content c, id i: survivors = the lowest id per content value
    data = [(i, f"t{c}") for i, (c, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in dedup.dedup_exact(df, ["text"], "doc_id").collect()
    )
    first: dict[str, int] = {}
    for i, (c, _) in enumerate(rows):
        first.setdefault(f"t{c}", i)
    assert got == sorted(first.values())
