"""Dedup + similarity operator properties (planted duplicates, recall)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F

from weather_api_automate_etl_spark.operators import dedup, similarity

DOC = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different words about spark shuffles and partitions here"


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=1, text=DOC), Row(doc_id=2, text=DOC),      # exact dup
         Row(doc_id=3, text=NEAR), Row(doc_id=4, text=OTHER)]
    )


def test_dedup_exact_keeps_lowest_id(spark):
    kept = dedup.dedup_exact(_docs(spark), [F.md5("text")], "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 4]


def test_minhash_exact_dups_collide_everywhere(spark):
    sig = dedup.minhash_signatures(_docs(spark), "doc_id", "text")
    pairs = dedup.minhash_candidate_pairs(sig, "doc_id")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got           # identical docs share all 4 band buckets
    assert (1, 4) not in got       # unrelated docs don't collide


def test_simhash_similar_docs_close(spark):
    sh = {r.doc_id: r.simhash for r in
          dedup.simhash(_docs(spark), "doc_id", "text").collect()}
    assert sh[1] == sh[2]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[1], sh[3]) <= ham(sh[1], sh[4])


def test_ngram_jaccard_finds_near_dup(spark):
    docs = _docs(spark).withColumn("blk", F.lit(1))
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", "blk", threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (3, 4) not in got and got[(1, 3)] >= 0.5


def test_embedding_neardup_and_lsh(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0], label=0),
        Row(vec_id=2, embedding=[0.99, 0.1, 0.0, 0.0], label=0),
        Row(vec_id=3, embedding=[-1.0, 0.05, 0.0, 0.0], label=0),
    ]
    emb = spark.createDataFrame(rows)
    pairs = dedup.embedding_neardup_pairs(emb, "vec_id", "embedding", "label", 0.9)
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(1, 2)}
    buckets = {r.vec_id: r.bucket for r in
               similarity.hyperplane_lsh_buckets(emb, "embedding", dim=4).collect()}
    assert buckets[1] == buckets[2]   # near-identical directions collide
    assert buckets[1] != buckets[3]   # opposite direction separates


def test_ivf_probes_right_list(spark):
    # two tight clusters; query near cluster A must recall A's members
    a = [[1.0, 0.0, 0.0, 0.0], [0.98, 0.05, 0.0, 0.0], [0.97, -0.05, 0.0, 0.0]]
    b = [[0.0, 1.0, 0.0, 0.0], [0.05, 0.99, 0.0, 0.0], [-0.05, 0.97, 0.0, 0.0]]
    rows = [Row(vec_id=i, embedding=v, label=0) for i, v in enumerate(a)]
    rows += [Row(vec_id=10 + i, embedding=v, label=1) for i, v in enumerate(b)]
    emb = spark.createDataFrame(rows)
    got = similarity.ivf_topk(emb, "embedding", "label", [1.0, 0.01, 0.0, 0.0],
                              k=3, nprobe=1)
    assert {r.vec_id for r in got.collect()} == {0, 1, 2}


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4-5 (diameter > 1 round), island {10, 11}, node 20 untouched
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    comp = {r.id: r.comp for r in dedup.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_clusters_labels_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame([(2, 4), (4, 6)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5, 6: 2}


def test_simhash_pairs_complete_vs_brute_force(spark):
    # hand signatures: pairs at hamming 0..5; blocking must find ALL <= 3
    sigs = spark.createDataFrame(
        [
            (1, 0b1010101010101010),
            (2, 0b1010101010101010),  # d(1,2)=0
            (3, 0b1010101010101011),  # d(1,3)=1
            (4, 0b1010101010101000),  # d(3,4)=2... various
            (5, 0b0101010101010101),  # far from all
            (6, 0b1010101011111010),  # mid
        ],
        "doc_id long, simhash long",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_pairs(sigs, max_hamming=3).collect()
    }
    rows = {r.doc_id: r.simhash for r in sigs.collect()}
    want = {
        (a, b): bin(rows[a] ^ rows[b]).count("1")
        for a in rows
        for b in rows
        if a < b and bin(rows[a] ^ rows[b]).count("1") <= 3
    }
    assert got == want


def test_knn_join_per_probe_topk_and_plan(spark):
    from weather_api_automate_etl_spark.operators import similarity
    from weather_api_automate_etl_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "probe_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    res = similarity.knn_join(corpus, probes, "embedding", dim=64, k=5, n_planes=6)
    rows = res.collect()
    per_probe = {}
    for r in rows:
        per_probe.setdefault(r.probe_id, []).append(r)
    for pid, rs in per_probe.items():
        assert len(rs) <= 5
        ranked = sorted(rs, key=lambda r: r.rk)
        scores = [r.score for r in ranked]
        assert scores == sorted(scores, reverse=True), f"probe {pid} not ranked"
        assert [r.rk for r in ranked] == list(range(1, len(rs) + 1))
    # scale shape: bucket equi-join, never a cartesian; per-probe top-k is
    # pushed down map-side (WindowGroupLimit)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_connected_components_raises_on_nonconvergence(spark):
    # a 6-node chain has diameter 5: min-label needs ~5 rounds; 2 is not enough
    import pytest as _pytest

    from weather_api_automate_etl_spark.operators import dedup

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iterations=2)
    # and with budget it converges to the chain's min label
    comp = {r.id: r.comp for r in dedup.connected_components(edges).collect()}
    assert set(comp.values()) == {1}


def test_duplicated_shingle_fraction_hand_case(spark):
    from weather_api_automate_etl_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # shingles: "a b c", "b c d"
            (2, "a b c x"),        # shingles: "a b c", "b c x"
            (3, "p q r s"),        # unique shingles
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_shingles, r.dup_frac) for r in
           dedup.duplicated_shingle_fraction(docs, k=3).collect()}
    assert got == {1: (2, 0.5), 2: (2, 0.5), 3: (2, 0.0)}


def test_connected_components_string_ids(spark):
    # the label-sum fast probe is numeric-only; string ids must take the
    # type-agnostic join probe and still converge correctly
    from weather_api_automate_etl_spark.operators import dedup

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    comp = {r.id: r.comp for r in dedup.connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_pagerank_hand_case(spark):
    # star graph 1-{2,3,4} + isolated 5: center accumulates; leaves equal;
    # isolated node keeps teleport-only rank; total mass conserved
    from weather_api_automate_etl_spark.operators import graph

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    edges = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    r = {x.doc_id: x.rank for x in graph.pagerank(nodes, edges, iterations=10).collect()}
    assert r[2] == r[3] == r[4]
    assert r[1] > r[2] > r[5]
    # isolated node: teleport + its share of redistributed dangling mass,
    # strictly more than teleport alone but less than any linked node
    assert r[5] > 0.15 / 5
    # dangling mass redistributed => total rank mass conserved at 1
    assert abs(sum(r.values()) - 1.0) < 1e-9


@pytest.mark.slow
def test_pagerank_convergence_mode(spark):
    from weather_api_automate_etl_spark.operators import graph

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    edges = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    tol = 1e-9
    conv = {
        x.doc_id: x.rank
        for x in graph.pagerank(
            nodes, edges, tolerance=tol, max_iterations=200
        ).collect()
    }
    # mass conserved at the fixed point too
    assert abs(sum(conv.values()) - 1.0) < 1e-9
    # converged ranks agree with a long fixed-iteration power run to within
    # the tolerance (both approximate the same stationary distribution)
    fixed = {
        x.doc_id: x.rank
        for x in graph.pagerank(nodes, edges, iterations=120).collect()
    }
    for k in conv:
        assert abs(conv[k] - fixed[k]) < 1e-6, k
    # the probe is honest: an unreachable tolerance within 1 round raises
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not reach"):
        graph.pagerank(nodes, edges, tolerance=1e-15, max_iterations=1)


def test_kmeans_fit_recovers_blobs_and_converges(spark):
    from weather_api_automate_etl_spark.operators import similarity

    rows = []
    for i in range(12):
        rows.append((i, [10.0 + (i % 3) * 0.1, 0.0, 1.0]))
        rows.append((100 + i, [0.0, 10.0 + (i % 3) * 0.1, 1.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, rounds, converged = similarity.kmeans_fit(
        emb, k=2, max_iter=10, tol=1e-6
    )
    assert converged and 1 <= rounds <= 10
    assert cents.count() == 2
    got = {
        r.vec_id: r.list_id
        for r in similarity.nearest_centroid(emb, cents).collect()
    }
    # the two well-separated blobs land in two pure clusters
    a = {got[i] for i in range(12)}
    b = {got[100 + i] for i in range(12)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # not-converged is reported, not raised: one round cannot reach 1e-12
    _, _, flag = similarity.kmeans_fit(emb, k=2, max_iter=1, tol=1e-12)
    assert flag is False


def test_kmeans_fit_duplicate_rows_and_empty_clusters_keep_k(spark):
    # review finding: duplicate vectors among the lowest ids must not
    # seed identical centroids, and an emptied cluster keeps its previous
    # centroid — the codebook never silently shrinks below k
    from weather_api_automate_etl_spark.operators import similarity

    rows = [(0, [5.0, 0.0]), (1, [5.0, 0.0]), (2, [5.0, 0.0]),
            (3, [0.0, 7.0]), (4, [0.0, 7.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, _, converged = similarity.kmeans_fit(emb, k=2, max_iter=5, tol=1e-9)
    assert cents.count() == 2
    got = {
        r.vec_id: r.list_id
        for r in similarity.nearest_centroid(emb, cents).collect()
    }
    assert len({got[0], got[3]}) == 2  # the two point groups separate
    assert converged


def test_nearest_centroid_recovers_separated_labels(spark):
    # two well-separated clusters: every vector assigns to its own label's
    # centroid, scores in (0, 1]
    from weather_api_automate_etl_spark.operators import similarity

    rows = []
    for i in range(10):
        rows.append((i, [10.0 + (i % 3), 0.0, 1.0], 0))
        rows.append((100 + i, [0.0, 10.0 + (i % 3), 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    cents = similarity.centroids_by(emb, "embedding", "label")
    got = {r.vec_id: r.list_id for r in similarity.nearest_centroid(emb, cents).collect()}
    assert all(got[i] == 0 for i in range(10))
    assert all(got[100 + i] == 1 for i in range(10))


def test_cluster_survivors_keep_longest(spark):
    from weather_api_automate_etl_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (5, 99)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {(r.cluster_id, r.survivor_id, r.n_docs)
           for r in dedup.cluster_survivors(docs, pairs).collect()}
    # cluster {1,2,3}: longest is tie 2/3 -> lowest id 2; singletons survive
    assert got == {(1, 2, 3), (4, 4, 1), (5, 5, 1)}


@pytest.mark.slow
def test_kmeans_fit_clamped_is_partition_invariant(spark):
    """clamp_digits pins the whole convergence loop to round-6 centroid
    representatives, so the fit — codebook, round count, stop flag — must
    be IDENTICAL regardless of input partitioning (the property the
    q_kmeans recursive-CTE oracle relies on; unclamped fits only promise
    this up to last-ulp drift)."""
    from weather_api_automate_etl_spark.operators import similarity

    rows = []
    for i in range(40):
        rows.append((i, [10.0 + (i % 7) * 0.3, (i % 5) * 0.1, 1.0]))
        rows.append((100 + i, [(i % 5) * 0.1, 10.0 + (i % 7) * 0.3, 1.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def fit(df):
        cents, rounds, conv = similarity.kmeans_fit(
            df, k=2, max_iter=10, tol=1e-6, clamp_digits=6
        )
        return (
            sorted((r.list_id, tuple(r.centroid)) for r in cents.collect()),
            rounds,
            conv,
        )

    a = fit(emb.coalesce(1))
    b = fit(emb.repartition(17))
    assert a == b
    # every component is exactly its round-6 representative
    for _, cent in a[0]:
        for x in cent:
            assert x == round(x, 6)


@pytest.mark.slow
def test_round10_dedup_review_fixes(spark):
    """Regression pins for the round-10 dedup review findings."""
    from pyspark.sql import functions as F

    from weather_api_automate_etl_spark.operators import dedup

    # (1) dedup_incremental: NULL text hashes like '' — re-ingesting the
    # same contentless row across batches dedupes instead of leaking
    b1 = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    known = spark.createDataFrame([], "content_hash string")
    s1 = dedup.dedup_incremental(b1, known, "doc_id", "text")
    assert s1.count() == 2
    state = s1.select(
        F.md5(F.coalesce("text", F.lit(""))).alias("content_hash")
    )
    b2 = spark.createDataFrame([(3, None), (4, "y")], "doc_id long, text string")
    s2 = dedup.dedup_incremental(b2, state, "doc_id", "text")
    assert [r.doc_id for r in s2.collect()] == [4]

    # (2) simhash validates bits
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 4"):
        dedup.simhash(b1, "doc_id", "text", bits=18)

    # (3) connected_components: fractional ids take the exact join probe
    # (the decimal-sum probe can round a real label change away)
    e = spark.createDataFrame(
        [(2.4, 1.6), (1.6, 0.9)], "id_a double, id_b double"
    )
    comps = {
        (r.id, r.comp) for r in dedup.connected_components(e).collect()
    }
    assert comps == {(2.4, 0.9), (1.6, 0.9), (0.9, 0.9)}

    # (4) span removal reports n_removed = 0 for NULL text, never -1/NULL
    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d e f a b c d e f")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_removed for r in
           dedup.remove_intradoc_repeats(docs, k=3).collect()}
    assert out[1] == 0

    # (5) vectorized neardup drops NULL blocks/vectors like the HOF twin
    rows = [
        (1, [1.0, 0.0], None),     # NULL block: join twin emits nothing
        (2, [1.0, 0.0], None),
        (3, None, "b"),            # NULL vector: join twin drops it
        (4, [0.0, 1.0], "b"),
        (5, [0.0, 1.0], "b"),
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>, blk string")
    got = sorted(
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs_vectorized(
            df, "id", "vec", "blk", threshold=0.99
        ).collect()
    )
    assert got == [(4, 5)]

    # (6) fellegi_sunter: both-NULL fields score as DISAGREEMENT, and
    # identical key names are rejected loudly
    a = spark.createDataFrame([(1, "x", None)], "ka long, blk string, f string")
    b = spark.createDataFrame([(9, "x", None)], "kb long, blk string, f string")
    score = dedup.fellegi_sunter_link(
        a, b, "ka", "kb", ["blk"], [("f", 3.0, -1.0)]
    ).collect()[0]["score"]
    assert score == -1.0
    with _pytest.raises(ValueError, match="must differ"):
        dedup.fellegi_sunter_link(a, b, "ka", "ka", ["blk"], [("f", 3.0, -1.0)])


@pytest.mark.slow
def test_round10_similarity_review_fixes(spark):
    """Regression pins for the round-10 similarity review findings."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from weather_api_automate_etl_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    # (1) k larger than the corpus returns the available picks, no crash
    out = similarity.mmr_rerank(df, "embedding", [1.0, 0.0], k=5, shortlist=9)
    assert out.count() == 3
    assert [r.rank for r in out.orderBy("rank").collect()] == [1, 2, 3]
    # (2) a zero-norm query yields an empty, well-typed result
    assert similarity.mmr_rerank(df, "embedding", [0.0, 0.0], k=2).count() == 0
    # (3) the output id keeps the caller's name and type
    sdf = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "doc long, embedding array<double>".replace("doc long", "doc string"),
    )
    got = similarity.mmr_rerank(sdf, "embedding", [1.0, 0.0], k=2, id_col="doc")
    assert got.columns == ["rank", "doc", "rel", "mmr_score"]
    assert {r.doc for r in got.collect()} == {"a", "b"}
    # (4) lsh validates n_planes
    with _pytest.raises(ValueError, match="n_planes"):
        similarity.hyperplane_lsh_buckets(df, "embedding", dim=2, n_planes=0)
    # (5) kmeans_fit drops NULL embeddings and errors clearly when empty
    with_null = df.union(
        spark.createDataFrame([(9, None)], "vec_id long, embedding array<double>")
    )
    cents_df, _rounds, _conv = similarity.kmeans_fit(with_null, k=2)
    assert cents_df.count() == 2
    with _pytest.raises(ValueError, match="non-null vector"):
        similarity.kmeans_fit(
            spark.createDataFrame([], "vec_id long, embedding array<double>"),
            k=2,
        )


def test_lsh_bucket_and_cosine_sql_match_column_composition(spark):
    """Round-13 pin (the round-12 PQ discipline): lsh_bucket_expr and the
    SQL-text cosine render their trees as one SQL string instead of
    per-node py4j Column composition (~0.4 s per 6x64 bucket build). The
    rendered tree must be SEMANTICALLY IDENTICAL to the old composition —
    replicated here as the reference — on awkward doubles (negative,
    tiny-exponent, half-boundary, zero-norm → NULL cosine)."""
    from pyspark.sql import functions as F

    from weather_api_automate_etl_spark.functions.vectors import (
        cosine_similarity,
        cosine_similarity_sql,
        dot_product,
        sql_ident,
        sql_vec_lit,
    )
    from weather_api_automate_etl_spark.operators import similarity

    dim, n_planes = 4, 5
    df = spark.createDataFrame(
        [
            (1, [0.1, -3.25, 7.25, -1e-12]),
            (2, [1e-07, 2.0, 0.0, 4.5]),
            (3, [-0.5, 0.30000000000000004, 2.5, 2.5]),
            (4, [0.0, 0.0, 0.0, 0.0]),  # zero norm -> NULL cosine
            (5, [0.05, -1.0, 1.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )

    # reference: the pre-round-13 Column-composed bucket
    bucket_ref = None
    for p in range(n_planes):
        proj = dot_product(
            F.col("embedding"),
            F.array(
                *[F.lit(float(x)) for x in similarity._hyperplane(p, dim)]
            ),
        )
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket_ref = bit if bucket_ref is None else bucket_ref + bit
    ref = df.select(
        "vec_id", bucket_ref.cast("int").alias("bucket")
    ).collect()
    got = df.select(
        "vec_id",
        similarity.lsh_bucket_expr("embedding", dim, n_planes).alias(
            "bucket"
        ),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))

    # reference: Column-composed cosine against a literal vector
    qvec = [0.1, 2.0, -1.5, 2.5]
    cos_ref = cosine_similarity(
        F.col("embedding"), F.array(*[F.lit(float(x)) for x in qvec])
    )
    ref_c = df.select("vec_id", cos_ref.alias("c")).collect()
    got_c = df.select(
        "vec_id",
        F.expr(
            cosine_similarity_sql(sql_ident("embedding"), sql_vec_lit(qvec))
        ).alias("c"),
    ).collect()
    assert sorted(map(tuple, got_c)) == sorted(map(tuple, ref_c))
