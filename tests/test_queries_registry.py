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
    n = df.count()
    # violation-style and threshold queries may legitimately be empty;
    # everything else must produce rows at sf0.001
    may_be_empty = {"q_minhash_pairs", "q_ngram_jaccard", "q_neardup_cosine"}
    if name not in may_be_empty:
        assert n > 0, f"{name} returned 0 rows"


def test_oracle_keys_subset():
    from weather_api_automate_etl_spark.queries import oracle_sql, queries

    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 34
