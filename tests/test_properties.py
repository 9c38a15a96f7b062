"""Property-based tests (hypothesis): the Spark expressions agree with
plain-Python reference implementations on arbitrary inputs."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.functions.core import (
    SURROGATE_NULL_SENTINEL,
    surrogate_key,
    temperature_category,
)
from weather_api_automate_etl_spark.functions.text import tokens, word_shingles

SETTINGS = settings(
    max_examples=8,  # each example is a Spark job; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

text_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
    min_size=0,
    max_size=120,
)


@given(city=text_st, country=st.one_of(st.none(), text_st))
@SETTINGS
def test_surrogate_key_matches_hashlib(spark, city, country):
    df = spark.createDataFrame([(city, country)], "city string, country string")
    got = df.select(surrogate_key("city", "country").alias("k")).head().k
    c2 = country if country is not None else SURROGATE_NULL_SENTINEL
    assert got == hashlib.md5(f"{city}-{c2}".encode()).hexdigest()


@given(t=st.integers(min_value=-200, max_value=200))
@SETTINGS
def test_bucket_totality_and_order(spark, t):
    df = spark.createDataFrame([(t,)], "temperature int")
    got = df.select(temperature_category("temperature").alias("b")).head().b
    expect = (
        "Freezing" if t < 0 else
        "Cold" if t <= 10 else
        "Mild" if t <= 20 else
        "Warm" if t <= 30 else "Hot"
    )
    assert got == expect


@given(text=text_st, k=st.integers(min_value=2, max_value=4))
@SETTINGS
def test_shingles_match_python_reference(spark, text, k):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(word_shingles(tokens("text"), k).alias("s")).head().s
    toks = text.strip().lower().split()
    # Spark's split on \s+ yields [''] for empty input, like Python here:
    if not toks:
        toks = [""] if text.strip() == text and text else toks
    ref = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if len(toks) < k:
        ref = []
    assert got == ref
