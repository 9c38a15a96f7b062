"""Round-4 corpus-prep operators: PII redaction, benchmark
decontamination, mixture rebalancing, length histogram."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_redact_pii_masks_and_counts(spark):
    from weather_api_automate_etl_spark.operators.privacy import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.org call +1-555-123-4567 done"),
            (2, "ip 192.168.0.1 card 4111 1111 1111 1234 x"),
            (3, "two mails a@b.io c@d.io"),
            (4, "nothing sensitive here"),
        ],
        "id long, raw string",
    )
    got = {r.id: r for r in redact_pii(df, "raw").collect()}
    # domestic formats (no country code) must be caught too — the common
    # case (review finding)
    dom = spark.createDataFrame(
        [(1, "call 555-123-4567 or (555) 123-4567 or 555.123.4567 ok")],
        "id long, raw string",
    )
    d = redact_pii(dom, "raw").first()
    assert d.n_phone == 3 and d.redacted == "call <PHONE> or <PHONE> or <PHONE> ok"
    # boundary discipline: digit substrings of LONGER separated numbers
    # are not phones (second review finding)
    ids = spark.createDataFrame(
        [(1, "serial 9555-123-4567 ref 555-123-45678 end")],
        "id long, raw string",
    )
    i = redact_pii(ids, "raw").first()
    assert i.n_phone == 0 and not i.has_pii
    assert i.redacted == "serial 9555-123-4567 ref 555-123-45678 end"
    assert got[1].redacted == "mail <EMAIL> call <PHONE> done"
    assert (got[1].n_email, got[1].n_phone) == (1, 1)
    assert got[2].redacted == "ip <IP> card <CARD> x"
    assert (got[2].n_ip, got[2].n_card) == (1, 1)
    assert got[3].n_email == 2 and got[3].redacted == "two mails <EMAIL> <EMAIL>"
    assert got[4].redacted == "nothing sensitive here"
    assert not got[4].has_pii and got[1].has_pii
    # schema: input id survives, text column replaced by `redacted`
    assert set(redact_pii(df, "raw").columns) == {
        "id", "redacted", "n_email", "n_card", "n_phone", "n_phone_contig",
        "n_ip", "has_pii",
    }


def test_redact_pii_contiguous_phone_and_amex(spark):
    from weather_api_automate_etl_spark.operators.privacy import redact_pii

    df = spark.createDataFrame(
        [
            # the round-4 advice forms: contiguous 10/11-digit phones and
            # 15-digit Amex (4-6-5 and contiguous)
            (1, "call 5551234567 now"),
            (2, "intl +15551234567 ok"),
            (3, "amex 3714-496353-98431 paid"),
            (4, "amex 371449635398431 paid"),
            (5, "contiguous card 4111111111111111 x"),
            # NOT phone-shaped: 12-digit run, 11 digits not starting 1,
            # and digit substrings of longer runs must stay untouched
            (6, "serial 555123456789 and 25551234567 end"),
        ],
        "id long, raw string",
    )
    got = {r.id: r for r in redact_pii(df, "raw").collect()}
    assert got[1].redacted == "call <PHONE> now" and got[1].n_phone_contig == 1
    assert got[2].redacted == "intl <PHONE> ok" and got[2].n_phone_contig == 1
    assert got[3].redacted == "amex <CARD> paid" and got[3].n_card == 1
    assert got[4].redacted == "amex <CARD> paid" and got[4].n_card == 1
    assert got[5].redacted == "contiguous card <CARD> x" and got[5].n_card == 1
    assert got[6].redacted == "serial 555123456789 and 25551234567 end"
    assert not got[6].has_pii


def test_decontaminate_flags_shared_grams_only(spark):
    from weather_api_automate_etl_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "x y alpha beta gamma z"),        # shares the 3-gram
            (2, "alpha gamma beta delta"),        # same words, no shared 3-gram
            (3, "alpha beta gamma delta q"),      # shares two 3-grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in decontaminate(train, bench, k=3).collect()}
    assert set(got) == {1, 3}
    assert got[1].n_grams_hit == 1
    assert got[3].n_grams_hit == 2
    assert got[1].first_bench_id == 900


def test_dedup_incremental_hand_case(spark):
    from weather_api_automate_etl_spark.operators.dedup import dedup_incremental

    known = spark.createDataFrame([("h-aaa",)], "content_hash string")
    # real hashes: known table built from actual md5s of corpus texts
    corpus = spark.createDataFrame([(0, "seen before")], "doc_id long, text string")
    known = corpus.select(F.md5("text").alias("content_hash"))
    batch = spark.createDataFrame(
        [
            (10, "seen before"),    # dup vs corpus → dropped
            (11, "fresh one"),      # novel
            (12, "fresh two"),      # novel
            (13, "fresh one"),      # in-batch dup → lower id survives
        ],
        "doc_id long, text string",
    )
    got = sorted(r.doc_id for r in dedup_incremental(batch, known, "doc_id").collect())
    assert got == [11, 12]


def test_quality_gate_rule_order_and_attribution(spark):
    from weather_api_automate_etl_spark.operators.textops import quality_gate

    # 10 distinct words (4 stopwords → ratio 0.4) repeated 5x: >200 chars,
    # top-word share 0.1 < 0.12, composite quality ~0.84
    long_pad = "the quick brown fox and lazy dog of summer in " * 5
    # mid-length + punctuation-heavy: length score ~0.22, punct ratio ~0.26,
    # zero stopwords → composite ~0.62, under the 0.7 floor — while staying
    # over the length floor and under the repetition ceiling
    noisy = (
        "alpha beta gamma delta epsilon zeta eta theta " * 4
        + "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( )))) " * 2
    )
    df = spark.createDataFrame(
        [
            (1, "short"),                        # fails length first
            (2, ("spam " * 60).strip()),         # long enough, but repetitive
            (3, noisy),
            (4, long_pad.strip()),               # passes everything
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in quality_gate(df).collect()}
    assert got[1].violation == "too_short" and not got[1].keep
    # rule ORDER: doc 2 is also arguably low quality, but repetition is
    # checked first and owns the attribution
    assert got[2].violation == "repetitive"
    assert got[3].violation == "low_quality"
    assert got[4].violation is None and got[4].keep


def test_rebalance_to_mixture_rates(spark):
    from weather_api_automate_etl_spark.operators.sampling import (
        hash_fraction,
        rebalance_to_mixture,
    )

    # 80 'a' rows, 20 'b' rows; target 50/50 → a samples at 100*0.5/80=0.625,
    # b keeps everything (rate clamps at 1)
    rows = [(i, "a") for i in range(80)] + [(i + 100, "b") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = rebalance_to_mixture(df, "src", {"a": 0.5, "b": 0.5}, "doc_id")
    got = {(r.doc_id, r.src) for r in out.collect()}
    assert {(i + 100, "b") for i in range(20)} <= got
    # the kept 'a' set is exactly the hash-threshold filter (replayable)
    expected_a = {
        (r.doc_id, "a")
        for r in df.filter(
            (F.col("src") == "a") & (hash_fraction(F.col("doc_id")) < 0.625)
        ).collect()
    }
    assert {g for g in got if g[1] == "a"} == expected_a
    # strata absent from the target are dropped entirely
    assert rebalance_to_mixture(df, "src", {"b": 1.0}, "doc_id").filter(
        F.col("src") == "a"
    ).count() == 0


def test_pack_assign_layout_invariants(spark):
    from weather_api_automate_etl_spark.operators.corpus import pack_assign

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 25), (3, "a", 4), (4, "b", 40)],
        "doc_id long, src string, tok long",
    )
    got = {r.doc_id: r for r in pack_assign(
        df, "tok", strata=("src",), ctx_len=16
    ).collect()}
    # stratum a: starts at 0, 10, 35 → seqs 0, 0, 2; offsets 0, 10, 3
    assert (got[1].seq_id, got[1].seq_offset) == (0, 0)
    assert (got[2].seq_id, got[2].seq_offset) == (0, 10)
    assert (got[3].seq_id, got[3].seq_offset) == (2, 3)
    # strata pack independently
    assert (got[4].seq_id, got[4].seq_offset) == (0, 0)
    # global invariant: offset < ctx and start position reconstructs
    for r in got.values():
        assert 0 <= r.seq_offset < 16
        assert r.seq_id * 16 + r.seq_offset == sum(
            g.n_tokens for g in got.values()
            if g.src == r.src and g.doc_id < r.doc_id
        )


def test_unigram_logprob_hand_case(spark):
    import math

    from weather_api_automate_etl_spark.operators.textops import unigram_logprob

    # corpus: tokens a a a b  → N=4, V=2; p(a)=(3+1)/(4+2)=2/3, p(b)=(1+1)/6=1/3
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert got[1].n_tokens == 3 and got[2].n_tokens == 1
    assert got[1].avg_neg_logprob == round(-math.log(2 / 3), 6)
    assert got[2].avg_neg_logprob == round(-math.log(1 / 3), 6)
    # the common-token doc scores LOWER (more probable) than the rare one
    assert got[1].avg_neg_logprob < got[2].avg_neg_logprob


def test_length_histogram_bins_and_clamp(spark):
    from weather_api_automate_etl_spark.operators.corpus import length_histogram

    df = spark.createDataFrame(
        [(0,), (49,), (50,), (99,), (100,), (10_000,)], "n_chars long"
    )
    rows = {r.bin_lo: r for r in length_histogram(df, "n_chars", 50, 3).collect()}
    assert rows[0].n_docs == 2 and rows[0].bin_hi == 50
    assert rows[50].n_docs == 2 and rows[50].bin_hi == 100
    # top bucket clamps the outlier and is open-ended
    assert rows[100].n_docs == 2 and rows[100].bin_hi is None
    # shares are rounded to 6 decimals, so the sum carries that rounding
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 5e-6
    # out-of-domain values can't break the row contract: negatives clamp
    # into bin 0, NULLs are excluded (review finding)
    dirty = spark.createDataFrame(
        [(-120,), (None,), (10,), (75,)], "n_chars long"
    )
    rows2 = {r.bin_lo: r for r in length_histogram(dirty, "n_chars", 50, 3).collect()}
    assert set(rows2) == {0, 50}
    assert rows2[0].n_docs == 2  # -120 clamped in with 10
    assert abs(sum(r.share for r in rows2.values()) - 1.0) < 5e-6
