"""Repetition filters (operators/textstats.repetition_filter_flags):
planted repetitive vs varied documents, fraction arithmetic, and the
integer-exact threshold behavior the docstring promises."""

from nessie_spark.operators import textstats as TS


def _docs(spark, tmp_path, rows):
    d = str(tmp_path / "rep")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_repetition_planted_docs(spark, tmp_path):
    def spread(n_the: int, n_total: int) -> str:
        """n_the 'the's interleaved with distinct fillers: every bigram and
        trigram is unique, so only the unigram rule can trip."""
        fillers = iter(f"f{i}" for i in range(n_total))
        toks = []
        for i in range(n_the):
            toks += ["the", next(fillers), next(fillers)]
        while len(toks) < n_total:
            toks.append(next(fillers))
        return " ".join(toks[:n_total])

    rows = [
        # doc 0: one phrase looped — every rule trips
        (0, " ".join(["spam ham"] * 30), "en", "s", 0),
        # doc 1: 30 distinct tokens, no repeats at all (>20 bigrams, so the
        # small-doc bigram artifact can't trip)
        (1, " ".join(f"w{i}" for i in range(30)), "en", "s", 0),
        # doc 2: modal unigram exactly 15% (6 of 40) — strict > must NOT flag
        (2, spread(6, 40), "en", "s", 0),
        # doc 3: modal unigram just over 15% (7 of 40), bigrams/trigrams all
        # unique — only the unigram rule trips
        (3, spread(7, 40), "en", "s", 0),
    ]
    got = {
        r.doc_id: r
        for r in TS.repetition_filter_flags(spark, _docs(spark, tmp_path, rows)).collect()
    }
    assert got[0].repetitive and got[0].dup_trigram_frac == 1.0
    # modal bigram of doc 0: "ham spam" appears 29x of 59 bigrams? no —
    # tokens are [spam, ham]*30: "spam ham" 30x, "ham spam" 29x, of 59
    assert round(got[0].top_bigram_frac, 6) == round(30 / 59, 6)
    assert not got[1].repetitive
    assert got[1].top_unigram_frac == round(1 / 30, 6)
    assert not got[2].repetitive  # exactly on the 15% boundary: strict >
    assert got[3].repetitive and got[3].dup_trigram_frac == 0.0


def test_repetition_degenerate_short_docs(spark, tmp_path):
    rows = [(0, "solo", "en", "s", 0), (1, "two tokens", "en", "s", 0)]
    got = {
        r.doc_id: r
        for r in TS.repetition_filter_flags(spark, _docs(spark, tmp_path, rows)).collect()
    }
    # one token: unigram frac 1.0 trips the >15% rule; no bigrams/trigrams
    assert got[0].top_unigram_frac == 1.0 and got[0].repetitive
    assert got[0].top_bigram_frac == 0.0 and got[0].dup_trigram_frac == 0.0
    # two distinct tokens: modal unigram 50% still trips >15% (by design —
    # tiny docs are low-value for training anyway); bigram frac 1.0
    assert got[1].top_bigram_frac == 1.0


def test_cms_overestimates_and_ranks_planted_hitter(spark, tmp_path):
    """Count-min property: est(t) >= true(t) for every token, and a planted
    dominant token tops the ranking with its exact count (no collision can
    shrink a counter)."""
    from nessie_spark.operators.textstats import heavy_hitters_cms

    rows = [(i, " ".join(["hot"] * 50 + [f"cold{i}_{j}" for j in range(10)]),
             "en", "s", 0) for i in range(20)]
    d = _docs(spark, tmp_path, rows)
    got = heavy_hitters_cms(spark, d).collect()
    assert got[0].tok == "hot" and got[0].est_count >= 20 * 50
    true = {}
    for _, text, *_ in rows:
        for t in text.split():
            true[t] = true.get(t, 0) + 1
    assert all(r.est_count >= true[r.tok] for r in got)


def test_theta_sketch_matches_hand_computed_sample(spark, tmp_path):
    """distinct_ngrams_theta's sample equals the md5-threshold rule
    computed independently in Python, and est = n_sampled * 16."""
    import hashlib

    from nessie_spark.operators import textstats as TS

    words = [f"w{i}" for i in range(40)]
    text = " ".join(words)  # 36 distinct 5-grams, all multiplicity 1
    rows = [(1, text, "en", "sA", 0), (2, text, "en", "sB", 0)]
    d = str(tmp_path / "th")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    grams = {" ".join(words[i:i + 5]) for i in range(36)}
    expected = sum(
        1 for g in grams
        if int(hashlib.md5(g.encode()).hexdigest()[:15], 16) < (1 << 56)
    )
    got = {r.source: r for r in TS.distinct_ngrams_theta(spark, d).collect()}
    assert set(got) == {"sA", "sB"}
    for r in got.values():
        assert r.n_sampled == expected
        assert r.est_distinct == expected * 16
        assert r.n_exact == 36


def test_tfidf_exclusive_token_tops_its_source(spark, tmp_path):
    """A token unique to one source outranks the shared vocabulary there
    (shared-by-all tokens have idf 0 and cannot outrank it)."""
    from nessie_spark.operators import textstats as TS

    rows = [(1, "common words here", "en", "sA", 0),
            (2, "common words here", "en", "sB", 0),
            (3, "common words here xylophone xylophone", "en", "sA", 0)]
    d = str(tmp_path / "tfidf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = TS.tfidf_top_terms(spark, d).collect()
    top_a = next(r for r in got if r.source == "sA" and r.rank == 1)
    assert top_a.token == "xylophone" and top_a.df == 1 and top_a.tfidf > 0
    # shared tokens score exactly 0 (idf = ln(2/2) = 0)
    assert all(r.tfidf == 0.0 for r in got if r.token == "common")


def test_token_entropy_bounds(spark, tmp_path):
    """H = 0 for single-token spam, ln(n) for all-distinct text, NULL for
    empty docs — the quality-signal contract."""
    import math

    from nessie_spark.operators import textstats as TS

    rows = [(1, "spam spam spam spam", "en", "s", 0),
            (2, "all tokens here differ fully", "en", "s", 0),
            (3, "   ", "en", "s", 0)]
    d = str(tmp_path / "ent")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in TS.token_entropy(spark, d).collect()}
    assert got[1].entropy == 0.0
    assert abs(got[2].entropy - math.log(5)) < 1e-5
    assert got[3].n_tokens == 0 and got[3].entropy is None


def test_doclen_quantiles_rank_semantics(spark, tmp_path):
    """Quantile = element at rank 1 + ((n-1)*p) DIV 100 of the sorted
    source: pinned on a 10-doc source with lengths 10..100."""
    from nessie_spark.operators import textstats as TS

    rows = [(i, "t", "en", "s", (i + 1) * 10) for i in range(10)]
    d = str(tmp_path / "q")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    r = TS.doclen_quantiles(spark, d).collect()[0]
    # n=10: rank(p) = 1 + 9p//100 -> p25:3rd=30, p50:5th=50, p75:7th=70, p90:9th=90
    assert (r.p25, r.p50, r.p75, r.p90) == (30, 50, 70, 90)


def test_doclen_quantiles_sampled_matches_python_sample(spark, tmp_path):
    """The sketch leg keeps exactly the docs whose h64('dlq|'||doc_id) is
    0 mod 8 (computed independently here with hashlib); its quantiles obey
    the same rank rule over that sample, and rel_err grades est vs exact."""
    import hashlib

    from nessie_spark.operators import textstats as TS

    rows = [(i, "t", "en", "s", (i + 1) * 10) for i in range(64)]
    d = str(tmp_path / "qs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    def h64py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    kept = sorted(
        (i + 1) * 10
        for i in range(64)
        if h64py(f"dlq|{i}") % TS.DLQ_SAMPLE_MOD == 0
    )
    assert kept, "fixture must sample at least one doc"
    n = len(kept)
    want = {p: kept[(n - 1) * p // 100] for p in TS.QUANTILES}
    full = [(i + 1) * 10 for i in range(64)]
    want_exact = {p: full[63 * p // 100] for p in TS.QUANTILES}
    r = TS.doclen_quantiles_sampled(spark, d).collect()[0]
    for p in TS.QUANTILES:
        assert getattr(r, f"est_p{p}") == want[p]
        assert getattr(r, f"exact_p{p}") == want_exact[p]
        expect_err = round(
            abs(want[p] - want_exact[p]) / max(want_exact[p], 1), 6
        )
        assert getattr(r, f"rel_err_p{p}") == expect_err
