"""New r4 ops: as-of join (events), BM25 / hybrid RRF retrieval, C4 filters.

Each test builds a tiny hand-checkable table and asserts the exact
semantics the docstrings promise (the oracle gate separately proves
engine-vs-DuckDB equality at sf0.01)."""

from datetime import datetime

import pyspark.sql.functions as F

from nessie_spark.operators import retrieval as R
from nessie_spark.operators.events import events_asof_order
from nessie_spark.operators.textstats import c4_filter_flags


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


def _docs(spark, tmp_path, rows):
    _write(spark, tmp_path, "documents", rows, "doc_id long, text string")
    return str(tmp_path)


# ---------------------------------------------------------------- as-of join


def test_asof_picks_latest_prior_order(spark, tmp_path):
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    _write(
        spark, tmp_path, "events",
        [
            (0, ts("2024-06-15 12:00:00"), 1, "click"),   # between o1 and o2
            (1, ts("2024-08-01 00:00:00"), 1, "view"),    # after o2
            (2, ts("2024-01-01 00:00:00"), 1, "click"),   # before any order
            (3, ts("2024-06-15 12:00:00"), 2, "click"),   # user with no orders
            (4, ts("2024-06-01 00:00:00"), 1, "buy"),     # exactly at o2: ≤ holds
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    _write(
        spark, tmp_path, "orders",
        [
            (10, 1, ts("2024-03-01 00:00:00"), 100.0),
            (20, 1, ts("2024-06-01 00:00:00"), 200.0),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    got = {r.event_id: r for r in events_asof_order(spark, str(tmp_path)).collect()}
    assert len(got) == 5
    assert got[0].asof_orderkey == 20 and got[0].asof_totalprice == 200.0
    assert got[1].asof_orderkey == 20
    assert got[2].asof_orderkey is None and got[2].asof_age_sec is None
    assert got[3].asof_orderkey is None
    # same-instant order counts as at-or-before, age 0
    assert got[4].asof_orderkey == 20 and got[4].asof_age_sec == 0
    # age is event_t − order_t in whole seconds
    assert got[0].asof_age_sec == (ts("2024-06-15 12:00:00") - ts("2024-06-01 00:00:00")).total_seconds()


def test_asof_tie_breaks_to_larger_orderkey(spark, tmp_path):
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    _write(
        spark, tmp_path, "events",
        [(0, ts("2024-07-01 00:00:00"), 1, "click")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    _write(
        spark, tmp_path, "orders",
        [
            (11, 1, ts("2024-05-01 00:00:00"), 1.0),
            (99, 1, ts("2024-05-01 00:00:00"), 2.0),  # same date, larger key wins
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    row = events_asof_order(spark, str(tmp_path)).collect()[0]
    assert row.asof_orderkey == 99 and row.asof_totalprice == 2.0


# ------------------------------------------------------------------- BM25


def test_bm25_ranks_rare_term_overlap_first(spark, tmp_path):
    # query doc 0 shares the rare term 'zebra' with doc 10 only; docs 11/12
    # share only the ubiquitous 'the' (df-heavy → near-zero idf)
    common = "the quick brown fox"
    d = _docs(
        spark, tmp_path,
        [
            (0, f"zebra stripes {common}"),
            (10, f"zebra habitat notes {common}"),
            (11, f"{common} jumps high"),
            (12, f"{common} sleeps late"),
        ],
    )
    got = R.bm25_topk(spark, d).where(F.col("query_id") == 0).collect()
    assert got[0].doc_id == 10                      # rare-term match on top
    assert all(r.query_id == 0 for r in got)
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    assert 0 not in {r.doc_id for r in got}          # self excluded
    assert got[0].score_fp > got[1].score_fp


def test_bm25_length_normalization(spark, tmp_path):
    # same tf of 'zebra' — the shorter doc must score higher (b=0.75)
    pad = " ".join(["filler%d" % i for i in range(60)])
    d = _docs(
        spark, tmp_path,
        [(0, "zebra"), (10, "zebra fast"), (11, f"zebra {pad}")],
    )
    got = {r.doc_id: r.score_fp for r in R.bm25_topk(spark, d).where(F.col("query_id") == 0).collect()}
    assert got[10] > got[11]


# ------------------------------------------------------------------- RRF


def test_rrf_fuses_both_sources(spark, tmp_path):
    # doc 10: top lexical AND top char-trigram match for query 0.
    # doc 11: lexical overlap only (shared word, different spelling pattern)
    d = _docs(
        spark, tmp_path,
        [
            (0, "zebra stripes run wild"),
            (10, "zebra stripes run tame"),
            (11, "zebra crossing"),
            (12, "qqq www eee rrr"),
        ],
    )
    got = R.hybrid_rrf_topk(spark, d).where(F.col("query_id") == 0).collect()
    assert got[0].doc_id == 10
    top = got[0]
    # fused score = exact integer sum of the two per-source addends
    addend = lambda r: round(R._RRF_SCALE / (R.RRF_K + r)) if r else 0  # noqa: E731
    assert top.rrf_fp == addend(top.rank_lex) + addend(top.rank_tri)
    assert top.rank_lex == 1 and top.rank_tri == 1
    # a doc absent from one pool carries rank 0 for that source, never NULL
    assert all(r.rank_lex >= 0 and r.rank_tri >= 0 for r in got)
    # doc 12 shares no tokens → lexical pool can't contain it
    d12 = [r for r in got if r.doc_id == 12]
    assert all(r.rank_lex == 0 for r in d12)


# ------------------------------------------------------------------- C4


def test_c4_rules(spark, tmp_path):
    d = _docs(
        spark, tmp_path,
        [
            (0, "One good sentence lives right here. Another fine sentence follows closely behind. And a third one closes it."),
            (1, "Too short. Only two."),                       # < 3 sentences
            (2, "Lorem ipsum dolor sit amet. More text here. Third sentence ok."),
            (3, "Has a brace { in it. Second sentence fine. Third sentence fine."),
            (4, "Enable javascript to view. Second sentence fine. Third sentence done."),
            (5, "No terminal punctuation at the end. Second one. Third one here"),
        ],
    )
    got = {r.doc_id: r for r in c4_filter_flags(spark, d).collect()}
    assert got[0].keep and got[0].n_sentences == 3
    assert not got[1].keep and got[1].n_sentences == 2
    assert not got[2].keep and got[2].has_lorem
    assert not got[3].keep and got[3].has_brace
    assert not got[4].keep and got[4].has_javascript
    assert not got[5].keep and not got[5].ends_terminal
    # every sentence in doc 0 has ≥5 words → fraction 1.0
    assert got[0].frac_sent_ge5w == 1.0


# ------------------------------------------------------- markov transitions


def test_markov_transitions_probabilities(spark, tmp_path):
    from datetime import datetime

    from nessie_spark.operators.events import events_markov_transitions

    ts = lambda m: datetime.fromisoformat(f"2024-01-01 10:{m:02d}:00")  # noqa: E731
    _write(
        spark, tmp_path, "events",
        [  # one session: a → b → a → c (transitions a>b, b>a, a>c)
            (0, ts(0), 1, "a"),
            (1, ts(1), 1, "b"),
            (2, ts(2), 1, "a"),
            (3, ts(3), 1, "c"),
            # new session (gap > 30 min): no transition across the gap
            (4, ts(50), 1, "d"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {(r.cur_type, r.next_type): r for r in
           events_markov_transitions(spark, str(tmp_path)).collect()}
    assert got[("a", "b")].n == 1 and abs(got[("a", "b")].p - 0.5) < 1e-9
    assert got[("a", "c")].n == 1 and abs(got[("a", "c")].p - 0.5) < 1e-9
    assert got[("b", "a")].p == 1.0
    assert ("c", "d") not in got  # session boundary blocks the transition
    assert ("d", None) not in got
