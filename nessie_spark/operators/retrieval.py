"""Sparse lexical retrieval over the documents corpus.

BM25 is the workhorse of corpus-scale retrieval (quality-filtering by
similarity to a target set, decontamination triage, nearest-neighbor text
audit). The engine's design point: the inverted index is a DataFrame
(postings = one row per (doc, term, tf)), query terms are a broadcast
dimension, and scoring is ONE aggregation shuffle keyed (query, doc) —
nothing quadratic, nothing driver-side.

Cross-engine float discipline (memory: oracle hash family): per-(term,doc)
BM25 contributions are rounded ONCE to fixed-point BIGINT (×1e6) and the
per-(query,doc) reduction is an integer SUM — order-independent and exact
across Spark and DuckDB; the score column stays fixed-point in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.operators.common import T

K1 = 1.2
B = 0.75
N_QUERIES = 8  # the N_QUERIES smallest doc_ids act as queries
TOP_K = 10
_SCALE = 1_000_000


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score_fp, n_terms) for every corpus document
    sharing ≥1 term with a query document. See ``bm25_topk`` for the
    formula and scale shape."""
    from nessie_spark.operators.dedup import _spread

    docs = _spread(
        spark,
        T(spark, sf_dir, "documents").select("doc_id", "text"),
    ).select(
        "doc_id",
        F.split(F.trim(F.lower("text")), r"\s+").alias("ts"),
    ).select(
        "doc_id",
        F.when(F.col("ts") != F.array(F.lit("")), F.col("ts"))
        .otherwise(F.array().cast("array<string>"))
        .alias("ts"),
    )
    toks = docs.select(
        "doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("term")
    )
    # one shuffle: postings keyed (doc, term), dl rides along (constant per doc)
    tf = (
        toks.groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)  # consumers: df table + scoring join
    )
    # corpus stats from the PRE-explode frame: count + sum are map-side
    # partials over one row per doc — no countDistinct Expand over the
    # postings (which doubles the posting shuffle at corpus scale)
    stats = (
        docs.where(F.size("ts") >= 1)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.size("ts")).alias("toks"))
        .collect()[0]
    )
    n_docs, avgdl = int(stats["n"]), float(stats["toks"]) / float(stats["n"])

    qterms = (
        tf.where(F.col("doc_id") < N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    # tf rows are unique per (doc, term) by construction, so document
    # frequency is a plain count — no distinct Expand
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # df joined to the query vocabulary FIRST: the broadcast dim is
    # |query terms| rows, the full (term → df) table never broadcasts.
    qdim = F.broadcast(
        qterms.join(df_tbl, "term").withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
    )
    contrib = (
        tf.join(qdim, "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("idf")
                * (F.col("tf") * (K1 + 1.0))
                / (
                    F.col("tf")
                    + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))
                )
                * _SCALE
            )
            .cast("long")
            .alias("c"),
        )
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("score_fp"), F.count(F.lit(1)).alias("n_terms")
    )


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval: score every corpus document against
    each of the ``N_QUERIES`` designated query documents (the smallest
    doc_ids; self-matches excluded) and keep the ``TOP_K`` best per query.

    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Robertson/Lucene form,
    always positive), tf component = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).

    Scale shape: postings build in one (doc, term) groupBy whose shuffle
    also carries dl (computed from the token array BEFORE the explode, so
    no second per-doc pass or doc-keyed join). df lives only on the query
    vocabulary: the (term → df) aggregate is joined to the tiny query-term
    set and THAT product is broadcast, so corpus postings never shuffle to
    meet the idf table. The only other shuffle is the (query, doc) score
    aggregation; top-k is a window over the already-small scored set.
    N and avgdl are two driver scalars (a count and a sum)."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fp"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "score_fp",
            "n_terms",
        )
        .orderBy("query_id", "rank")
    )


RRF_K = 60
_RRF_SCALE = 1_000_000_000
POOL_K = 20  # per-source candidate pool fed into the fusion


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al. 2009):
    fuse a lexical ranker (BM25 over word tokens) with a character-level
    ranker (cosine over char-trigram count vectors — the classic
    embedding stand-in that needs no model) by summing 1/(60 + rank)
    over each source's top-``POOL_K`` list, then keep the ``TOP_K``
    fused results per query. RRF is rank-only, so the two sources'
    incomparable score scales never mix — the standard first step of a
    dense+sparse retrieval stack.

    Scale shape: both sources follow the broadcast-query-dim pattern
    (corpus postings / trigram counts never shuffle to meet the query
    side); each source ends in one (query, doc) aggregation plus a
    window over its own small top-pool; the fusion itself joins two
    ≤ N_QUERIES·POOL_K-row frames. Fixed-point discipline: the RRF
    addend round(1e9/(60+rank)) is integer, so fused scores compare
    exactly across engines."""
    from nessie_spark.operators.curation import _char_trigrams

    lex = _bm25_scored(spark, sf_dir)
    wl = Window.partitionBy("query_id").orderBy(F.desc("score_fp"), F.asc("doc_id"))
    lex_pool = (
        lex.withColumn("r", F.row_number().over(wl))
        .where(F.col("r") <= POOL_K)
        .select("query_id", "doc_id", F.col("r").alias("rank_lex"))
    )

    tg = (
        _char_trigrams(T(spark, sf_dir, "documents").select("doc_id", "text"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)  # consumers: norms, query side, dot join
    )
    norms = tg.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("k") * F.col("k"))).alias("nrm")
    )
    qtg = F.broadcast(
        tg.where(F.col("doc_id") < N_QUERIES)
        .join(norms, "doc_id")
        .select(
            F.col("doc_id").alias("query_id"),
            "g",
            F.col("k").alias("kq"),
            F.col("nrm").alias("nq"),
        )
    )
    dots = (
        tg.join(qtg, "g")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id", "nq")
        .agg(F.sum(F.col("k") * F.col("kq")).alias("dot"))
        .join(norms, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("dot") / (F.col("nq") * F.col("nrm")) * _SCALE)
            .cast("long")
            .alias("cos_fp"),
        )
    )
    wt = Window.partitionBy("query_id").orderBy(F.desc("cos_fp"), F.asc("doc_id"))
    tri_pool = (
        dots.withColumn("r", F.row_number().over(wt))
        .where(F.col("r") <= POOL_K)
        .select("query_id", "doc_id", F.col("r").alias("rank_tri"))
    )

    addend = lambda r: F.when(  # noqa: E731
        r.isNotNull(), F.round(F.lit(float(_RRF_SCALE)) / (RRF_K + r)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    fused = (
        lex_pool.join(tri_pool, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (addend(F.col("rank_lex")) + addend(F.col("rank_tri"))).alias("rrf_fp"),
            "rank_lex",
            "rank_tri",
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_fp"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "rrf_fp",
            # 0 = "not in this source's pool" (NULL would round-trip as
            # pandas nullable-Int on one engine and float-nan on the other,
            # breaking the canonical hash)
            F.coalesce(F.col("rank_lex").cast("int"), F.lit(0)).alias("rank_lex"),
            F.coalesce(F.col("rank_tri").cast("int"), F.lit(0)).alias("rank_tri"),
        )
        .orderBy("query_id", "rank")
    )


# shared CTE chain: BM25 (query, doc) scores — used by both oracles so the
# two SQL mirrors cannot drift apart
_SCORED_CTES = f"""d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
  FROM documents
), toks AS (
  SELECT doc_id, len(ts) AS dl, unnest(ts) AS term
  FROM d WHERE len(ts) >= 1 AND ts[1] != ''
), tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, dl, term
), stats AS (
  SELECT COUNT(DISTINCT doc_id) AS n,
         CAST(SUM(tf) AS DOUBLE) / COUNT(DISTINCT doc_id) AS avgdl
  FROM tf
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < {N_QUERIES}
), dfs AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), qdim AS (
  SELECT q.query_id, q.term,
         LN(1.0 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS idf
  FROM qterms q JOIN dfs USING (term) CROSS JOIN stats s
), contrib AS (
  SELECT q.query_id, t.doc_id,
         CAST(ROUND(q.idf * (t.tf * ({K1} + 1.0))
               / (t.tf + {K1} * (1.0 - {B} + {B} * t.dl
                                 / (SELECT avgdl FROM stats)))
               * {_SCALE}) AS BIGINT) AS c
  FROM tf t JOIN qdim q USING (term)
  WHERE t.doc_id != q.query_id
), scored AS (
  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_fp,
         COUNT(*) AS n_terms
  FROM contrib GROUP BY query_id, doc_id
)"""

BM25_SQL = f"""
WITH {_SCORED_CTES}
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_fp, n_terms
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score_fp DESC, doc_id ASC) AS rank
      FROM scored)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""

HYBRID_SQL = f"""
WITH {_SCORED_CTES}, lex_pool AS (
  SELECT query_id, doc_id, rank_lex FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score_fp DESC, doc_id ASC) AS rank_lex
    FROM scored)
  WHERE rank_lex <= {POOL_K}
), norm_txt AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
  FROM documents
), tg AS (
  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS g, COUNT(*) AS k
  FROM norm_txt, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
  GROUP BY doc_id, substr(t, CAST(i AS INT), 3)
), norms AS (
  SELECT doc_id, sqrt(CAST(SUM(k * k) AS DOUBLE)) AS nrm FROM tg GROUP BY doc_id
), qtg AS (
  SELECT tg.doc_id AS query_id, tg.g, tg.k AS kq, n.nrm AS nq
  FROM tg JOIN norms n USING (doc_id) WHERE tg.doc_id < {N_QUERIES}
), dots AS (
  SELECT q.query_id, t.doc_id,
         CAST(ROUND(CAST(SUM(t.k * q.kq) AS DOUBLE)
                    / (ANY_VALUE(q.nq) * ANY_VALUE(n.nrm)) * {_SCALE})
              AS BIGINT) AS cos_fp
  FROM tg t JOIN qtg q USING (g) JOIN norms n ON n.doc_id = t.doc_id
  WHERE t.doc_id != q.query_id
  GROUP BY q.query_id, t.doc_id
), tri_pool AS (
  SELECT query_id, doc_id, rank_tri FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_fp DESC, doc_id ASC) AS rank_tri
    FROM dots)
  WHERE rank_tri <= {POOL_K}
), fused AS (
  SELECT COALESCE(l.query_id, t.query_id) AS query_id,
         COALESCE(l.doc_id, t.doc_id) AS doc_id,
         COALESCE(CAST(ROUND({_RRF_SCALE}.0 / ({RRF_K} + l.rank_lex)) AS BIGINT), 0)
           + COALESCE(CAST(ROUND({_RRF_SCALE}.0 / ({RRF_K} + t.rank_tri)) AS BIGINT), 0)
           AS rrf_fp,
         l.rank_lex, t.rank_tri
  FROM lex_pool l FULL OUTER JOIN tri_pool t
    ON l.query_id = t.query_id AND l.doc_id = t.doc_id
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_fp,
       CAST(COALESCE(rank_lex, 0) AS INT) AS rank_lex,
       CAST(COALESCE(rank_tri, 0) AS INT) AS rank_tri
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_fp DESC, doc_id ASC) AS rank
      FROM fused)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


QUERIES: dict[str, tuple] = {
    "bm25_topk": (bm25_topk, BM25_SQL),
    "hybrid_rrf_topk": (hybrid_rrf_topk, HYBRID_SQL),
}
