"""Text-analysis operators for training-data pipelines (task brief §text).

All-expression implementations (no UDFs): language-ID via marker-word
counting (integer-exact), quality scoring from length/stopword/char ratios,
BPE-ish token counting via regexp, and a rolling polynomial fingerprint over
the shared h64 hash — every operator exactly reproduced by its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window
from pyspark.sql import functions as F

from nessie_spark.functions.core import h64, h64_seeded
from nessie_spark.operators.common import T, h64_sql

# fixed marker lexicons (public stopword-style heuristic; the testdata's
# shared vocabulary makes most docs score 'en' — accuracy is reported, not
# assumed)
_MARKERS = {
    "en": ["the", "a", "is", "and", "of"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "es", "y"],
    "fr": ["le", "la", "les", "est", "et"],
    "zh": ["de5", "shi4", "le5", "he2", "zai4"],
}
_LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # argmax tie-break order


def lang_pred_df(docs: DataFrame) -> DataFrame:
    """The shared marker-argmax predictor: ``doc_id, lang, pred_lang,
    marker_hits``. Single source of truth for the detector —
    ``lang_id_markers`` ships it per-doc and ``corpus.langid_confusion``
    scores exactly this frame, so a tokenization or tie-break change here
    changes both in lockstep."""
    ts = F.split(F.trim(F.lower("text")), r"[ \t\n\f\r]+")
    d = docs.select("doc_id", "lang", ts.alias("ts"))
    for lang in _LANG_ORDER:
        markers = F.array(*[F.lit(m) for m in _MARKERS[lang]])
        d = d.withColumn(
            f"c_{lang}", F.size(F.filter("ts", lambda t: F.array_contains(markers, t)))
        )
    best = F.greatest(*[F.col(f"c_{lang}") for lang in _LANG_ORDER])
    pred = F.when(F.col(f"c_{_LANG_ORDER[0]}") == best, F.lit(_LANG_ORDER[0]))
    for lang in _LANG_ORDER[1:]:
        pred = pred.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return d.select(
        "doc_id", "lang", pred.alias("pred_lang"), best.alias("marker_hits")
    )


def lang_pred_sql_parts() -> tuple[str, str, str]:
    """DuckDB twin of :func:`lang_pred_df`: returns ``(ctes, pred, best)``
    where ``ctes`` is the shared ``d``/``counted`` CTE text (to embed in a
    WITH clause) and ``pred``/``best`` are expressions over ``counted``."""
    cnt = {
        lang: (
            "len(list_filter(ts, t -> t IN ("
            + ", ".join(repr(m) for m in _MARKERS[lang])
            + ")))"
        )
        for lang in _LANG_ORDER
    }
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in _LANG_ORDER) + ")"
    pred = "CASE " + " ".join(
        f"WHEN c_{lang} = {best} THEN '{lang}'" for lang in _LANG_ORDER
    ) + " END"
    cols = ", ".join(f"{cnt[lang]} AS c_{lang}" for lang in _LANG_ORDER)
    ctes = f"""d AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), counted AS (
  SELECT doc_id, lang, {cols} FROM d
)"""
    return ctes, pred, best


def lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count marker hits per language, predict the
    argmax (ties broken by fixed language order). Integer-exact."""
    docs = T(spark, sf_dir, "documents")
    d = lang_pred_df(docs)
    return d.select(
        "doc_id",
        "lang",
        "pred_lang",
        "marker_hits",
        (F.col("pred_lang") == F.col("lang")).alias("is_correct"),
    ).orderBy("doc_id")


def _lang_sql() -> str:
    ctes, pred, best = lang_pred_sql_parts()
    return f"""
WITH {ctes}
SELECT doc_id, lang, {pred} AS pred_lang, {best} AS marker_hits,
       ({pred}) = lang AS is_correct
FROM counted ORDER BY doc_id
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: token count, mean token length, stopword
    ratio, alpha ratio → composite score (the task brief's quality-scoring
    op; same shape as the reference's handcrafted featurizer P10,
    /root/reference/nessie/models/tagging/util.py:5-44)."""
    docs = T(spark, sf_dir, "documents")
    ts = F.split(F.trim("text"), r"[ \t\n\f\r]+")
    stop = F.array(*[F.lit(w) for w in _MARKERS["en"]])
    n_tok = F.size(ts)
    mean_len = (F.length(F.trim("text")) - (n_tok - 1)).cast("double") / n_tok
    stop_ratio = F.size(F.filter(ts, lambda t: F.array_contains(stop, t))).cast("double") / n_tok
    alpha_ratio = (
        F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z]", "")).cast("double")
        / F.length("text")
    )
    score = (
        F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.least(mean_len / 8.0, F.lit(1.0)) * 0.2
        + stop_ratio * 0.2
        + alpha_ratio * 0.2
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality"),
    ).orderBy("doc_id")


QUALITY_SQL = """
WITH d AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), m AS (
  SELECT doc_id,
         len(ts) AS n_tok,
         CAST(length(trim(text)) - (len(ts) - 1) AS DOUBLE) / len(ts) AS mean_len,
         CAST(len(list_filter(ts, t -> t IN ('the','a','is','and','of'))) AS DOUBLE)
           / len(ts) AS stop_ratio,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha_ratio
  FROM d
)
SELECT doc_id, n_tok AS n_tokens,
       ROUND(mean_len, 6) AS mean_token_len,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       ROUND(least(n_tok / 100.0, 1.0) * 0.4 + least(mean_len / 8.0, 1.0) * 0.2
             + stop_ratio * 0.2 + alpha_ratio * 0.2, 6) AS quality
FROM m ORDER BY doc_id
"""


def quality_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation reporting: the per-source QUALITY DISTRIBUTION — decile
    buckets of the composite quality score with document counts and
    integer-ppm shares. The report a pipeline operator reads before
    setting per-source keep thresholds / mixture weights (pairs with
    ``stratified_sample`` and ``domain_mixture_sample``).

    Determinism: buckets derive from the SAME round(quality, 6) doubles
    the oracle-green ``quality_scores`` emits (identical IEEE ops both
    engines), so floor(quality*10) matches bit-for-bit; shares are
    floor-ppm integers. One groupBy + one small window over ≤ sources×10
    rows — metadata-scale output at any corpus size."""
    q = quality_scores(spark, sf_dir)
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    bucket = F.least(F.floor(F.col("quality") * 10).cast("int"), F.lit(9))
    per = (
        q.join(docs, "doc_id")
        .select("source", bucket.alias("q_bucket"))
        .groupBy("source", "q_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("source")
    return (
        per.withColumn(
            "share_ppm",
            F.floor(
                F.lit(1_000_000) * F.col("n_docs") / F.sum("n_docs").over(w)
            ).cast("long"),
        )
        .select("source", "q_bucket", "n_docs", "share_ppm")
        .orderBy("source", "q_bucket")
    )


QUALITY_MIX_SQL = f"""
WITH q AS ({QUALITY_SQL}),
b AS (
  SELECT d.source,
         LEAST(CAST(FLOOR(q.quality * 10) AS INT), 9) AS q_bucket
  FROM q JOIN documents d USING (doc_id)
), per AS (
  SELECT source, q_bucket, COUNT(*) AS n_docs FROM b GROUP BY 1, 2
)
SELECT source, q_bucket, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(FLOOR(1000000.0 * n_docs / SUM(n_docs) OVER (PARTITION BY source))
            AS BIGINT) AS share_ppm
FROM per
ORDER BY source, q_bucket
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish sub-token count via a
    regex ([a-z]+ runs, digit runs, other non-space chars) — the standard
    pre-tokenizer shape. Integer-exact."""
    docs = T(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim("text"), r"[ \t\n\f\r]+"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\f\r]"), 0))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (F.col("n_chars") / ws).cast("double").alias("chars_per_token"),
    ).select(
        "doc_id", "ws_tokens", "bpe_tokens", F.round("chars_per_token", 6).alias("chars_per_token")
    ).orderBy("doc_id")


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\f\\r]')) AS bpe_tokens,
       ROUND(CAST(n_chars AS DOUBLE) / len(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+')), 6)
         AS chars_per_token
FROM documents ORDER BY doc_id
"""


_MOD = 2147483647  # 2^31 - 1
_BASE = 131


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint over word hashes:
    acc ← (acc·131 + h64(tok) mod M) mod M, M = 2³¹−1.

    Values stay < 2^39 → no int64 overflow, ANSI-safe, exact in both
    engines. The task brief's document-fingerprinting op."""
    docs = T(spark, sf_dir, "documents")
    ts = F.split(F.trim("text"), r"[ \t\n\f\r]+")
    fp = F.aggregate(
        F.transform(ts, lambda t: h64(t) % _MOD),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _BASE + x) % _MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+'),
                          t -> {h64_sql(x='t')} % {_MOD})),
         (acc, x) -> (acc * {_BASE} + x) % {_MOD}) AS fingerprint
FROM documents ORDER BY doc_id
"""


def repetition_filter_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style per-document repetition filters (task brief
    §quality): modal-unigram fraction, modal-bigram fraction, and the
    fraction of trigram occurrences belonging to a repeated trigram; a
    document is flagged ``repetitive`` when any rule trips (modal unigram
    >15% of tokens, modal bigram >5% of bigrams, any repeated trigram).
    The corpus has no newlines, so the published duplicate-line rule is
    vacuous here and the token-level rules carry the filter.

    Scale shape: the stats are DOC-LOCAL, so one Arrow-batched pass emits
    per-doc INTEGER counters (modal counts + totals) with zero shuffle —
    embarrassingly parallel at 100 TB — and the fractions/flags stay in
    Catalyst. Flag comparisons are integer-exact (×100/×20 both sides,
    same discipline as Q11): a document landing exactly on a threshold
    can't diverge from the oracle at the ulp."""
    from collections.abc import Iterator

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches: Iterator) -> Iterator:
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                ts = text.strip().split() if isinstance(text, str) and text.strip() else [""]
                uni = Counter(ts)
                bi = Counter(zip(ts, ts[1:]))
                tri = Counter(zip(ts, ts[1:], ts[2:]))
                out.append(
                    (
                        did,
                        len(ts),
                        max(uni.values()),
                        max(len(ts) - 1, 0),
                        max(bi.values()) if bi else 0,
                        max(len(ts) - 2, 0),
                        sum(c for c in tri.values() if c > 1),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_uni", "mx_uni", "n_bi", "mx_bi", "n_tri", "dup_tri"],
            )

    st = docs.mapInPandas(
        stats,
        schema="doc_id long, n_uni long, mx_uni long, n_bi long, mx_bi long, "
        "n_tri long, dup_tri long",
    )
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(F.col(den) > 0, F.col(num).cast("double") / F.col(den)).otherwise(0.0), 6
    )
    return st.select(
        "doc_id",
        frac("mx_uni", "n_uni").alias("top_unigram_frac"),
        frac("mx_bi", "n_bi").alias("top_bigram_frac"),
        frac("dup_tri", "n_tri").alias("dup_trigram_frac"),
        (
            (F.col("mx_uni") * 100 > F.col("n_uni") * 15)
            | (F.col("mx_bi") * 20 > F.col("n_bi"))
            | (F.col("dup_tri") > 0)
        ).alias("repetitive"),
    ).orderBy("doc_id")


REPETITION_FILTER_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), uni AS (
  SELECT t.doc_id, MAX(c) AS mx_uni, CAST(SUM(c) AS BIGINT) AS n_uni
  FROM (SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id, u.t AS g FROM toks, UNNEST(ts) AS u(t))
        GROUP BY doc_id, g) t
  GROUP BY t.doc_id
), bi AS (
  SELECT t.doc_id, MAX(c) AS mx_bi, CAST(SUM(c) AS BIGINT) AS n_bi
  FROM (SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id,
                     ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)] AS g
              FROM toks, UNNEST(range(0, len(ts) - 1)) AS r(i)
              WHERE len(ts) >= 2)
        GROUP BY doc_id, g) t
  GROUP BY t.doc_id
), tri AS (
  SELECT t.doc_id,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tri,
         CAST(SUM(c) AS BIGINT) AS n_tri
  FROM (SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id,
                     ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)]
                     || ' ' || ts[CAST(i + 3 AS INT)] AS g
              FROM toks, UNNEST(range(0, len(ts) - 2)) AS r(i)
              WHERE len(ts) >= 3)
        GROUP BY doc_id, g) t
  GROUP BY t.doc_id
)
SELECT u.doc_id,
       ROUND(CAST(u.mx_uni AS DOUBLE) / u.n_uni, 6) AS top_unigram_frac,
       ROUND(CASE WHEN COALESCE(b.n_bi, 0) > 0
                  THEN CAST(b.mx_bi AS DOUBLE) / b.n_bi ELSE 0.0 END, 6)
         AS top_bigram_frac,
       ROUND(CASE WHEN COALESCE(tr.n_tri, 0) > 0
                  THEN CAST(tr.dup_tri AS DOUBLE) / tr.n_tri ELSE 0.0 END, 6)
         AS dup_trigram_frac,
       (u.mx_uni * 100 > u.n_uni * 15
        OR COALESCE(b.mx_bi, 0) * 20 > COALESCE(b.n_bi, 0)
        OR COALESCE(tr.dup_tri, 0) > 0) AS repetitive
FROM uni u
LEFT JOIN bi b USING (doc_id)
LEFT JOIN tri tr USING (doc_id)
ORDER BY u.doc_id
"""


CMS_D, CMS_W = 4, 512  # hash rows × buckets; counter state = d·w ints


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters via a count-min sketch (task brief §custom
    sketch operators): token frequencies are estimated from d=4 hash rows
    of w=512 counters — est(t) = min_r counter[r][h_r(t) mod w], an
    overestimate-only bound (Cormode & Muthukrishnan 2005) — and the top
    20 tokens by estimated count are returned.

    Scale shape: the counter table is BOUNDED state (d·w = 2048 rows
    regardless of corpus size) built with one map-side-combining groupBy
    over the exploded (row, bucket) stream; estimation broadcast-joins
    that tiny table to the candidate tokens, so no all-token counter state
    ever shuffles. Hashes are the engine's seeded-h64 family (pure
    functions of the value), so the sketch — collisions included — is
    bit-reproducible in the DuckDB oracle."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"[ \t\n\f\r]+")).alias("tok")
    )
    rb = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(h64_seeded(F.col("tok"), f"cms{r}"), F.lit(CMS_W)).alias("bucket"),
            )
            for r in range(CMS_D)
        ]
    )
    counters = (
        toks.select(F.explode(rb).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cand = toks.distinct().select("tok", F.explode(rb).alias("rb")).select(
        "tok", F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket")
    )
    est = (
        cand.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.orderBy(F.desc("est_count"), F.asc("tok")).limit(20)


def _cms_sql() -> str:
    buckets = ", ".join(
        "({h}) % {w} AS b{r}".format(
            h=h64_sql(x="'cms{r}|' || tok".format(r=r)), w=CMS_W, r=r
        )
        for r in range(CMS_D)
    )
    row_union = " UNION ALL ".join(
        f"SELECT {r} AS r, b{r} AS bucket FROM hashed" for r in range(CMS_D)
    )
    cand_union = " UNION ALL ".join(
        f"SELECT tok, {r} AS r, b{r} AS bucket FROM dhashed" for r in range(CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT u.tok FROM (
    SELECT regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+') AS ts FROM documents
  ), UNNEST(ts) AS u(tok)
), hashed AS (
  SELECT tok, {buckets} FROM toks
), counters AS (
  SELECT r, bucket, COUNT(*) AS cnt FROM ({row_union}) GROUP BY r, bucket
), dhashed AS (
  SELECT DISTINCT tok, {buckets} FROM toks
), est AS (
  SELECT c.tok, MIN(k.cnt) AS est_count
  FROM ({cand_union}) c JOIN counters k USING (r, bucket)
  GROUP BY c.tok
)
SELECT tok, est_count FROM est ORDER BY est_count DESC, tok ASC LIMIT 20
"""


# Theta/KMV-style distinct sketch: fixed-threshold hash sampling.
THETA_BITS = 4                      # sample 1/16 of the hash space
_THETA_T = 1 << (60 - THETA_BITS)   # keep h64 < 2^56
_THETA_N = 5                        # sketch distinct 5-grams


def distinct_ngrams_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 5-gram counting per source via a fixed-threshold Theta
    sketch (the KMV/theta-sketch estimator with θ pinned to 2^-4): keep
    only grams whose h64 falls below θ·2^60, count the distinct survivors,
    estimate = count · 2^4. Pure integer math end-to-end — the estimate is
    bit-identical across engines, no float harmonics (vs HyperLogLog,
    whose ln/harmonic-mean estimator is not exactly portable). ``n_exact``
    and ``rel_err`` are emitted for honesty — at production scale you drop
    the exact column; it exists here to grade the sketch.

    Scale shape: the θ filter prunes 15/16 of the gram stream MAP-SIDE
    before any shuffle (the filter is a pure function of the gram), so the
    distinct-aggregation shuffle carries ~6% of corpus grams; per-source
    distinct state is the surviving gram set only. Sketches from disjoint
    partitions/days union by keeping the same θ — the estimator
    composes incrementally without rescanning old data."""
    from nessie_spark.operators.dedup import _spread, _word_grams

    grams = _word_grams(
        _spread(spark, T(spark, sf_dir, "documents")), _THETA_N, "source"
    ).select("source", "g")
    sampled = (
        grams.where(h64(F.col("g")) < _THETA_T)
        .groupBy("source")
        .agg(F.countDistinct("g").alias("n_sampled"))
    )
    exact = grams.groupBy("source").agg(F.countDistinct("g").alias("n_exact"))
    est = F.coalesce("n_sampled", F.lit(0)) * (1 << THETA_BITS)
    return (
        exact.join(sampled, "source", "left")
        .select(
            "source",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            est.cast("long").alias("est_distinct"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(
                F.abs(est - F.col("n_exact")).cast("double") / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


DISTINCT_THETA_SQL = f"""
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), grams AS (
  SELECT source,
         unnest([ array_to_string(ts[i:i + {_THETA_N - 1}], ' ')
                  for i in range(1, len(ts) - {_THETA_N - 2}) ]) AS g
  FROM toks WHERE len(ts) >= {_THETA_N}
), sampled AS (
  SELECT source, COUNT(DISTINCT g) AS n_sampled FROM grams
  WHERE ({{h}}) < {_THETA_T} GROUP BY source
), exact AS (
  SELECT source, COUNT(DISTINCT g) AS n_exact FROM grams GROUP BY source
)
SELECT e.source,
       CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled,
       CAST(COALESCE(s.n_sampled, 0) * {1 << THETA_BITS} AS BIGINT) AS est_distinct,
       CAST(e.n_exact AS BIGINT) AS n_exact,
       ROUND(ABS(CAST(COALESCE(s.n_sampled, 0) * {1 << THETA_BITS} - e.n_exact
                 AS DOUBLE)) / e.n_exact, 4) AS rel_err
FROM exact e LEFT JOIN sampled s USING (source)
ORDER BY e.source
""".replace("{h}", h64_sql(x="g"))


_TFIDF_SCALE = 1_000_000
TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source characteristic vocabulary: top-5 tokens by tf·idf where
    each SOURCE is the 'document' (tf = token occurrences in the source,
    idf = ln(#sources / #sources containing the token)). The ranking key
    is the integer ``tf · round(ln(N/df)·1e6)`` — ties (common for
    all-source tokens whose idf is 0) break on the token string, so the
    top-5 cut is deterministic in both engines.

    Scale shape: (source, token) counts partial-aggregate map-side; df is
    one distinct-pair aggregate over the token vocabulary; idf is a
    |vocab|-row table joined back BROADCAST-style on token. The final
    top-k is a row_number window hash-partitioned by source — per-source
    vocabulary, not corpus rows; for 10^6-term vocabularies swap in the
    bucket-local top-k used by the kNN path, same contract."""
    from pyspark.sql.window import Window

    from nessie_spark.operators.dedup import _spread

    toks = _spread(spark, T(spark, sf_dir, "documents")).select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"[ \t\n\f\r]+")).alias("tok"),
    ).where(F.col("tok") != "")
    # checkpoint: tf feeds the driver-side N count, the idf aggregate, AND
    # the scored join — uncheckpointed, the corpus explode runs three times
    tf = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    n_src = tf.select("source").distinct().count()
    # (source, tok) is unique by the groupBy above — df is a plain count
    idf = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).select(
        "tok",
        "df",
        F.round(F.log(F.lit(float(n_src)) / F.col("df")) * _TFIDF_SCALE)
        .cast("long")
        .alias("idf_fp"),
    )
    scored = tf.join(F.broadcast(idf), "tok").select(
        "source", "tok", "tf", "df", (F.col("tf") * F.col("idf_fp")).alias("score_fp")
    )
    w = Window.partitionBy("source").orderBy(F.desc("score_fp"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "source",
            F.col("rank").cast("int").alias("rank"),
            F.col("tok").alias("token"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(F.col("score_fp").cast("double") / _TFIDF_SCALE, 6).alias(
                "tfidf"
            ),
        )
        .orderBy("source", "rank")
    )


TFIDF_SQL = f"""
WITH toks AS (
  SELECT source, u.tok FROM (
    SELECT source,
           regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS ts
    FROM documents
  ), UNNEST(ts) AS u(tok)
  WHERE u.tok <> ''
), tf AS (
  SELECT source, tok, COUNT(*) AS tf FROM toks GROUP BY source, tok
), idf AS (
  SELECT tok, COUNT(DISTINCT source) AS df,
         CAST(ROUND(LN(CAST((SELECT COUNT(DISTINCT source) FROM tf) AS DOUBLE)
                       / COUNT(DISTINCT source)) * {_TFIDF_SCALE}) AS BIGINT)
           AS idf_fp
  FROM tf GROUP BY tok
), scored AS (
  SELECT tf.source, tf.tok, tf.tf, idf.df, tf.tf * idf.idf_fp AS score_fp
  FROM tf JOIN idf USING (tok)
)
SELECT source, CAST(rank AS INT) AS rank, tok AS token,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       ROUND(CAST(score_fp AS DOUBLE) / {_TFIDF_SCALE}, 6) AS tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY score_fp DESC, tok) AS rank
  FROM scored
) WHERE rank <= {TFIDF_TOP_K}
ORDER BY source, rank
"""


def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: Shannon entropy of the token
    frequency distribution, ``H = ln(n) − (Σ k·ln k)/n`` nats — the
    repetition-aware quality signal (H → 0 for one-token spam, ln(n) for
    all-distinct text). The Σ k·ln k reduction is fixed-point integer
    (order-independent across engines); only the final expression touches
    doubles. Docs with no tokens score NULL.

    Scale shape: one (doc, token) count aggregation + one per-doc sum —
    both partial-aggregate map-side; zero UDF, zero joins."""
    from nessie_spark.operators.dedup import _spread

    toks = _spread(spark, T(spark, sf_dir, "documents")).select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"[ \t\n\f\r]+")).alias("tok"),
    ).where(F.col("tok") != "")
    per = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n"),
            F.sum(
                F.col("k")
                * F.round(F.log(F.col("k").cast("double")) * _TFIDF_SCALE).cast(
                    "long"
                )
            ).alias("s_fp"),
        )
    )
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.log(F.col("n").cast("double"))
                - F.col("s_fp").cast("double") / _TFIDF_SCALE / F.col("n"),
                6,
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


TOKEN_ENTROPY_SQL = f"""
WITH toks AS (
  SELECT doc_id, u.tok FROM (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS ts
    FROM documents
  ), UNNEST(ts) AS u(tok)
  WHERE u.tok <> ''
), per AS (
  SELECT doc_id, SUM(k) AS n,
         SUM(k * CAST(ROUND(LN(CAST(k AS DOUBLE)) * {_TFIDF_SCALE}) AS BIGINT))
           AS s_fp
  FROM (SELECT doc_id, tok, COUNT(*) AS k FROM toks GROUP BY doc_id, tok)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n, 0) AS BIGINT) AS n_tokens,
       ROUND(LN(CAST(per.n AS DOUBLE))
             - CAST(per.s_fp AS DOUBLE) / {_TFIDF_SCALE} / per.n, 6) AS entropy
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


QUANTILES = (25, 50, 75, 90)  # percent points reported per source


def doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length (n_chars) quantiles — the corpus-shape
    profile quality pipelines threshold against. Quantile semantics are
    SELF-DEFINED in integer math so both engines agree exactly: the p-th
    quantile is the element at rank ``1 + ((n-1)·p) DIV 100`` of the
    (n_chars, doc_id)-sorted source — no interpolation, no reliance on
    quantile_cont/percentile dialect differences.

    Scale shape: ONE row_number window hash-partitioned by source plus a
    broadcast of the 1-row-per-source counts; only the 4 rank-matched rows
    per source survive the filter. Per-source row counts at extreme scale
    make the sort-within-partition the cost — swap in approx_percentile
    (t-digest) at no schema change when exactness stops paying."""
    from pyspark.sql.window import Window

    docs = T(spark, sf_dir, "documents").select("source", "n_chars", "doc_id")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    ranked = docs.withColumn("r", F.row_number().over(w)).join(
        F.broadcast(counts), "source"
    )
    keep = None
    for p in QUANTILES:
        cond = F.col("r") == (F.lit(1) + F.expr(f"((n - 1) * {p}) DIV 100"))
        keep = cond if keep is None else (keep | cond)
    return (
        ranked.where(keep)
        .groupBy("source")
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("r")
                        == (F.lit(1) + F.expr(f"((n - 1) * {p}) DIV 100")),
                        F.col("n_chars"),
                    )
                ).alias(f"p{p}")
                for p in QUANTILES
            ]
        )
        .orderBy("source")
    )


DOCLEN_QUANTILES_SQL = f"""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source,
       {", ".join(f"MAX(CASE WHEN r = 1 + ((n - 1) * {p}) // 100 THEN n_chars END) AS p{p}" for p in QUANTILES)}
FROM ranked
WHERE {" OR ".join(f"r = 1 + ((n - 1) * {p}) // 100" for p in QUANTILES)}
GROUP BY source
ORDER BY source
"""


DLQ_SAMPLE_MOD = 8  # deterministic 1/8 row sample for the sketch path


def doclen_quantiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPROXIMATE path next to ``doclen_quantiles``' exact one: a
    deterministic hash sample (keep doc when ``h64('dlq|'||doc_id) %
    DLQ_SAMPLE_MOD == 0``) bounds per-source state to ~n/8 rows, then the
    SAME integer rank rule runs on the sample. Emits est vs exact per
    percent point plus ``rel_err`` so the sketch grades itself in the gate
    (the same honesty contract as ``distinct_ngrams_theta``).

    Scale shape: the sample predicate is a pure per-row filter (no
    sampling state, deterministic under task re-execution — the
    ``stratified_sample`` discipline) and composes under union: yesterday's
    sample plus today's IS the sample of the union, so incremental corpora
    never resample history. The exact leg exists to grade the estimate;
    a 100 TB deployment runs only the sample leg (window over ~n/8 rows).
    Both legs are one source-partitioned window each."""
    from pyspark.sql.window import Window

    docs = T(spark, sf_dir, "documents").select("source", "n_chars", "doc_id")

    def leg(df: DataFrame, tag: str) -> DataFrame:
        w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        counts = df.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        ranked = df.withColumn("r", F.row_number().over(w)).join(
            F.broadcast(counts), "source"
        )
        keep = None
        for p in QUANTILES:
            cond = F.col("r") == (F.lit(1) + F.expr(f"((n - 1) * {p}) DIV 100"))
            keep = cond if keep is None else (keep | cond)
        return (
            ranked.where(keep)
            .groupBy("source")
            .agg(
                *[
                    F.max(
                        F.when(
                            F.col("r")
                            == (F.lit(1) + F.expr(f"((n - 1) * {p}) DIV 100")),
                            F.col("n_chars"),
                        )
                    ).alias(f"{tag}_p{p}")
                    for p in QUANTILES
                ]
            )
        )

    samp = docs.where(
        F.pmod(
            h64(F.concat(F.lit("dlq|"), F.col("doc_id").cast("string"))),
            F.lit(DLQ_SAMPLE_MOD),
        )
        == 0
    )
    est, exact = leg(samp, "est"), leg(docs, "exact")
    cols = [F.col("source")]
    for p in QUANTILES:
        cols += [
            F.col(f"est_p{p}"),
            F.col(f"exact_p{p}"),
            F.round(
                F.abs(F.col(f"est_p{p}") - F.col(f"exact_p{p}"))
                / F.greatest(F.col(f"exact_p{p}"), F.lit(1)).cast("double"),
                6,
            ).alias(f"rel_err_p{p}"),
        ]
    return exact.join(est, "source", "left").select(*cols).orderBy("source")


_DLQ_H = h64_sql("'dlq|' || CAST(doc_id AS VARCHAR)")

DOCLEN_QUANTILES_SAMPLED_SQL = f"""
WITH ranked_all AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
), exact AS (
  SELECT source,
         {", ".join(f"MAX(CASE WHEN r = 1 + ((n - 1) * {p}) // 100 THEN n_chars END) AS exact_p{p}" for p in QUANTILES)}
  FROM ranked_all
  WHERE {" OR ".join(f"r = 1 + ((n - 1) * {p}) // 100" for p in QUANTILES)}
  GROUP BY source
), ranked_s AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
  WHERE {_DLQ_H} % {DLQ_SAMPLE_MOD} = 0
), est AS (
  SELECT source,
         {", ".join(f"MAX(CASE WHEN r = 1 + ((n - 1) * {p}) // 100 THEN n_chars END) AS est_p{p}" for p in QUANTILES)}
  FROM ranked_s
  WHERE {" OR ".join(f"r = 1 + ((n - 1) * {p}) // 100" for p in QUANTILES)}
  GROUP BY source
)
SELECT exact.source,
       {", ".join(f"est_p{p}, exact_p{p}, ROUND(ABS(est_p{p} - exact_p{p}) / CAST(GREATEST(exact_p{p}, 1) AS DOUBLE), 6) AS rel_err_p{p}" for p in QUANTILES)}
FROM exact LEFT JOIN est USING (source)
ORDER BY exact.source
"""


PMI_MIN_COUNT = 5
PMI_TOP_K = 50
_PMI_SCALE = 1_000_000


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church & Hanks
    1990): for every adjacent word bigram seen ≥ ``PMI_MIN_COUNT`` times
    corpus-wide, PMI = ln( p(w1,w2) / (p(w1)·p(w2)) ) with unigram
    probabilities over tokens and bigram probability over bigram slots;
    keep the ``PMI_TOP_K`` highest-PMI pairs. The standard phrase/
    tokenizer-merge pre-pass of corpus pipelines.

    Scale shape: two aggregations (unigram counts, bigram counts) over
    Catalyst-native explodes — no UDF; the bigram→unigram joins hit
    already-aggregated tables (vocab-sized, shuffle-partitioned on the
    word key). ln is applied once per surviving bigram and rounded to
    fixed-point there, so ranking and the gate compare integers."""
    docs = T(spark, sf_dir, "documents").select(
        F.split(F.trim(F.lower("text")), r"\s+").alias("ts")
    ).where(F.size("ts") >= 1)
    uni = (
        docs.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # consumers: totals + two join probes
    )
    totals = uni.agg(
        F.sum("c").alias("nt"), F.count(F.lit(1)).alias("_v")
    ).collect()[0]
    n_tok = int(totals["nt"])
    big = (
        docs.where(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ts) - 2),"
                    " i -> struct(ts[i] AS w1, ts[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= PMI_MIN_COUNT)
    )
    n_big = docs.where(F.size("ts") >= 2).agg(
        F.sum(F.size("ts") - 1).alias("nb")
    ).collect()[0]["nb"]
    joined = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12").cast("double") / F.lit(float(n_big)))
                    / (
                        (F.col("c1").cast("double") / F.lit(float(n_tok)))
                        * (F.col("c2").cast("double") / F.lit(float(n_tok)))
                    )
                )
                * _PMI_SCALE
            )
            .cast("long")
            .alias("pmi_fp"),
        )
    )
    return (
        joined.orderBy(F.desc("pmi_fp"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOP_K)
        .select("w1", "w2", "c12", "pmi_fp")
    )


PMI_SQL = f"""
WITH d AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
  FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= 1
), uni AS (
  SELECT w, COUNT(*) AS c FROM (SELECT unnest(ts) AS w FROM d) GROUP BY w
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS nt FROM uni
), big AS (
  SELECT ts[CAST(i AS INT)] AS w1, ts[CAST(i + 1 AS INT)] AS w2,
         COUNT(*) AS c12
  FROM d, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 2
  GROUP BY 1, 2
  HAVING COUNT(*) >= {PMI_MIN_COUNT}
), nb AS (
  SELECT CAST(SUM(len(ts) - 1) AS BIGINT) AS n_big FROM d WHERE len(ts) >= 2
)
SELECT b.w1, b.w2, b.c12,
       CAST(ROUND(LN((CAST(b.c12 AS DOUBLE) / (SELECT n_big FROM nb))
                     / ((CAST(u1.c AS DOUBLE) / (SELECT nt FROM tot))
                        * (CAST(u2.c AS DOUBLE) / (SELECT nt FROM tot))))
                  * {_PMI_SCALE}) AS BIGINT) AS pmi_fp
FROM big b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
ORDER BY pmi_fp DESC, w1 ASC, w2 ASC
LIMIT {PMI_TOP_K}
"""


def c4_filter_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style page filters (Raffel et al. 2020, §2.2 heuristics),
    applied at the document level: sentence count ≥ 3, no 'lorem ipsum',
    no '{' (code/markup tell), no 'javascript' token, text ends in
    terminal punctuation, and the fraction of sentences with ≥ 5 words.
    Emits the individual signals plus the composite keep decision — a
    curation pipeline wants the per-rule breakdown to audit WHY a page
    dropped, not just the verdict.

    Sentences = non-empty segments after splitting on ``[.!?]+`` runs
    (so '...' doesn't triple-count). Pure narrow map over the scan — no
    shuffle, no UDF; every expression is Catalyst regexp/HOF, identical
    in the DuckDB oracle."""
    docs = T(spark, sf_dir, "documents")
    low = F.lower("text")
    sents = F.filter(
        F.split("text", r"[.!?]+"), lambda s: F.trim(s) != ""
    )
    n_sent = F.size(sents)
    n_sent5 = F.size(
        F.filter(sents, lambda s: F.size(F.split(F.trim(s), r"\s+")) >= 5)
    )
    has_lorem = low.contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    has_js = low.rlike(r"(^|\s)javascript(\s|$)")
    ends_term = F.rtrim("text").rlike(r'[.!?"]$')
    keep = (
        (n_sent >= 3) & ~has_lorem & ~has_brace & ~has_js & ends_term
    )
    return docs.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        F.round(
            F.when(n_sent > 0, n_sent5.cast("double") / n_sent).otherwise(0.0), 6
        ).alias("frac_sent_ge5w"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_js.alias("has_javascript"),
        ends_term.alias("ends_terminal"),
        keep.alias("keep"),
    ).orderBy("doc_id")


C4_FILTER_SQL = """
WITH d AS (
  SELECT doc_id, text, lower(text) AS low,
         list_filter(regexp_split_to_array(text, '[.!?]+'),
                     s -> trim(s) != '') AS sents
  FROM documents
), m AS (
  SELECT doc_id,
         len(sents) AS n_sentences,
         len(list_filter(sents,
             s -> len(regexp_split_to_array(trim(s), '\\s+')) >= 5)) AS n5,
         low LIKE '%lorem ipsum%' AS has_lorem,
         text LIKE '%{%' AS has_brace,
         regexp_matches(low, '(^|\\s)javascript(\\s|$)') AS has_javascript,
         regexp_matches(rtrim(text), '[.!?"]$') AS ends_terminal
  FROM d
)
SELECT doc_id, n_sentences,
       ROUND(CASE WHEN n_sentences > 0
                  THEN CAST(n5 AS DOUBLE) / n_sentences ELSE 0.0 END, 6)
         AS frac_sent_ge5w,
       has_lorem, has_brace, has_javascript, ends_terminal,
       (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
        AND NOT has_javascript AND ends_terminal) AS keep
FROM m ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "lang_id_markers": (lang_id_markers, _lang_sql()),
    "c4_filter_flags": (c4_filter_flags, C4_FILTER_SQL),
    "pmi_collocations": (pmi_collocations, PMI_SQL),
    "doclen_quantiles": (doclen_quantiles, DOCLEN_QUANTILES_SQL),
    "doclen_quantiles_sampled": (
        doclen_quantiles_sampled,
        DOCLEN_QUANTILES_SAMPLED_SQL,
    ),
    "distinct_ngrams_theta": (distinct_ngrams_theta, DISTINCT_THETA_SQL),
    "tfidf_top_terms": (tfidf_top_terms, TFIDF_SQL),
    "token_entropy": (token_entropy, TOKEN_ENTROPY_SQL),
    "quality_scores": (quality_scores, QUALITY_SQL),
    "quality_mix_by_source": (quality_mix_by_source, QUALITY_MIX_SQL),
    "token_counts": (token_counts, TOKEN_COUNTS_SQL),
    "doc_fingerprints": (doc_fingerprints, DOC_FINGERPRINT_SQL),
    "repetition_filter_flags": (repetition_filter_flags, REPETITION_FILTER_SQL),
    "heavy_hitters_cms": (heavy_hitters_cms, _cms_sql()),
}
