"""Text-analysis operators for training-data pipelines (task brief §text).

All-expression implementations (no UDFs): language-ID via marker-word
counting (integer-exact), quality scoring from length/stopword/char ratios,
BPE-ish token counting via regexp, and a rolling polynomial fingerprint over
the shared h64 hash — every operator exactly reproduced by its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nessie_spark.functions.core import h64
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


def lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count marker hits per language, predict the
    argmax (ties broken by fixed language order). Integer-exact."""
    docs = T(spark, sf_dir, "documents")
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
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        best.alias("marker_hits"),
        (pred == F.col("lang")).alias("is_correct"),
    ).orderBy("doc_id")


def _lang_sql() -> str:
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
    return f"""
WITH d AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), counted AS (
  SELECT doc_id, lang, {cols} FROM d
)
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


QUERIES: dict[str, tuple] = {
    "lang_id_markers": (lang_id_markers, _lang_sql()),
    "quality_scores": (quality_scores, QUALITY_SQL),
    "token_counts": (token_counts, TOKEN_COUNTS_SQL),
    "doc_fingerprints": (doc_fingerprints, DOC_FINGERPRINT_SQL),
}
