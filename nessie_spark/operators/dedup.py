"""Deduplication operators for training-data pipelines (task brief §dedup).

All hashes derive from the shared md5-based ``h64`` primitive
(functions/core.py) so every stage — minhash signatures, simhash bits, LSH
band keys — is bit-identical in the DuckDB oracle.

Scale notes:
- exact dedup: one groupBy on the content hash (map-side combine free);
- minhash LSH: signatures are per-row array math; candidates come from a
  groupBy on (band, band_key) — the only shuffle — then exact-Jaccard
  verification joins only the candidate pairs, never all pairs;
- simhash: per-row bit aggregation; near-dup candidates = equality join on
  rotated 16-bit bands (guarantees recall for hamming ≤ 3);
- ngram-jaccard: shingle-inverted-index self-join (the J6 n-gram pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.operators.common import T, h64_sql

N_MINHASH = 32
N_BANDS = 8  # 4 rows per band
JACCARD_T = 0.5

# tokenizer whitespace: the EXPLICIT class valid identically in Java regex,
# RE2 (DuckDB) and Python re — \s differs across the three dialects
# (Java/Python include \x0B, RE2 does not), so any doc containing one of
# the disputed characters would silently break engine/oracle parity
import re as _re

_WS = _re.compile(r"[ \t\n\f\r]+")
DF_CAP = 64  # ngram_jaccard stop-shingle cutoff (max k² join fanout per shingle)


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition before CPU-heavy per-row expressions.

    The testdata ships one parquet file per table, so the scan stage is ONE
    partition — without this, the 32-family minhash (or the shingle
    explode) serializes on a single core no matter the cluster size. The
    shuffled payload is raw text (tiny next to the expression work); on a
    real multi-file table this is a cheap rebalance."""
    return df.repartition(2 * spark.sparkContext.defaultParallelism)


def _shingles(col):
    """3-word shingles, distinct (first-seen order), from whitespace
    tokens. Vectorized pandas UDF, not a Catalyst higher-order function:
    HOFs evaluate interpreted (no codegen) and the transform+array_distinct
    chain measured ~1.7 ms/doc at sf0.1 — 3.5× the Arrow-batched Python
    loop, and it sat on the critical path of three dedup queries. Values
    are bit-identical to the old expression (asserted against the DuckDB
    twin, which is unchanged)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _sh(texts):
        import pandas as pd

        out = []
        for t in texts:
            ts = _WS.split((t or "").strip(" ")) if (t or "").strip(" ") else []
            if len(ts) >= 3:
                out.append(
                    list(dict.fromkeys(" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)))
                )
            else:
                out.append([" ".join(ts)])
        return pd.Series(out)

    return _sh(col)


_SHINGLES_SQL = """
  SELECT doc_id,
         CASE WHEN len(ts) >= 3
              THEN list_distinct([ ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                   for i in range(1, len(ts) - 1) ])
              ELSE [array_to_string(ts, ' ')] END AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+') AS ts FROM documents)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(content) groupBy; canonical id = min doc_id.

    One shuffle over (hash → [ids]); at 100 TB this is the cheapest pass and
    runs first in any dedup pipeline."""
    docs = T(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
        .orderBy("canonical_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
       COUNT(*) AS dup_count
FROM documents GROUP BY md5(text) ORDER BY canonical_id
"""


_MH_MOD = (1 << 60) - 93  # prime below 2^60


def _mh_sigs(sh_col, n_fams: int):
    """All ``n_fams`` minhash minima in one vectorized pandas UDF —
    bit-identical to the Catalyst expression family below (md5-prefix
    h1/h2, Kirsch–Mitzenmacher (h1 + h2·i) mod 2^60-prime): hashlib.md5
    equals F.md5 on UTF-8, and the int64 math cannot overflow
    (h1 < 2^60, h2·31 < 2^61). The HOF formulation evaluates interpreted
    per element (no codegen) and re-instantiated md5 per family at the
    signature call site — measured 32× the Arrow-batched loop at sf0.1."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _sig(shs):
        import hashlib

        import numpy as np
        import pandas as pd

        fams = np.arange(n_fams, dtype=np.int64)
        out = []
        for sh in shs:
            H1 = np.empty(len(sh), dtype=np.int64)
            H2 = np.empty(len(sh), dtype=np.int64)
            for j, s in enumerate(sh):
                m = hashlib.md5(s.encode("utf-8")).hexdigest()
                H1[j] = int(m[:15], 16)
                H2[j] = int(m[15:29], 16)
            mins = ((H1[:, None] + H2[:, None] * fams) % _MH_MOD).min(axis=0)
            out.append([int(x) for x in mins])
        return pd.Series(out)

    return _sig(sh_col)


def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (first 4 of 32 hash families exposed; exact oracle
    over the md5-derived double-hashing family). The per-row signature is
    min over shingles — array math, no shuffle."""
    docs = T(spark, sf_dir, "documents")
    d = docs.select("doc_id", _mh_sigs(_shingles(F.col("text")), 4).alias("sig"))
    cols = [F.element_at("sig", i + 1).alias(f"mh{i}") for i in range(4)]
    return d.select("doc_id", *cols).orderBy("doc_id")


def _mh_i_sql(s: str, i: int) -> str:
    h1 = f"('0x' || substring(md5({s}), 1, 15))::BIGINT"
    h2 = f"('0x' || substring(md5({s}), 16, 14))::BIGINT"
    return f"(({h1} + {h2} * {i}) % {_MH_MOD})"


DEDUP_MINHASH_SIG_SQL = f"""
WITH sh AS ({_SHINGLES_SQL})
SELECT doc_id,
       list_min([ {_mh_i_sql("s", 0)} for s in sh ]) AS mh0,
       list_min([ {_mh_i_sql("s", 1)} for s in sh ]) AS mh1,
       list_min([ {_mh_i_sql("s", 2)} for s in sh ]) AS mh2,
       list_min([ {_mh_i_sql("s", 3)} for s in sh ]) AS mh3
FROM sh ORDER BY doc_id
"""


def band_explode(sig: DataFrame, carry: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Explode an ``N_MINHASH``-wide ``sig`` array into (band, key) rows —
    band KEYS only, never payload arrays, so the 8× explode shuffles a few
    dozen bytes per row (shingle/vector payloads re-join per candidate).
    Shared by the self-join dedup path and the bench-vs-train
    decontamination path (hygiene.contamination_fuzzy)."""
    rows_per_band = N_MINHASH // N_BANDS
    return sig.select(
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(*carry, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verification.

    Pipeline: 32 minhashes → 8 bands of 4 → band-bucket groupBy → candidate
    pairs → exact Jaccard on distinct shingles ≥ 0.5. The oracle computes
    the SAME banded candidate set from the same md5 hash family before the
    exact-Jaccard filter, so the gate checks the algorithm exactly on any
    data (r1 gated against exact all-pairs, which held only because the
    fixture's planted dups have J ≈ 1 — a pair at the 0.5 threshold is
    banding-missed with p ≈ 0.6 and would have failed the gate; ADVICE r1)."""
    docs = _spread(spark, T(spark, sf_dir, "documents"))
    # materialize the two UDF stages once: d feeds sig plus BOTH candidate
    # join-backs, and sig's banded form sits on both sides of the
    # self-join — uncheckpointed, Catalyst re-executes the shingle UDF ~5x
    # and the 32-family minhash UDF 2x (the same multi-consumer
    # recomputation ngram_jaccard_top1 measured at 4x and fixed)
    d = docs.select("doc_id", _shingles(F.col("text")).alias("sh")).localCheckpoint(
        eager=True
    )
    sig = d.select(
        "doc_id", _mh_sigs(F.col("sh"), N_MINHASH).alias("sig")
    ).localCheckpoint(eager=True)
    banded = band_explode(sig)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand.join(
        d.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(d.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_T)
        .orderBy("id_a", "id_b")
    )


def _mh_band_keys_sql() -> str:
    """Band-key expressions over the 32 md5-derived minhashes — the same
    8×4 banding the Spark side joins on, so the oracle's candidate set is
    identical by construction (key format differs, equality semantics do
    not: keys are equal iff the band's 4 minhash values are equal)."""
    rows_per_band = N_MINHASH // N_BANDS
    keys = []
    for b_ in range(N_BANDS):
        parts = [
            f"CAST(list_min([ {_mh_i_sql('s', b_ * rows_per_band + r_)} for s in sh ]) AS VARCHAR)"
            for r_ in range(rows_per_band)
        ]
        keys.append(" || ',' || ".join(parts) + f" AS k{b_}")
    return ", ".join(keys)


DEDUP_MINHASH_LSH_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
banded AS (SELECT doc_id, sh, {_mh_band_keys_sql()} FROM sh),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id
   AND ({" OR ".join(f"a.k{b_} = b.k{b_}" for b_ in range(N_BANDS))})
)
SELECT id_a, id_b,
       ROUND(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
             / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
FROM cand
WHERE ROUND(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
      / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) >= {JACCARD_T}
ORDER BY id_a, id_b
"""


def _simhash_udf():
    """60-bit token-frequency-weighted simhash as one Arrow-batched UDF;
    bit-identical to the h64 (md5-prefix) expression family and the DuckDB
    twin (Java-regex \\s+ split ≡ re.split on trimmed text)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(texts):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        shifts = np.arange(60, dtype=np.int64)
        out = []
        for t in texts:
            ts = _WS.split((t or "").strip(" ")) if (t or "").strip(" ") else []
            H = np.array(
                [
                    int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                    for tok in ts
                ],
                dtype=np.int64,
            )
            bits = (H[:, None] >> shifts) & 1  # (n_tokens, 60)
            sv = (2 * bits - 1).sum(axis=0)
            out.append(int(((sv > 0).astype(np.int64) << shifts).sum()))
        return pd.Series(out)

    return _simhash


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints: 60-bit, token-frequency weighted.

    bit b of simhash = 1 iff Σ_tokens (2·bit_b(h64(token)) − 1) > 0.
    Pure integer math → exact oracle. Near-dup candidates at scale come from
    equality joins on the 4×15-bit bands (pigeonhole: hamming ≤ 3 ⇒ some
    band equal); the fingerprint itself is the per-row output here.

    Physical plan: ALL per-row, ZERO shuffles except the final
    presentation orderBy. (r1 exploded tokens×60 bit-rows through two
    shuffled groupBys — a 60× row tax at 10^12 rows for arithmetic each
    row can do locally.) The per-row fold runs as ONE Arrow-batched
    pandas UDF: the former Catalyst aggregate/zip_with chain evaluates
    interpreted (no codegen) at tokens×60 lambda calls per row — measured
    5.8 s at sf0.1 vs ~0.3 s vectorized, bit-identically (md5-prefix h64
    = hashlib.md5; Java-regex \\s+ split = re.split on trimmed text)."""
    docs = T(spark, sf_dir, "documents")
    return docs.select("doc_id", _simhash_udf()(F.col("text")).alias("simhash")).orderBy(
        "doc_id"
    )


DEDUP_SIMHASH_SQL = f"""
WITH th AS (
  SELECT doc_id, {h64_sql(x="t.tok")} AS h
  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+')) AS tok
        FROM documents) t
), bits AS (
  SELECT doc_id, b.b AS b,
         SUM(((h >> CAST(b.b AS INT)) & 1) * 2 - 1) AS sv
  FROM th, (SELECT unnest(range(60)) AS b) b
  GROUP BY doc_id, b.b
)
-- CAST: DuckDB SUM(int) yields HUGEINT; pandas-converted HUGEINT degrades to
-- float64 (lossy above 2^53 — simhash is 60-bit) and broke the r1 driver hash.
SELECT doc_id,
       CAST(SUM(CASE WHEN sv > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits GROUP BY doc_id ORDER BY doc_id
"""


SIMHASH_BANDS, SIMHASH_BAND_BITS, SIMHASH_MAX_HAMMING = 4, 15, 3


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS: hamming(simhash_a, simhash_b) ≤ 3 via
    the banding pigeonhole — 4 bands × 15 bits; any pair within hamming 3
    differs in at most 3 bands, so at least one band matches exactly
    (Manku et al., WWW'07 §3). Candidates come from ONE equi-self-join on
    (band, band_key); exact hamming (bit_count of xor) verifies candidates
    only — never all pairs. The oracle mirrors the banded candidate set
    AND the verification, so the gate is exact on any data."""
    docs = T(spark, sf_dir, "documents")
    sh = docs.select("doc_id", _simhash_udf()(F.col("text")).alias("simhash"))
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                        .alias("key"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("id_a", "id_b")
    )


DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH sh AS ({DEDUP_SIMHASH_SQL.replace("ORDER BY doc_id", "")}),
banded AS (
  SELECT doc_id, simhash, b.b AS band,
         (simhash >> (b.b * {SIMHASH_BAND_BITS})) & {(1 << SIMHASH_BAND_BITS) - 1} AS key
  FROM sh, (SELECT unnest(range({SIMHASH_BANDS})) AS b) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sa, b.simhash AS sb
  FROM banded a
  JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
ORDER BY id_a, id_b
"""


def ngram_jaccard_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document nearest neighbor by 3-shingle Jaccard, via the inverted
    shingle index (no all-pairs): explode shingles → self-join on shingle →
    per-pair intersection counts → Jaccard → window top-1.

    The Spark-native rewrite of suffix-tree repeat mining (SURVEY.md J6).

    Stop-shingle cutoff: a shingle appearing in k documents emits k² pairs
    through the self-join — unbounded fanout at 10^12 docs (r1 weakness).
    Shingles with document frequency > DF_CAP are dropped from BOTH the
    index and the per-doc sizes (Jaccard over non-stop shingles — the
    standard dedup semantic; such shingles carry no top-1 signal anyway).
    The oracle applies the identical cutoff; at the synthetic fixture's max
    df of 7 the cap changes nothing, it exists for the heavy tail. The df
    join keys on the shingle — the same key as the self-join — so both
    consume one shuffle partitioning."""
    docs = _spread(spark, T(spark, sf_dir, "documents"))
    d = docs.select("doc_id", _shingles(F.col("text")).alias("sh"))
    # Materialize the exploded (shingle, doc) index ONCE (eager local
    # checkpoint): it feeds four plan consumers (df-cutoff agg, both
    # self-join sides, per-doc sizes) and recomputing the shingle UDF +
    # explode per consumer measured 4× the pass cost (15.3 s → 6 s total
    # at sf0.1). At 100 TB the index is instead checkpointed to the table
    # store once — same shape, durable medium.
    from nessie_spark.plans.phases import phase_timer

    with phase_timer("ngram_jaccard_top1", "index_materialize"):
        inv_all = d.select("doc_id", F.explode("sh").alias("s")).localCheckpoint(
            eager=True
        )
    keep = (
        inv_all.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))  # shingles are distinct per doc
        .where(F.col("df") <= DF_CAP)
        .select("s")
    )
    inv = inv_all.join(keep, "s")
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pair_inter = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        pair_inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")), 6).alias("jaccard"),
        )
    )
    # Both directions via a row-local explode — union(jac, jac.swapped)
    # re-executes the entire pair subtree twice (self-union duplicates the
    # plan; seen in .explain), an explode emits the mirror row in place.
    both = jac.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a"), F.col("id_b"), F.col("jaccard")),
                F.struct(
                    F.col("id_b").alias("id_a"),
                    F.col("id_a").alias("id_b"),
                    F.col("jaccard"),
                ),
            )
        ).alias("r")
    ).select("r.id_a", "r.id_b", "r.jaccard")
    w = Window.partitionBy("id_a").orderBy(F.desc("jaccard"), F.asc("id_b"))
    return (
        both.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(F.col("id_a").alias("doc_id"), F.col("id_b").alias("nearest_id"), "jaccard")
        .orderBy("doc_id")
    )


NGRAM_JACCARD_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
inv0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
keep AS (SELECT s FROM inv0 GROUP BY s HAVING COUNT(*) <= {DF_CAP}),
inv AS (SELECT doc_id, s FROM inv0 JOIN keep USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM inv GROUP BY doc_id),
pair_inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac AS (
  SELECT id_a, id_b,
         ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
  FROM pair_inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
allpairs AS (
  SELECT id_a, id_b, jaccard FROM jac
  UNION ALL SELECT id_b, id_a, jaccard FROM jac
),
ranked AS (
  SELECT id_a, id_b, jaccard,
         ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY jaccard DESC, id_b ASC) AS rk
  FROM allpairs
)
SELECT id_a AS doc_id, id_b AS nearest_id, jaccard FROM ranked WHERE rk = 1
ORDER BY doc_id
"""


COS_T = 0.35  # near-dup threshold calibrated to the synthetic embeddings


EMB_BANDS, EMB_PLANES = 8, 8  # 2^8 buckets/band; recall ~0.99 at cos≥0.95


def _embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified cosine-near-dup pairs (both directions, cosine ≥ τ) — the
    shared core of ``dedup_embedding_cosine`` and
    ``dedup_embedding_clusters``.

    Physical plan (the 10^9-vector shape — NO driver collect, r1's
    ``emb.collect()`` was a driver OOM at scale): random-hyperplane sign
    bands (similarity.band_keys_udf, one vectorized matmul per Arrow batch)
    → one exploded ID-ONLY (band, key) equi-join for candidates (the
    embedding arrays are ~25x the bytes of the ids and must not ride the
    band explode) → pair dedup → arrays joined back → exact JVM-side
    cosine once per pair.

    Recall contract: candidates require one agreeing 8-plane band of 8;
    P(candidate | cos) = 1-(1-p^8)^8 with p = 1-acos(cos)/π — ≈0.99 at
    cos 0.95 (true near-dups), lower near the τ boundary. The oracles
    compute the SAME banded candidate set, so the gate checks the
    algorithm exactly rather than relying on fixture luck (ADVICE r1)."""
    from nessie_spark.functions.core import cosine_sim
    from nessie_spark.operators.similarity import band_keys_udf

    # materialized once: the plan reads emb 3x (both pair sides' array
    # join-back and under `banded` below)
    emb = _spread(
        spark,
        T(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("e")
        ),
    ).localCheckpoint(eager=False)
    # checkpointed: the self-join would run the matmul UDF once per side
    banded = emb.select(
        "vec_id",
        F.posexplode(band_keys_udf(EMB_BANDS, EMB_PLANES)(F.col("e"))).alias(
            "band", "bk"
        ),
    ).localCheckpoint(eager=False)
    pairs = (
        banded.select(F.col("vec_id").alias("id_a"), "band", "bk")
        .join(
            banded.select(F.col("vec_id").alias("id_b"), "band", "bk"),
            ["band", "bk"],
        )
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    scored = pairs.join(
        emb.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea")), "id_a"
    ).join(emb.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb")), "id_b")
    return scored.where(
        F.round(cosine_sim(F.col("ea"), F.col("eb")), 6) >= COS_T
    ).select("id_a", "id_b")


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (task brief §dedup): canonical assignment —
    canon_id = min(vec_id of any LSH-candidate neighbor with cosine ≥ τ,
    including self); is_dup marks rows that collapse onto an earlier row.
    Direct-neighbor semantics; ``dedup_embedding_clusters`` below is the
    transitive-closure view. Plan/recall: see _embedding_cosine_pairs."""
    neigh = (
        _embedding_cosine_pairs(spark, sf_dir)
        .groupBy("id_a")
        .agg(F.min("id_b").alias("min_n"))
    )
    return (
        T(spark, sf_dir, "embeddings")
        .select("vec_id")
        .join(neigh.withColumnRenamed("id_a", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.least(F.col("vec_id"), F.coalesce("min_n", F.col("vec_id"))).alias(
                "canon_id"
            ),
        )
        .withColumn("is_dup", F.col("canon_id") < F.col("vec_id"))
        .orderBy("vec_id")
    )


def dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup clusters: connected components of the cosine
    near-dup relation (transitive closure — chains A~B~C collapse into one
    cluster even though cos(A,C) < τ, which the direct-neighbor
    ``dedup_embedding_cosine`` cannot express). cluster_id = min vec_id in
    the component; same min-label-propagation engine as ``dedup_clusters``
    (one shuffle per round over the dup SUBGRAPH only)."""
    pairs = _embedding_cosine_pairs(spark, sf_dir).where(
        F.col("id_a") < F.col("id_b")
    )
    comp = min_label_components(pairs)
    return (
        T(spark, sf_dir, "embeddings")
        .select("vec_id")
        .join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("comp", F.col("vec_id")).alias("cluster_id"),
            (F.coalesce("comp", F.col("vec_id")) == F.col("vec_id")).alias(
                "is_canonical"
            ),
        )
        .orderBy("vec_id")
    )


def _emb_pairs_sql() -> str:
    """Verified cosine-near-dup pairs (both directions) — shared by the
    direct-neighbor and connected-component oracles."""
    from nessie_spark.operators.similarity import planes_sql

    band_eq = " OR ".join(f"a.band{b} = b.band{b}" for b in range(EMB_BANDS))
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e FROM embeddings
), banded AS (
  SELECT vec_id, e, {planes_sql(EMB_BANDS, EMB_PLANES)} FROM emb
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM banded a JOIN banded b ON a.vec_id != b.vec_id AND ({band_eq})
WHERE ROUND(
        list_sum([ x[1] * x[2] for x in list_zip(a.e, b.e) ])
        / (sqrt(list_sum([ y * y for y in a.e ])) * sqrt(list_sum([ z * z for z in b.e ]))),
      6) >= {COS_T}
"""


def _emb_cos_sql() -> str:
    return f"""
WITH pairs AS (
  SELECT id_a, id_b FROM ({_emb_pairs_sql()}) p
), with_self AS (
  SELECT vec_id AS id_a, vec_id AS id_b FROM embeddings
  UNION ALL SELECT id_a, id_b FROM pairs
)
SELECT id_a AS vec_id, MIN(id_b) AS canon_id, MIN(id_b) < id_a AS is_dup
FROM with_self GROUP BY id_a ORDER BY vec_id
"""


def _emb_clusters_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_emb_pairs_sql()}) p WHERE id_a < id_b
), edges AS (
  SELECT id_a, id_b FROM pairs UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM pairs
), walk(node, comp) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.id_b, w.comp FROM walk w JOIN edges e ON e.id_a = w.node
)
SELECT node AS vec_id, MIN(comp) AS cluster_id, MIN(comp) = node AS is_canonical
FROM walk GROUP BY node ORDER BY vec_id
"""


DEDUP_EMBEDDING_COSINE_SQL = _emb_cos_sql()
DEDUP_EMBEDDING_CLUSTERS_SQL = _emb_clusters_sql()


CC_DRIVER_MAX_EDGES = 100_000  # below this, union-find on the driver


def min_label_components(
    pairs: DataFrame, driver_max_edges: int = CC_DRIVER_MAX_EDGES
) -> DataFrame:
    """Connected components of an undirected edge list ``(id_a, id_b)`` →
    ``(node, comp)`` with comp = min node id in the component. Only nodes
    that appear in an edge participate — callers treat absent nodes as
    singletons.

    Size-gated hybrid (same pattern as soft Dawid–Skene's
    DS_MAX_DRIVER_PATTERNS): the dup SUBGRAPH is tiny relative to the
    corpus — banding already reduced 10^9 docs to the near-dup pairs — so
    below CC_DRIVER_MAX_EDGES the labeling runs as path-compressed
    union-find on the collected edge list (exact, ~ms, vs ~0.7 s/round of
    Spark job latency for a graph that fits in one task). Above the gate,
    the distributed loop: each round does (1) one neighbor-min hop
    (symmetric edges ⨝ labels → per-node min) and (2) one pointer-halving
    hop (``comp ← label(comp)`` — every label is itself a node id, so the
    label table is a parent-pointer forest and following it one step
    squares the propagation distance). Labels only decrease, so the loop
    terminates, and halving makes convergence **O(log diameter)** rounds
    instead of O(diameter) — measured 40 rounds → 8 on the sf0.1
    chain-shaped cosine graph, and the published MapReduce-CC answer at
    10^9 nodes. localCheckpoint per round truncates the iterative
    lineage."""
    # materialize ONCE before the size probe: pairs is typically the
    # expensive LSH-verify plan, and without this the probe executes it,
    # then the symmetric union executes it twice more
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    probe = pairs.limit(driver_max_edges + 1).collect()
    if len(probe) <= driver_max_edges:
        # complete edge list in hand — driver union-find, min-root labels
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in probe:
            a, b = row[0], row[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(n, find(n)) for n in parent]
        spark = pairs.sparkSession
        if not out:
            return spark.createDataFrame(
                [], pairs.select(F.col("id_a").alias("node")).schema
            ).select("node", F.col("node").alias("comp"))
        from pyspark.sql.types import StructField, StructType

        ntype = pairs.schema["id_a"].dataType
        schema = StructType(
            [StructField("node", ntype), StructField("comp", ntype)]
        )
        return spark.createDataFrame(out, schema)
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    comp = (
        edges.select(F.col("id_a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(32):  # O(log diameter) with halving; 2^32 ≫ any graph
        nbr_min = (
            edges.join(comp.select(F.col("node").alias("id_a"), "comp"), "id_a")
            .select(F.col("id_b").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nmin"))
        )
        cand = comp.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
        )
        parent = cand.select(
            F.col("node").alias("_pn"), F.col("comp").alias("_pc")
        )
        halved = (
            cand.join(parent, cand["comp"] == parent["_pn"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("_pc", F.col("comp"))).alias(
                    "comp"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            halved.select("node", F.col("comp").alias("new"))
            .join(comp, "node")
            .where(F.col("new") < F.col("comp"))
            .count()
        )
        comp = halved
        if changed == 0:
            return comp
    raise RuntimeError(  # pragma: no cover - 32 halving rounds = 2^32 diameter
        "min_label_components did not converge in 32 rounds"
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component dedup clusters over the verified MinHash-LSH
    near-dup graph — the batch step after pair generation in every
    large-scale dedup pipeline: cluster_id = min doc_id of the document's
    duplicate component; the canonical doc (cluster_id == doc_id) is kept,
    the rest drop. Transitive closure matters: A~B and B~C collapse to one
    cluster even when A and C never shared an LSH band.

    Distributed shape: iterative min-label propagation. Each round is ONE
    shuffle (symmetric edges ⨝ labels → per-node min, localCheckpoint to
    truncate the iterative lineage); labels only decrease, so the loop
    terminates, and it converges in O(component diameter) rounds —
    near-dup components are small and tight (copies of one source
    document), so the practical bound is a few rounds even at 10^9 docs.
    For adversarially long chains the alternating large-star/small-star
    rounds of Kiveris et al., "Connected Components in MapReduce and
    Beyond" (SoCC'14), bound it at O(log² n); dup graphs don't need that.
    The only driver-side values are per-round changed-counts (scalars)."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("id_a", "id_b")
    comp = min_label_components(pairs)
    docs = T(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).alias("cluster_id"),
            (F.coalesce("comp", F.col("doc_id")) == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
        .orderBy("doc_id")
    )


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({DEDUP_MINHASH_LSH_SQL}) p
), edges AS (
  SELECT id_a, id_b FROM pairs UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM pairs
), walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.id_b, w.comp FROM walk w JOIN edges e ON e.id_a = w.node
)
SELECT node AS doc_id, MIN(comp) AS cluster_id, MIN(comp) = node AS is_canonical
FROM walk GROUP BY node ORDER BY doc_id
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best dedup policy over the MinHash-LSH duplicate clusters:
    within each near-dup component, KEEP the single best document — here
    the longest (max ``n_chars``, doc_id ascending as the tie-break) — and
    drop the rest. This is the policy layer production dedup pipelines run
    instead of ``dedup_clusters``'s keep-min-id: near-dup copies usually
    differ by truncation/boilerplate, and the longest copy preserves the
    most content (swap in a model-based quality column at no plan change —
    the ORDER BY inside the window is the whole policy).

    Distributed shape: the same pair generation + min-label-propagation CC
    as ``dedup_clusters`` (one shuffle per CC round over the dup subgraph
    only), then ONE row_number window hash-partitioned by cluster_id —
    cluster sizes are small (copies of one source document), so the window
    has no skew at 10^9 docs. Singletons keep themselves."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("id_a", "id_b")
    comp = min_label_components(pairs)
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = docs.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        "n_chars",
        F.coalesce("comp", F.col("doc_id")).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        labeled.withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "n_chars", "keep")
        .orderBy("doc_id")
    )


DEDUP_KEEP_BEST_SQL = f"""
WITH cl AS (
  SELECT doc_id, cluster_id FROM ({DEDUP_CLUSTERS_SQL}) c
)
SELECT d.doc_id, cl.cluster_id, d.n_chars,
       (ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                           ORDER BY d.n_chars DESC, d.doc_id) = 1) AS keep
FROM documents d JOIN cl USING (doc_id)
ORDER BY doc_id
"""


def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup (the policy alternative to dropping): keep every
    document but down-weight near-dup copies by their cluster size —
    ``weight_ppm = floor(1e6 / cluster_size)`` — so a training pipeline
    samples each CONTENT once in expectation while retaining all surface
    variants. Used in production mixes where hard dedup loses useful
    paraphrase diversity; summing weights per cluster ≈ 1e6 regardless of
    copy count. Fixed-point integer ppm keeps the gate engine-portable.

    Distributed shape: the same dup-subgraph connected components as
    ``dedup_clusters`` (shuffles ∝ dup pairs, never corpus size), then ONE
    count window per cluster — cluster sizes are copies of one document,
    so no skew at 10^9 docs; singletons cost the window only."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("id_a", "id_b")
    comp = min_label_components(pairs)
    docs = T(spark, sf_dir, "documents").select("doc_id")
    labeled = docs.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("comp", F.col("doc_id")).alias("cluster_id")
    )
    w = Window.partitionBy("cluster_id")
    return (
        labeled.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn(
            "weight_ppm",
            F.floor(F.lit(1_000_000) / F.col("cluster_size")).cast("long"),
        )
        .select("doc_id", "cluster_id", "cluster_size", "weight_ppm")
        .orderBy("doc_id")
    )


DEDUP_SOFT_WEIGHTS_SQL = f"""
WITH cl AS (
  SELECT doc_id, cluster_id FROM ({DEDUP_CLUSTERS_SQL}) c
), sized AS (
  SELECT doc_id, cluster_id,
         COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM cl
)
SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(FLOOR(1000000.0 / cluster_size) AS BIGINT) AS weight_ppm
FROM sized
ORDER BY doc_id
"""


N_COVER_GRAM = 5  # duplicated-span window (tokens)


def _word_grams(docs: DataFrame, n: int, *carry: str) -> DataFrame:
    """(doc_id, *carry, g): whitespace-token n-grams with multiplicity.
    Pure Catalyst (sequence + slice + concat_ws — zero UDF); docs shorter
    than n tokens emit no rows. Shared by the duplicated-span and
    incremental-bloom screens."""
    toks = docs.select(
        "doc_id", *carry, F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+").alias("ts")
    )
    return toks.select(
        "doc_id",
        *carry,
        F.explode(
            F.when(
                F.size("ts") >= n,
                F.expr(
                    f"transform(sequence(1, size(ts) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(ts, i, {n})))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )


def dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-text coverage — the "Deduplicating
    Training Data Makes Language Models Better" (Lee et al. 2022,
    ExactSubstr) signal at n-gram granularity: per document, the fraction
    of its 5-token window positions whose gram also occurs in at least one
    OTHER document. ``flagged`` marks docs with ≥50% duplicated positions
    (integer-exact ``2·n_dup ≥ n_pos``) — the partial-overlap copies that
    document-level dedup (exact or MinHash) cannot see.

    Scale shape: gram generation is pure Catalyst (sequence + slice +
    concat_ws — zero UDF); "occurs in ≥2 docs" is ``min(doc_id) ≠
    max(doc_id)`` per gram, NOT countDistinct (no Expand blow-up), and it
    rides a groupBy with map-side partial aggregation — a stop-gram seen
    in every document partially aggregates inside each task instead of
    funnelling 10^9 rows to one reducer the way a window over
    partitionBy(gram) would. The dg⋈gram-stats join is key-skewed on hot
    grams at corpus scale: AQE skew-join splits those (and 5-gram hot keys
    are orders of magnitude rarer than unigram ones)."""
    grams = _word_grams(_spread(spark, T(spark, sf_dir, "documents")), N_COVER_GRAM)
    dg = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("k"))
    gs = dg.groupBy("g").agg((F.min("doc_id") != F.max("doc_id")).alias("dup"))
    per = (
        dg.join(gs, "g")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("np"),
            F.sum(F.when(F.col("dup"), F.col("k")).otherwise(F.lit(0))).alias("nd"),
        )
    )
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("np", F.lit(0)).cast("long").alias("n_positions"),
            F.coalesce("nd", F.lit(0)).cast("long").alias("n_dup_positions"),
            F.when(
                F.col("np") > 0,
                F.round(F.col("nd").cast("double") / F.col("np"), 6),
            ).alias("dup_frac"),
            (
                (F.coalesce("nd", F.lit(0)) * 2 >= F.coalesce("np", F.lit(0)))
                & (F.coalesce("np", F.lit(0)) > 0)
            ).alias("flagged"),
        )
        .orderBy("doc_id")
    )


DUP_NGRAM_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest([ array_to_string(ts[i:i + {N_COVER_GRAM - 1}], ' ')
                  for i in range(1, len(ts) - {N_COVER_GRAM - 2}) ]) AS g
  FROM toks WHERE len(ts) >= {N_COVER_GRAM}
), dg AS (
  SELECT doc_id, g, COUNT(*) AS k FROM grams GROUP BY doc_id, g
), gs AS (
  SELECT g, (MIN(doc_id) <> MAX(doc_id)) AS dup FROM dg GROUP BY g
), per AS (
  SELECT dg.doc_id, SUM(dg.k) AS np,
         SUM(CASE WHEN gs.dup THEN dg.k ELSE 0 END) AS nd
  FROM dg JOIN gs USING (g) GROUP BY dg.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.np, 0) AS BIGINT) AS n_positions,
       CAST(COALESCE(per.nd, 0) AS BIGINT) AS n_dup_positions,
       CASE WHEN per.np > 0
            THEN ROUND(CAST(per.nd AS DOUBLE) / per.np, 6) END AS dup_frac,
       (COALESCE(per.nd, 0) * 2 >= COALESCE(per.np, 0)
        AND COALESCE(per.np, 0) > 0) AS flagged
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSFORM complement of ``dup_ngram_coverage``: actually emit
    each document's text with cross-document duplicated spans removed —
    the Lee et al. 2022 ExactSubstr *dedup* step (their §3.2 cut, at the
    same 5-token window granularity as the coverage signal). A token is
    cut when any 5-gram window covering it also occurs in at least one
    other document; what survives is the document's unique contribution
    to the corpus. Mirrors the reference's flag→correct pairing (Retag
    flags, Retag.correct rewrites — detectors.py's P1/P2): coverage
    scores, removal rewrites.

    Scale shape: positional grams are pure Catalyst (sequence + slice —
    zero UDF); the duplicated-gram set is min≠max per gram (no
    countDistinct Expand, map-side partial agg); ONLY duplicated gram
    occurrences explode into covered positions (5 rows each — bounded by
    dup mass, not corpus mass); the rebuild is one groupBy(doc_id) whose
    collect_list holds a single document's tokens — the same per-doc
    bound every mapInPandas op already assumes. The anti-join side
    (tokens ⋈ covered positions) is an equi-join on (doc_id, p) — AQE
    splits any hot document."""
    docs = _spread(spark, T(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+").alias("ts")
    )
    n = N_COVER_GRAM
    pg = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ts") >= n,
                F.expr(
                    f"transform(sequence(1, size(ts) - {n - 1}),"
                    f" i -> struct(i, concat_ws(' ', slice(ts, i, {n})) as g))"
                ),
            ).otherwise(F.expr("array()").cast("array<struct<i:int,g:string>>"))
        ).alias("pg"),
    ).select("doc_id", F.col("pg.i").alias("i"), F.col("pg.g").alias("g"))
    # two consumers (dup-gram agg + covered-position join) — materialize
    # once instead of re-running the split/slice/concat tree per consumer
    pg = pg.localCheckpoint(eager=True)
    dup_g = (
        pg.groupBy("g")
        .agg((F.min("doc_id") != F.max("doc_id")).alias("dup"))
        .where("dup")
        .select("g")
    )
    cov = (
        pg.join(dup_g, "g")
        .select("doc_id", F.explode(F.expr(f"sequence(i, i + {n - 1})")).alias("p"))
        .distinct()
    )
    tp = toks.select(
        "doc_id", F.posexplode("ts").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    marked = tp.join(cov.withColumn("cut", F.lit(True)), ["doc_id", "p"], "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("cut"), 1).otherwise(0)).alias("n_removed"),
            F.concat_ws(
                " ",
                F.expr(
                    # collect_list skips NULLs -> only kept tokens survive;
                    # sort by position restores document order
                    "transform(array_sort(collect_list("
                    "  CASE WHEN cut IS NULL THEN struct(p, tok) END)),"
                    " x -> x.tok)"
                ),
            ).alias("cleaned_text"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_removed").cast("long").alias("n_removed"),
            "cleaned_text",
        )
        .orderBy("doc_id")
    )


DUP_SPAN_REMOVAL_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), pg AS (
  SELECT doc_id, i, array_to_string(ts[i:i + {N_COVER_GRAM - 1}], ' ') AS g
  FROM toks, UNNEST(range(1, len(ts) - {N_COVER_GRAM - 2})) AS t(i)
), dup_g AS (
  SELECT g FROM (
    SELECT g, (MIN(doc_id) <> MAX(doc_id)) AS dup FROM pg GROUP BY g
  ) WHERE dup
), cov AS (
  SELECT DISTINCT pg.doc_id, pg.i + o AS p
  FROM pg JOIN dup_g USING (g), UNNEST(range(0, {N_COVER_GRAM})) AS t(o)
), tp AS (
  SELECT doc_id, p, ts[p] AS tok
  FROM toks, UNNEST(range(1, len(ts) + 1)) AS t(p)
)
SELECT tp.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(cov.p) AS BIGINT) AS n_removed,
       COALESCE(STRING_AGG(CASE WHEN cov.p IS NULL THEN tp.tok END, ' '
                           ORDER BY tp.p), '') AS cleaned_text
FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p
GROUP BY tp.doc_id
ORDER BY tp.doc_id
"""


IB_M = 1 << 18   # bits in the historical-corpus gram bloom
IB_K = 2         # hash functions per gram
IB_NEW_MOD = 5   # doc_id % 5 == 0 plays the "newly arrived batch"


def _ib_positions():
    from nessie_spark.functions.core import h64_seeded

    return F.array(
        *[F.pmod(h64_seeded(F.col("g"), f"ib{i}"), F.lit(IB_M)) for i in range(IB_K)]
    )


def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening of a NEW batch against the
    historical corpus via a gram Bloom filter — the pattern that lets a
    continuously-ingesting pipeline dedup each day's crawl without
    rescanning 100 TB of history: the old corpus is summarized once into
    an m-bit Bloom of its 5-gram set; each new document reports what
    fraction of its distinct grams the filter claims to have seen
    (``flagged`` at ≥50%, integer-exact). Bloom false positives (k=2,
    m=2^18) inflate the fraction deterministically — both engines compute
    the identical bit positions (seeded-h64 family), so the gate checks
    the filter's real behavior, collisions included.

    Scale shape: the historical side reduces to ≤ m distinct bit rows
    (≈32 KB as a bitmap, here a relational bitset) and BROADCASTS; the new
    batch — the small side of any incremental run — is the only thing
    scanned per batch, and its gram probe never shuffles history. Unioning
    tomorrow's grams into the filter is a set-union (bit-OR), so the
    summary composes incrementally. The lakehouse's file-level blooms
    (lakehouse/bloom.py) are this same structure packed into manifest
    bytes; this operator is the corpus-level, query-facing variant."""
    docs = _spread(spark, T(spark, sf_dir, "documents")).withColumn(
        "is_new", F.col("doc_id") % IB_NEW_MOD == 0
    )
    dg = (
        _word_grams(docs, N_COVER_GRAM, "is_new")
        .select("doc_id", "is_new", "g")
        .distinct()
    )
    ex_bits = (
        dg.where(~F.col("is_new"))
        .select(F.explode(_ib_positions()).alias("bit"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    new_bits = dg.where(F.col("is_new")).select(
        "doc_id", "g", F.explode(_ib_positions()).alias("bit")
    )
    gram_hits = (
        new_bits.join(F.broadcast(ex_bits), "bit", "left")
        .groupBy("doc_id", "g")
        .agg(
            (F.count(F.lit(1)) == F.coalesce(F.sum("hit"), F.lit(0))).alias("g_hit")
        )
    )
    per = gram_hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum(F.when(F.col("g_hit"), 1).otherwise(0)).alias("nh"),
    )
    return (
        docs.where("is_new")
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("np", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("nh", F.lit(0)).cast("long").alias("n_seen"),
            F.when(
                F.col("np") > 0, F.round(F.col("nh").cast("double") / F.col("np"), 6)
            ).alias("seen_frac"),
            (
                (F.coalesce("nh", F.lit(0)) * 2 >= F.coalesce("np", F.lit(0)))
                & (F.coalesce("np", F.lit(0)) > 0)
            ).alias("flagged"),
        )
        .orderBy("doc_id")
    )


def _ib_sql() -> str:
    from nessie_spark.operators.common import h64_sql

    pos = ", ".join(
        "({h}) % {m}".format(h=h64_sql(x="'ib{i}|' || g".format(i=i)), m=IB_M)
        for i in range(IB_K)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, (doc_id % {IB_NEW_MOD} = 0) AS is_new,
         regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), g0 AS (
  SELECT doc_id, is_new,
         unnest([ array_to_string(ts[i:i + {N_COVER_GRAM - 1}], ' ')
                  for i in range(1, len(ts) - {N_COVER_GRAM - 2}) ]) AS g
  FROM toks WHERE len(ts) >= {N_COVER_GRAM}
), dg AS (
  SELECT DISTINCT doc_id, is_new, g FROM g0
), ex_bits AS (
  SELECT DISTINCT bit FROM (
    SELECT unnest([ {pos} ]) AS bit FROM dg WHERE NOT is_new
  )
), new_bits AS (
  SELECT doc_id, g, unnest([ {pos} ]) AS bit FROM dg WHERE is_new
), gh AS (
  SELECT n.doc_id, n.g,
         (COUNT(*) = SUM(CASE WHEN e.bit IS NOT NULL THEN 1 ELSE 0 END)) AS g_hit
  FROM new_bits n LEFT JOIN ex_bits e USING (bit)
  GROUP BY n.doc_id, n.g
), per AS (
  SELECT doc_id, COUNT(*) AS np,
         SUM(CASE WHEN g_hit THEN 1 ELSE 0 END) AS nh
  FROM gh GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.np, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(per.nh, 0) AS BIGINT) AS n_seen,
       CASE WHEN per.np > 0
            THEN ROUND(CAST(per.nh AS DOUBLE) / per.np, 6) END AS seen_frac,
       (COALESCE(per.nh, 0) * 2 >= COALESCE(per.np, 0)
        AND COALESCE(per.np, 0) > 0) AS flagged
FROM documents d LEFT JOIN per USING (doc_id)
WHERE d.doc_id % {IB_NEW_MOD} = 0
ORDER BY d.doc_id
"""


DEDUP_INCREMENTAL_BLOOM_SQL = _ib_sql()


def minhash_jaccard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit for the MinHash pipeline: for every banded
    candidate pair, report exact shingle Jaccard, the 32-family MinHash
    estimate (fraction of signature positions that agree — an unbiased
    estimator of Jaccard), and the absolute error. This is the query a
    pipeline owner runs before trusting LSH dedup thresholds on a new
    corpus: if the observed |error| tail is fat, 32 hashes is too few for
    the threshold in use.

    Scale shape: identical to ``dedup_minhash_lsh_pairs`` (keys-only band
    self-join, shingle and signature arrays joined back only for the
    candidate pairs; both UDF stages localCheckpointed once for their
    multiple consumers). The estimate is a 32-element zip per candidate —
    interpreted HOF, but over the candidate set, not the corpus."""
    docs = _spread(spark, T(spark, sf_dir, "documents"))
    d = docs.select("doc_id", _shingles(F.col("text")).alias("sh")).localCheckpoint(
        eager=True
    )
    sig = d.select(
        "doc_id", _mh_sigs(F.col("sh"), N_MINHASH).alias("sig")
    ).localCheckpoint(eager=True)
    payload = d.join(sig, "doc_id")
    banded = band_explode(sig)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand.join(
        payload.select(
            F.col("doc_id").alias("id_a"),
            F.col("sh").alias("sh_a"),
            F.col("sig").alias("sig_a"),
        ),
        "id_a",
    ).join(
        payload.select(
            F.col("doc_id").alias("id_b"),
            F.col("sh").alias("sh_b"),
            F.col("sig").alias("sig_b"),
        ),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    agree = F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
    jac = F.round(inter.cast("double") / union, 6)
    # k/32 is exactly representable (power-of-two denominator), so the
    # estimate and the |error| round identically on both engines
    est = F.round(agree.cast("double") / N_MINHASH, 6)
    return (
        cand.select(
            "id_a",
            "id_b",
            jac.alias("jaccard"),
            est.alias("mh_estimate"),
            F.round(F.abs(jac - est), 6).alias("abs_err"),
        )
        .orderBy("id_a", "id_b")
    )


def _mh_error_sql() -> str:
    sig_cols = ", ".join(
        f"list_min([ {_mh_i_sql('s', i)} for s in sh ]) AS mh{i}"
        for i in range(N_MINHASH)
    )
    agree = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sigs AS (SELECT doc_id, sh, {sig_cols} FROM sh),
banded AS (SELECT doc_id, sh, {_mh_band_keys_sql()} FROM sh),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id
   AND ({" OR ".join(f"a.k{b_} = b.k{b_}" for b_ in range(N_BANDS))})
), scored AS (
  SELECT c.id_a, c.id_b,
         ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
           AS jaccard,
         ROUND(CAST(({agree}) AS DOUBLE) / {N_MINHASH}, 6) AS mh_estimate
  FROM cand c
  JOIN sigs a ON a.doc_id = c.id_a
  JOIN sigs b ON b.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard, mh_estimate,
       ROUND(ABS(jaccard - mh_estimate), 6) AS abs_err
FROM scored ORDER BY id_a, id_b
"""


MINHASH_JACCARD_ERROR_SQL = _mh_error_sql()


PR_ITERS = 8  # fixed iteration count — part of the query definition
PR_SCALE = 1_000_000  # rank unit: micro-rank (all arithmetic in BIGINT)
PR_DRIVER_MAX_EDGES = 100_000  # below this, the 8 rounds run on the driver


def pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the cosine near-dup graph: which document is the most
    *central* copy in its duplicate neighborhood — the principled
    canonical-pick score (``dedup_keep_best`` keeps the best by quality;
    this ranks by graph centrality, the cluster's "representative").

    Iterative distributed compute done the Spark way (the engine's second
    iterative graph op after min-label CC): rank(v) ← 0.15 + 0.85 ·
    Σ rank(u)/deg(u) over in-neighbors, ``PR_ITERS`` fixed rounds.

    Cross-engine exactness for an ITERATIVE float algorithm: ranks live in
    integer micro-units and each round uses only order-independent integer
    ops — ``rank div deg`` per edge, integer SUM, ``(85·s) div 100`` — so
    round t is bit-identical in Spark and DuckDB (the oracle unrolls the
    same 8 rounds as CTEs). No float ever enters the loop.

    Scale shape — the same size-gated hybrid as ``min_label_components``:
    the near-dup SUBGRAPH is tiny relative to the corpus (banding already
    reduced 10^9 docs to verified pairs), so below
    ``PR_DRIVER_MAX_EDGES`` the 8 rounds run as integer dict arithmetic
    on the collected edge list (exact — the identical recurrence — and
    free of 8×2 rounds of Spark job latency). Above the gate, the
    distributed loop: edges (ids only, never vectors) localCheckpointed
    once, ranks iterated over the SUBGRAPH nodes only (isolated nodes are
    constant at the teleport floor and are unioned back at the end), one
    shuffle per round on node id, each round's rank frame
    localCheckpointed to truncate iterative lineage. Dangling mass decays
    identically in both engines and both regimes."""
    base = PR_SCALE * 15 // 100
    nodes = T(spark, sf_dir, "embeddings").select("vec_id")
    # eager: the probe, the degree agg and the loop all reuse the verified
    # pair list — without this the LSH/cosine plan re-executes per round
    edges = _embedding_cosine_pairs(spark, sf_dir).localCheckpoint(eager=True)
    probe = edges.limit(PR_DRIVER_MAX_EDGES + 1).collect()
    if len(probe) <= PR_DRIVER_MAX_EDGES:
        deg: dict = {}
        for e in probe:
            deg[e[0]] = deg.get(e[0], 0) + 1
        rank = {u: PR_SCALE for u in deg}
        for _ in range(PR_ITERS):
            s: dict = {}
            for e in probe:
                s[e[1]] = s.get(e[1], 0) + rank[e[0]] // deg[e[0]]
            rank = {u: base + (85 * s.get(u, 0)) // 100 for u in deg}
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType([
            StructField("vec_id", nodes.schema["vec_id"].dataType),
            StructField("deg", LongType()),
            StructField("rank", LongType()),
        ])
        sub = spark.createDataFrame(
            [(u, deg[u], rank[u]) for u in deg], schema
        )
    else:
        deg_df = edges.groupBy("id_a").agg(F.count(F.lit(1)).alias("deg"))
        edges_d = edges.join(deg_df, "id_a").localCheckpoint(eager=False)
        sub_nodes = deg_df.select(F.col("id_a").alias("vec_id"), "deg")
        ranks = sub_nodes.select(
            "vec_id", F.lit(PR_SCALE).cast("long").alias("rank")
        )
        for _ in range(PR_ITERS):
            contrib = (
                edges_d.join(ranks.withColumnRenamed("vec_id", "id_a"), "id_a")
                .select(
                    F.col("id_b").alias("vec_id"),
                    F.expr("rank div deg").alias("c"),
                )
            )
            summed = contrib.groupBy("vec_id").agg(F.sum("c").alias("s"))
            ranks = (
                sub_nodes.select("vec_id").join(summed, "vec_id", "left")
                .select(
                    "vec_id",
                    (
                        F.lit(base)
                        + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                    ).cast("long").alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
        sub = sub_nodes.join(ranks, "vec_id").select(
            "vec_id", F.col("deg").cast("long").alias("deg"), "rank"
        )
    return (
        nodes.join(sub, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.coalesce("rank", F.lit(base)).cast("long").alias("rank"),
        )
        .orderBy("vec_id")
    )


def _pagerank_sql() -> str:
    base = PR_SCALE * 15 // 100
    # MATERIALIZED: pairs is referenced once per iteration — without the
    # hint DuckDB may inline the banded-LSH scan 9x (measured 74 s → ~8 s)
    ctes = [
        f"pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({_emb_pairs_sql()}) p)",
        "deg AS MATERIALIZED (SELECT id_a, CAST(COUNT(*) AS BIGINT) AS deg FROM pairs GROUP BY id_a)",
        f"r0 AS (SELECT vec_id, CAST({PR_SCALE} AS BIGINT) AS rank FROM embeddings)",
    ]
    for t in range(1, PR_ITERS + 1):
        ctes.append(f"""r{t} AS (
  SELECT n.vec_id,
         CAST({base} + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
  FROM embeddings n LEFT JOIN (
    SELECT p.id_b AS vec_id, CAST(SUM(r.rank // d.deg) AS BIGINT) AS s
    FROM pairs p JOIN deg d ON p.id_a = d.id_a
                 JOIN r{t - 1} r ON r.vec_id = p.id_a
    GROUP BY p.id_b
  ) s ON s.vec_id = n.vec_id
)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT n.vec_id, COALESCE(d.deg, 0) AS deg, r.rank
FROM embeddings n
LEFT JOIN deg d ON d.id_a = n.vec_id
JOIN r{PR_ITERS} r ON r.vec_id = n.vec_id
ORDER BY n.vec_id
"""
    )


PAGERANK_NEARDUP_SQL = _pagerank_sql()


QUERIES: dict[str, tuple] = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_clusters": (dedup_clusters, DEDUP_CLUSTERS_SQL),
    "dedup_keep_best": (dedup_keep_best, DEDUP_KEEP_BEST_SQL),
    "dedup_soft_weights": (dedup_soft_weights, DEDUP_SOFT_WEIGHTS_SQL),
    "dup_ngram_coverage": (dup_ngram_coverage, DUP_NGRAM_COVERAGE_SQL),
    "dup_span_removal": (dup_span_removal, DUP_SPAN_REMOVAL_SQL),
    "dedup_incremental_bloom": (dedup_incremental_bloom, DEDUP_INCREMENTAL_BLOOM_SQL),
    "dedup_embedding_clusters": (dedup_embedding_clusters, DEDUP_EMBEDDING_CLUSTERS_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_SQL),
    "dedup_minhash_signatures": (dedup_minhash_signatures, DEDUP_MINHASH_SIG_SQL),
    "dedup_minhash_lsh_pairs": (dedup_minhash_lsh_pairs, DEDUP_MINHASH_LSH_SQL),
    "minhash_jaccard_error": (minhash_jaccard_error, MINHASH_JACCARD_ERROR_SQL),
    "pagerank_neardup": (pagerank_neardup, PAGERANK_NEARDUP_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_simhash_pairs": (dedup_simhash_pairs, DEDUP_SIMHASH_PAIRS_SQL),
    "ngram_jaccard_top1": (ngram_jaccard_top1, NGRAM_JACCARD_SQL),
}
