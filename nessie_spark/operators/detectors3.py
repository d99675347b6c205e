"""Third detector suite (SURVEY.md §2.2 P7/P10, §2.3 A10, §2.7 O9).

Same cross-engine float discipline as the other operator modules: integer
count aggregates wherever sums cross a shuffle (order-independent, exact),
fixed per-row multiplication order for double products, round(·, 6) on any
emitted float. The 3 deterministic "models" are the embedding-slice argmax
voters shared with ensemble_majority_flags (probability.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.functions.core import entropy_ln, softmax_arr
from nessie_spark.operators.common import T, h64_sql

N_CLASSES = 4


def _slice(lo: int) -> Column:
    return F.transform(
        F.slice("embedding", lo, N_CLASSES), lambda v: v.cast("double")
    )


def _pred(lo: int) -> Column:
    sl = _slice(lo)
    return (F.array_position(sl, F.array_max(sl)) - 1).cast("int")


def dropout_uncertainty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DropoutUncertainty, entropy formulation (/root/reference/nessie/
    detectors/dropout_uncertainty.py:28-51, 79-91): H(mean of T repeated
    distributions). T=3 repeats = softmax over embedding slices — the
    deterministic twin of MC-dropout passes (helper.py:373-415).

    All in-row array math (zip_with / transform / aggregate): whole-stage
    codegen, zero shuffle — at 100 TB this is a pure map over the scan."""
    emb = T(spark, sf_dir, "embeddings")
    p1, p2, p3 = (softmax_arr(_slice(lo)) for lo in (1, 5, 9))
    mean = F.transform(
        F.zip_with(F.zip_with(p1, p2, lambda a, b: a + b), p3, lambda s, c: s + c),
        lambda v: v / F.lit(3.0),
    )
    return emb.select(
        "vec_id", F.round(entropy_ln(mean), 6).alias("score")
    ).orderBy("vec_id")


def dropout_original_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DropoutUncertainty, ORIGINAL formulation (/root/reference/nessie/
    detectors/dropout_uncertainty.py:55-69 — commented out in the
    reference's live path, ported for completeness, r3 VERDICT missing #3):
    score = (Σ_t y_t·y_t)/T − ȳ·ȳ over the same T=3 repeated softmax
    distributions as the entropy formulation. Pure in-row array math —
    zero shuffle, whole-stage codegen, a map over the scan at any scale."""
    emb = T(spark, sf_dir, "embeddings")
    p1, p2, p3 = (softmax_arr(_slice(lo)) for lo in (1, 5, 9))

    def dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    mean = F.transform(
        F.zip_with(F.zip_with(p1, p2, lambda a, b: a + b), p3, lambda s, c: s + c),
        lambda v: v / F.lit(3.0),
    )
    first = (dot(p1, p1) + dot(p2, p2) + dot(p3, p3)) / F.lit(3.0)
    return emb.select(
        "vec_id", F.round(first - dot(mean, mean), 6).alias("score")
    ).orderBy("vec_id")


def dropout_variance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DropoutUncertainty, VARIANCE formulation (dropout_uncertainty.py:
    72-77, the reference's other dead option): population variance of the
    T=3 per-run argmax predictions — Var = E[x²] − E[x]². argmax ties
    break to the FIRST max in numpy, Spark array_position, and DuckDB
    list_position alike, so the gate is exact. Pure map, zero shuffle."""
    emb = T(spark, sf_dir, "embeddings")
    a1, a2, a3 = (_pred(lo).cast("double") for lo in (1, 5, 9))
    mean = (a1 + a2 + a3) / F.lit(3.0)
    meansq = (a1 * a1 + a2 * a2 + a3 * a3) / F.lit(3.0)
    return emb.select(
        "vec_id", F.round(meansq - mean * mean, 6).alias("score")
    ).orderBy("vec_id")


def _softmax_sql(lo: int, hi: int) -> str:
    return f"""
      (SELECT list_transform(
         list_transform(e, x -> exp(x - list_max(e))),
         x -> x / list_sum(list_transform(e, y -> exp(y - list_max(e)))))
       FROM (SELECT list_transform(embedding[{lo}:{hi}], v -> CAST(v AS DOUBLE)) AS e))
    """


DROPOUT_UNCERTAINTY_SQL = f"""
WITH p AS (
  SELECT vec_id,
         {_softmax_sql(1, 4)} AS p1,
         {_softmax_sql(5, 8)} AS p2,
         {_softmax_sql(9, 12)} AS p3
  FROM embeddings
), m AS (
  SELECT vec_id,
         list_transform(list_zip(p1, p2, p3),
                        t -> ((t[1] + t[2]) + t[3]) / 3.0) AS mean
  FROM p
)
SELECT vec_id,
       ROUND(-list_sum(list_transform(mean,
             x -> CASE WHEN x > 0 THEN x * ln(x) ELSE 0.0 END)), 6) AS score
FROM m ORDER BY vec_id
"""


DROPOUT_ORIGINAL_SQL = f"""
WITH p AS (
  SELECT vec_id,
         {_softmax_sql(1, 4)} AS p1,
         {_softmax_sql(5, 8)} AS p2,
         {_softmax_sql(9, 12)} AS p3
  FROM embeddings
), m AS (
  SELECT vec_id, p1, p2, p3,
         list_transform(list_zip(p1, p2, p3),
                        t -> ((t[1] + t[2]) + t[3]) / 3.0) AS mean
  FROM p
)
SELECT vec_id,
       ROUND((list_sum([x * x for x in p1])
              + list_sum([x * x for x in p2])
              + list_sum([x * x for x in p3])) / 3.0
             - list_sum([x * x for x in mean]), 6) AS score
FROM m ORDER BY vec_id
"""


def _argmax_sql(lo: int, hi: int) -> str:
    return f"""
      (SELECT CAST(list_position(e, list_max(e)) - 1 AS DOUBLE)
       FROM (SELECT list_transform(embedding[{lo}:{hi}], v -> CAST(v AS DOUBLE)) AS e))
    """


DROPOUT_VARIANCE_SQL = f"""
WITH s AS (
  SELECT vec_id,
         {_argmax_sql(1, 4)} AS a1,
         {_argmax_sql(5, 8)} AS a2,
         {_argmax_sql(9, 12)} AS a3
  FROM embeddings
)
SELECT vec_id,
       ROUND((a1 * a1 + a2 * a2 + a3 * a3) / 3.0
             - ((a1 + a2 + a3) / 3.0) * ((a1 + a2 + a3) / 3.0), 6) AS score
FROM s ORDER BY vec_id
"""


def token_featurizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Handcrafted token featurizer (/root/reference/nessie/models/tagging/
    util.py:5-44): per-token surface features + a ±1 context window via
    lag/lead over (doc, position) — the reference's prev/next-word features.

    Scale shape: posexplode then two window functions over the SAME
    (doc_id, pos) ordering — one shuffle, both windows share the exchange."""
    docs = T(spark, sf_dir, "documents")
    ts = F.split(F.trim("text"), r"\s+")
    ex = docs.select("doc_id", F.posexplode(ts).alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    return ex.select(
        "doc_id",
        "pos",
        "word",
        F.lower("word").alias("w_lower"),
        F.left("word", F.lit(3)).alias("prefix3"),
        F.right("word", F.lit(3)).alias("suffix3"),
        F.col("word").rlike("^[0-9]+$").alias("is_digit"),
        F.col("word").rlike("^[A-Z]").alias("is_cap"),
        F.lag("word").over(w).alias("prev_word"),
        F.lead("word").over(w).alias("next_word"),
    ).orderBy("doc_id", "pos")


TOKEN_FEATURIZER_SQL = """
WITH ex AS (
  SELECT doc_id,
         generate_subscripts(ts, 1) - 1 AS pos,
         unnest(ts) AS word
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
        FROM documents)
)
SELECT doc_id, pos, word,
       lower(word) AS w_lower,
       left(word, 3) AS prefix3,
       right(word, 3) AS suffix3,
       regexp_matches(word, '^[0-9]+$') AS is_digit,
       regexp_matches(word, '^[A-Z]') AS is_cap,
       LAG(word)  OVER (PARTITION BY doc_id ORDER BY pos) AS prev_word,
       LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS next_word
FROM ex ORDER BY doc_id, pos
"""


def _votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, noisy, v1, v2, v3): the 3 deterministic voters."""
    emb = T(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        (F.col("label") % N_CLASSES).alias("noisy"),
        _pred(1).alias("v1"),
        _pred(5).alias("v2"),
        _pred(9).alias("v3"),
    )


_VOTES_SQL = """
  SELECT vec_id, label % 4 AS noisy,
         CAST(list_position(s1, list_max(s1)) - 1 AS INT) AS v1,
         CAST(list_position(s2, list_max(s2)) - 1 AS INT) AS v2,
         CAST(list_position(s3, list_max(s3)) - 1 AS INT) AS v3
  FROM (SELECT vec_id, label,
               list_transform(embedding[1:4],  v -> CAST(v AS DOUBLE)) AS s1,
               list_transform(embedding[5:8],  v -> CAST(v AS DOUBLE)) AS s2,
               list_transform(embedding[9:12], v -> CAST(v AS DOUBLE)) AS s3
        FROM embeddings)
"""


def item_discrimination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ItemResponseTheoryFlagger analog (/root/reference/nessie/detectors/
    irt.py:29-123): the reference fits a 2PL IRT model and flags items with
    negative discrimination. Engine twin: the classical point-biserial
    item-discrimination index — corr across the k=3 models between item
    correctness and model ability (mean correctness) — flag disc < 0.

    Ability sums are integer counts (order-independent across the shuffle);
    the per-item Pearson is a fixed-order scalar expression, so the result
    is bit-stable against the DuckDB oracle."""
    v = _votes(spark, sf_dir)
    c = v.select(
        "vec_id",
        (F.col("v1") == F.col("noisy")).cast("int").alias("c1"),
        (F.col("v2") == F.col("noisy")).cast("int").alias("c2"),
        (F.col("v3") == F.col("noisy")).cast("int").alias("c3"),
    )
    ab = c.agg(
        F.sum("c1").alias("s1"),
        F.sum("c2").alias("s2"),
        F.sum("c3").alias("s3"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        (F.col("s1") / F.col("n")).alias("a1"),
        (F.col("s2") / F.col("n")).alias("a2"),
        (F.col("s3") / F.col("n")).alias("a3"),
    )
    j = c.crossJoin(F.broadcast(ab))
    mc = (F.col("c1") + F.col("c2") + F.col("c3")) / F.lit(3.0)
    ma = (F.col("a1") + F.col("a2") + F.col("a3")) / F.lit(3.0)
    cov = (
        (F.col("c1") - mc) * (F.col("a1") - ma)
        + (F.col("c2") - mc) * (F.col("a2") - ma)
        + (F.col("c3") - mc) * (F.col("a3") - ma)
    )
    varc = (
        (F.col("c1") - mc) * (F.col("c1") - mc)
        + (F.col("c2") - mc) * (F.col("c2") - mc)
        + (F.col("c3") - mc) * (F.col("c3") - mc)
    )
    vara = (
        (F.col("a1") - ma) * (F.col("a1") - ma)
        + (F.col("a2") - ma) * (F.col("a2") - ma)
        + (F.col("a3") - ma) * (F.col("a3") - ma)
    )
    disc = F.when(varc * vara == 0, F.lit(0.0)).otherwise(
        cov / F.sqrt(varc * vara)
    )
    return j.select(
        "vec_id", F.round(disc, 6).alias("disc"), (disc < 0).alias("flag")
    ).orderBy("vec_id")


ITEM_DISCRIMINATION_SQL = f"""
WITH v AS ({_VOTES_SQL}),
c AS (
  SELECT vec_id,
         CAST(v1 = noisy AS INT) AS c1,
         CAST(v2 = noisy AS INT) AS c2,
         CAST(v3 = noisy AS INT) AS c3
  FROM v
), ab AS (
  SELECT SUM(c1) * 1.0 / COUNT(*) AS a1,
         SUM(c2) * 1.0 / COUNT(*) AS a2,
         SUM(c3) * 1.0 / COUNT(*) AS a3
  FROM c
), j AS (SELECT * FROM c CROSS JOIN ab),
d AS (
  SELECT vec_id,
         (c1 + c2 + c3) / 3.0 AS mc, (a1 + a2 + a3) / 3.0 AS ma,
         c1, c2, c3, a1, a2, a3
  FROM j
), e AS (
  SELECT vec_id,
         ((c1 - mc) * (a1 - ma) + (c2 - mc) * (a2 - ma) + (c3 - mc) * (a3 - ma)) AS cov,
         ((c1 - mc) * (c1 - mc) + (c2 - mc) * (c2 - mc) + (c3 - mc) * (c3 - mc)) AS varc,
         ((a1 - ma) * (a1 - ma) + (a2 - ma) * (a2 - ma) + (a3 - ma) * (a3 - ma)) AS vara
  FROM d
)
SELECT vec_id,
       ROUND(CASE WHEN varc * vara = 0 THEN 0.0
                  ELSE cov / sqrt(varc * vara) END, 6) AS disc,
       (CASE WHEN varc * vara = 0 THEN 0.0
             ELSE cov / sqrt(varc * vara) END) < 0 AS flag
FROM e ORDER BY vec_id
"""


DS_ITERS = 5  # EM iterations (hard-EM converges in <5 on the fixture)


def dawid_skene_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LabelAggregation (/root/reference/nessie/detectors/
    label_aggregation.py:22-80): Dawid–Skene adjudication over the worker
    votes; flag label ≠ adjudicated. The reference runs crowd-kit's soft EM
    for 100 iterations; this is the hard-EM (Viterbi-EM) variant run for
    DS_ITERS iterations from the majority-vote init — chosen because every
    m-step aggregate is then an INTEGER count (exact and
    shuffle-order-independent across engines).

    Float discipline: θ and π are single divisions of integers (identical
    doubles in both engines); the e-step score is a fixed-order 4-term
    product; argmax ties break by class asc. θ_w(c→k) = (n_wck+1)/(n_c+4),
    π(c) = (n_c+1)/(N+4) (Laplace α=1 keeps empty classes live).

    Distributed shape (r3): ONE groupBy reduces the task table to the
    vote-pattern histogram (the sufficient statistic, ≤ C^|W| rows), the
    EM iterations run weighted on it, and one broadcast join maps the
    adjudications back — bit-identical to the former 5-round distributed
    loop (the oracle still unrolls that loop and stays hash-green) at one
    shuffle of cost regardless of task count."""
    v = _votes(spark, sf_dir)
    import numpy as np

    hist = v.groupBy("v1", "v2", "v3").agg(F.count(F.lit(1)).alias("m")).orderBy(
        "v1", "v2", "v3"
    ).collect()
    if not hist:  # empty votes table: empty result, not a shape error
        return spark.createDataFrame(
            [], "vec_id long, noisy int, adjudicated int, flag boolean"
        )
    pat = np.array([[r["v1"], r["v2"], r["v3"]] for r in hist], dtype=np.int64)
    m = np.array([r["m"] for r in hist], dtype=np.int64)
    P, W = pat.shape
    n_tasks = int(m.sum())
    C = N_CLASSES

    cnt = np.zeros((P, C), dtype=np.int64)
    for c in range(C):
        cnt[:, c] = (pat == c).sum(axis=1)
    z = np.argmax(cnt, axis=1)  # majority init; first max ⇒ smallest class
    for _ in range(DS_ITERS):
        pc = np.array([m[z == c].sum() for c in range(C)], dtype=np.int64)
        theta = np.empty((W, C, C), dtype=np.float64)
        for w in range(W):
            for c in range(C):
                tw = np.array(
                    [m[(z == c) & (pat[:, w] == k)].sum() for k in range(C)],
                    dtype=np.int64,
                )
                theta[w, c] = (tw + 1).astype(np.float64) / float(pc[c] + C)
        pi = (pc + 1).astype(np.float64) / float(n_tasks + C)
        s = np.tile(pi, (P, 1))  # fixed order: ((π·θ1)·θ2)·θ3
        for w in range(W):
            s = s * theta[w][:, pat[:, w]].T
        z = np.argmax(s, axis=1)

    model = spark.createDataFrame(
        [(int(p[0]), int(p[1]), int(p[2]), int(zz)) for p, zz in zip(pat, z)],
        "v1 int, v2 int, v3 int, z int",
    )
    return (
        v.join(F.broadcast(model), ["v1", "v2", "v3"])
        .select(
            "vec_id", "noisy",
            F.col("z").alias("adjudicated"),
            (F.col("z") != F.col("noisy")).alias("flag"),
        )
        .orderBy("vec_id")
    )


def _dawid_skene_sql() -> str:
    """Oracle: the same hard-EM iterations UNROLLED into one SQL chain —
    each round's CTEs (prior_i, theta_i, scored_i, z_i) are generated by the
    same loop count DS_ITERS the Spark side runs."""
    parts = [
        f"WITH v AS MATERIALIZED ({_VOTES_SQL}),",
        "classes AS (SELECT UNNEST([0, 1, 2, 3]) AS c),",
        "total AS (SELECT COUNT(*) AS n FROM v),",
        """grid AS (
  SELECT w, a.c AS c, b.c AS k
  FROM (SELECT UNNEST([1, 2, 3]) AS w) CROSS JOIN classes a CROSS JOIN classes b
),""",
        """vc AS (
  SELECT v.vec_id, v.noisy, v.v1, v.v2, v.v3, classes.c,
         CAST(v1 = c AS INT) + CAST(v2 = c AS INT) + CAST(v3 = c AS INT) AS cnt
  FROM v CROSS JOIN classes
),""",
        """z0 AS MATERIALIZED (
  SELECT vec_id, noisy, v1, v2, v3, c AS z
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cnt DESC, c ASC) AS rk FROM vc)
  WHERE rk = 1
),""",
    ]
    for i in range(1, DS_ITERS + 1):
        p = i - 1
        parts.append(
            f"""prior{i} AS MATERIALIZED (SELECT z AS c, COUNT(*) AS pc FROM z{p} GROUP BY z),
longv{i} AS (
  SELECT z AS c, 1 AS w, v1 AS k FROM z{p}
  UNION ALL SELECT z, 2, v2 FROM z{p}
  UNION ALL SELECT z, 3, v3 FROM z{p}
),
tn{i} AS (SELECT w, c, k, COUNT(*) AS t FROM longv{i} GROUP BY w, c, k),
theta{i} AS (
  SELECT grid.w, grid.c, grid.k,
         CAST(COALESCE(t, 0) + 1 AS DOUBLE) / CAST(COALESCE(pc, 0) + 4 AS DOUBLE) AS th
  FROM grid
  LEFT JOIN tn{i} ON grid.w = tn{i}.w AND grid.c = tn{i}.c AND grid.k = tn{i}.k
  LEFT JOIN prior{i} ON grid.c = prior{i}.c
),
pri{i} AS (
  SELECT classes.c,
         CAST(COALESCE(pc, 0) + 1 AS DOUBLE) / CAST(n + 4 AS DOUBLE) AS pi
  FROM classes LEFT JOIN prior{i} ON classes.c = prior{i}.c CROSS JOIN total
),
scored{i} AS (
  SELECT v.vec_id, v.noisy, v.v1, v.v2, v.v3, classes.c,
         ((pi * t1.th) * t2.th) * t3.th AS s
  FROM v CROSS JOIN classes
  JOIN pri{i} ON classes.c = pri{i}.c
  JOIN theta{i} t1 ON t1.w = 1 AND t1.c = classes.c AND t1.k = v.v1
  JOIN theta{i} t2 ON t2.w = 2 AND t2.c = classes.c AND t2.k = v.v2
  JOIN theta{i} t3 ON t3.w = 3 AND t3.c = classes.c AND t3.k = v.v3
),
z{i} AS MATERIALIZED (
  SELECT vec_id, noisy, v1, v2, v3, c AS z
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rk FROM scored{i})
  WHERE rk = 1
),"""
        )
    parts.append(
        f"""final AS (SELECT * FROM z{DS_ITERS})
SELECT vec_id, noisy, z AS adjudicated, z != noisy AS flag
FROM final ORDER BY vec_id"""
    )
    return "\n".join(parts)


DAWID_SKENE_SQL = _dawid_skene_sql()


DS_SOFT_ITERS = 100  # crowd-kit default n_iter=100 (label_aggregation.py:78)
DS_SOFT_TOL = 1e-12  # fixed-point early stop (post-convergence rounds are no-ops)
_DS_FLOOR = 1e-12  # probability floor on confusion entries (zero-vote guard)


DS_MAX_DRIVER_PATTERNS = 100_000  # above this, EM runs distributed


def _ds_posterior(pat, pi, E, C):
    """e-step: p_pc ∝ π_c · Π_w E_w(c, v_pw) — shared by both EM paths
    (identical float order: ((π·E1)·E2)·…)."""
    import numpy as np

    s = np.tile(pi, (pat.shape[0], 1))
    for w in range(pat.shape[1]):
        s = s * E[w][:, pat[:, w]].T
    return s / s.sum(axis=1, keepdims=True)


def _ds_init_posterior(pat, C):
    """Vote-fraction init (crowd-kit's majority-probability start)."""
    import numpy as np

    p = np.zeros((pat.shape[0], C))
    for c in range(C):
        p[:, c] = (pat == c).sum(axis=1) / pat.shape[1]
    return p


def _ds_mstep(Pi_sum, S, n, C, nW):
    """m-step from the weighted sufficient statistics:
    Pi_sum[c] = Σ_p m_p·p_pc;  S[w,c,k] = Σ_{p: v_pw=k} m_p·p_pc."""
    import numpy as np

    pi = Pi_sum / n
    E = np.zeros((nW, C, C))
    for w in range(nW):
        for c in range(C):
            tot = S[w, c].sum()
            E[w, c] = (
                np.maximum(S[w, c] / tot, _DS_FLOOR) if tot > 0 else 1.0 / C
            )
    return pi, E


def _ds_batch_stats(pat, m, pi, E, C):
    """Per-batch weighted stats for one EM round. pi/E None → init round."""
    import numpy as np

    nW = pat.shape[1]
    p = _ds_init_posterior(pat, C) if pi is None else _ds_posterior(pat, pi, E, C)
    wp = p * m[:, None]
    Pi_part = wp.sum(axis=0)
    S_part = np.zeros((nW, C, C))
    for w in range(nW):
        for k in range(C):
            sel = pat[:, w] == k
            if sel.any():
                S_part[w, :, k] = wp[sel].sum(axis=0)
    return Pi_part, S_part


def soft_dawid_skene(
    votes: DataFrame,
    n_classes: int = N_CLASSES,
    n_iter: int = DS_SOFT_ITERS,
    workers: tuple = ("v1", "v2", "v3"),
    max_driver_patterns: int = DS_MAX_DRIVER_PATTERNS,
) -> DataFrame:
    """SOFT (probabilistic) Dawid–Skene EM — the reference's crowd-kit
    semantics (/root/reference/nessie/detectors/label_aggregation.py:22-80:
    ``DawidSkene(n_iter=100)``), complementing the integer-exact hard-EM
    variant above. Posteriors stay fractional across rounds, so ambiguous
    tasks (where hard EM's per-round quantization loses the 49/51 split)
    adjudicate differently — pytest NumPy-twin allclose-gated
    (tests/test_dawid_skene_soft.py); no SQL oracle (float e-step breaks
    the exact-hash discipline).

    Distributed shape: one groupBy reduces the task table to its
    sufficient statistic (the ≤ C^|W| vote-pattern histogram), and the EM
    rounds run WEIGHTED on the histogram, never on rows. Two regimes:

    - **P ≤ max_driver_patterns** (e.g. the W=3 voters: 64 patterns): the
      histogram collects to the driver (model-sized, same role as k-means
      centroids) and 100 NumPy rounds cost one shuffle + one broadcast
      join-back total.
    - **P > max_driver_patterns** (many annotators — T MC-dropout passes is
      C^T patterns): the histogram is localCheckpointed once and each EM
      round is ONE Arrow-batched pass over it (mapInPandas partial stats →
      driver sums the ≤ partitions model-sized partials → m-step on the
      driver, |W|·C² + C doubles). State per round is the model only, so
      lineage never accretes; the posterior join-back keys on the worker
      columns (sort-merge at scale, AQE broadcasts when small). Both paths
      share the same _ds_* kernels — tests/test_dawid_skene_soft.py proves
      the forced-distributed W=8 run matches the straight-line NumPy twin.

    votes: DataFrame[vec_id, noisy, *workers] with int class ids.
    Returns [vec_id, noisy, p0..p{C-1}, adjudicated, flag].
    """
    import numpy as np

    spark = votes.sparkSession

    C = n_classes
    W = list(workers)
    nW = len(W)

    hist_df = votes.groupBy(*W).agg(F.count(F.lit(1)).alias("m"))
    # orderBy fixes the driver path's float-sum order; limit(P_max+1) makes
    # the regime probe and the driver-path collect the same single job.
    hist = hist_df.orderBy(*W).limit(max_driver_patterns + 1).collect()
    if not hist:  # empty votes table: empty result, not a shape error
        return spark.createDataFrame(
            [],
            "vec_id long, noisy int, "
            + ", ".join(f"p{c} double" for c in range(C))
            + ", adjudicated int, flag boolean",
        )

    if len(hist) <= max_driver_patterns:
        pat = np.array([[r[c] for c in W] for r in hist], dtype=np.int64)
        wts = np.array([r["m"] for r in hist], dtype=np.float64)
        n = float(wts.sum())
        P = pat.shape[0]

        # SAME kernels as the distributed regime (_ds_batch_stats folds the
        # e-step posterior into the weighted sufficient statistics), so a
        # stats-kernel fix applies to both paths by construction. Output
        # posterior comes from the FINAL model, as the distributed
        # posterior_pass does; at a tol-break the final and previous models
        # differ < DS_SOFT_TOL, orders below the twin test's atol.
        pi, E = None, None
        prev = None
        for _ in range(n_iter):
            Pi_sum, S = _ds_batch_stats(pat, wts, pi, E, C)
            pi, E = _ds_mstep(Pi_sum, S, n, C, nW)
            flat = np.concatenate([pi, E.ravel()])
            if prev is not None and np.max(np.abs(flat - prev)) < DS_SOFT_TOL:
                break
            prev = flat
        p = _ds_posterior(pat, pi, E, C)

        adj = np.argmax(p, axis=1)  # first max ⇒ smallest class on ties
        model = spark.createDataFrame(
            [
                (
                    *[int(x) for x in pat[i]],
                    *[float(x) for x in p[i]],
                    int(adj[i]),
                )
                for i in range(P)
            ],
            ", ".join(f"{c} int" for c in W)
            + ", "
            + ", ".join(f"p{c} double" for c in range(C))
            + ", adjudicated int",
        )
        model = F.broadcast(model)  # ≤ max_driver_patterns rows
    else:
        model = _soft_ds_distributed_model(hist_df, W, C, n_iter)

    return (
        votes.select("vec_id", "noisy", *W)
        .join(model, W)
        .select(
            "vec_id", "noisy", *[f"p{c}" for c in range(C)], "adjudicated",
            (F.col("adjudicated") != F.col("noisy")).alias("flag"),
        )
        .orderBy("vec_id")
    )


def _soft_ds_distributed_model(
    hist_df: DataFrame, W: list, C: int, n_iter: int
) -> DataFrame:
    """Distributed weighted EM over a too-big-for-the-driver vote-pattern
    histogram. Each round: one Arrow pass emits per-batch partial
    (Pi, S) sufficient statistics (model-sized arrays), the driver sums
    them and runs the m-step; the e-step is implicit in the next round's
    pass (posterior recomputed from the broadcast model — no row-scale
    state, no lineage growth on the checkpointed histogram)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    hist = hist_df.localCheckpoint(eager=True)  # one materialization, reused n_iter×
    nW = len(W)

    def stats_pass(pi, E):
        def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            Pi_acc = np.zeros(C)
            S_acc = np.zeros((nW, C, C))
            m_acc = 0.0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pat = pdf[W].to_numpy(dtype=np.int64)
                m = pdf["m"].to_numpy(dtype=np.float64)
                Pi_p, S_p = _ds_batch_stats(pat, m, pi, E, C)
                Pi_acc += Pi_p
                S_acc += S_p
                m_acc += float(m.sum())
            yield pd.DataFrame(
                {
                    "pi": [Pi_acc.tolist()],
                    "s": [S_acc.ravel().tolist()],
                    "n": [m_acc],
                }
            )

        parts = hist.mapInPandas(
            f, "pi array<double>, s array<double>, n double"
        ).collect()
        Pi_sum = np.sum([np.array(r["pi"]) for r in parts], axis=0)
        S = np.sum(
            [np.array(r["s"]).reshape(nW, C, C) for r in parts], axis=0
        )
        n = float(sum(r["n"] for r in parts))
        return Pi_sum, S, n

    pi, E = None, None
    prev = None
    for _ in range(n_iter):
        Pi_sum, S, n = stats_pass(pi, E)
        pi, E = _ds_mstep(Pi_sum, S, n, C, nW)
        flat = np.concatenate([pi, E.ravel()])
        if prev is not None and np.max(np.abs(flat - prev)) < DS_SOFT_TOL:
            break
        prev = flat

    pi_f, E_f = pi, E

    def posterior_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pat = pdf[W].to_numpy(dtype=np.int64)
            p = _ds_posterior(pat, pi_f, E_f, C)
            out = pdf[W].copy()
            for c in range(C):
                out[f"p{c}"] = p[:, c]
            out["adjudicated"] = np.argmax(p, axis=1).astype(np.int32)
            yield out

    schema = (
        ", ".join(f"{c} int" for c in W)
        + ", "
        + ", ".join(f"p{c} double" for c in range(C))
        + ", adjudicated int"
    )
    return hist.drop("m").mapInPandas(posterior_pass, schema)


def dawid_skene_soft_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-EM Dawid–Skene over the 3 deterministic voters (rows-only
    gate; NumPy-twin allclose in tests/test_dawid_skene_soft.py)."""
    return soft_dawid_skene(_votes(spark, sf_dir))


def span_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """align_span_labeling_data (/root/reference/nessie/task_support/
    span_labeling.py:117-185): left-outer alignment of noisy spans onto gold
    spans by maximal token overlap, emitting UNALIGNED for misses — the J2
    join of SURVEY.md §2.4. Span extraction from per-token predicates is the
    BIO→span step (seqeval get_entities, span_labeling.py:248-252) recast as
    gaps-and-islands: boundary flags → running-sum segment ids.

    Deterministic synthetic spans: gold = maximal runs of words of length
    ≥ 4; noisy = maximal runs of words of length ≥ 5 (the corpus is
    lowercase, so length is the casing-free predicate). The candidate stage
    is the interval-overlap join (n.start < g.end AND g.start < n.end) —
    at scale it stays partition-local on doc_id (one shuffle, shared by the
    two window passes and the join)."""
    docs = T(spark, sf_dir, "documents")
    ts = F.split(F.trim("text"), r"\s+")
    ex = docs.select("doc_id", F.posexplode(ts).alias("pos", "word"))

    def runs(flag: Column, a: str, b: str) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy("pos")
        f = ex.withColumn("fl", flag)
        chg = F.when(
            F.lag("fl").over(w).isNull() | (F.lag("fl").over(w) != F.col("fl")), 1
        ).otherwise(0)
        g = f.withColumn(
            "grp",
            F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        return (
            g.where(F.col("fl"))
            .groupBy("doc_id", "grp")
            .agg(F.min("pos").alias(a), (F.max("pos") + 1).alias(b))
            .drop("grp")
        )

    gold = runs(F.length("word") >= 4, "g_start", "g_end")
    noisy = runs(F.length("word") >= 5, "n_start", "n_end")
    cand = noisy.join(
        gold,
        (noisy["doc_id"] == gold["doc_id"])
        & (F.col("n_start") < F.col("g_end"))
        & (F.col("g_start") < F.col("n_end")),
        "left",
    ).select(
        noisy["doc_id"], "n_start", "n_end", "g_start", "g_end",
        F.when(
            F.col("g_start").isNotNull(),
            F.least("n_end", "g_end") - F.greatest("n_start", "g_start"),
        ).alias("overlap"),
    )
    w = Window.partitionBy("doc_id", "n_start").orderBy(
        F.desc_nulls_last("overlap"), F.asc_nulls_last("g_start")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "doc_id", "n_start", "n_end", "g_start", "g_end", "overlap",
            F.when(F.col("g_start").isNotNull(), F.lit("ENT"))
            .otherwise(F.lit("UNALIGNED"))
            .alias("aligned_label"),
        )
        .orderBy("doc_id", "n_start")
    )


_SPAN_CTES = """ex AS (
  SELECT doc_id,
         generate_subscripts(ts, 1) - 1 AS pos,
         unnest(ts) AS word
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
        FROM documents)
),
gold_f AS (
  SELECT doc_id, pos, length(word) >= 4 AS fl FROM ex
),
gold_c AS (
  SELECT doc_id, pos, fl,
         CASE WHEN LAG(fl) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR LAG(fl) OVER (PARTITION BY doc_id ORDER BY pos) != fl
              THEN 1 ELSE 0 END AS chg
  FROM gold_f
),
gold_g AS (
  SELECT doc_id, pos, fl,
         SUM(chg) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM gold_c
),
gold AS (
  SELECT doc_id, MIN(pos) AS g_start, MAX(pos) + 1 AS g_end
  FROM gold_g WHERE fl GROUP BY doc_id, grp
),
noisy_f AS (
  SELECT doc_id, pos, length(word) >= 5 AS fl FROM ex
),
noisy_c AS (
  SELECT doc_id, pos, fl,
         CASE WHEN LAG(fl) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR LAG(fl) OVER (PARTITION BY doc_id ORDER BY pos) != fl
              THEN 1 ELSE 0 END AS chg
  FROM noisy_f
),
noisy_g AS (
  SELECT doc_id, pos, fl,
         SUM(chg) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM noisy_c
),
noisy AS (
  SELECT doc_id, MIN(pos) AS n_start, MAX(pos) + 1 AS n_end
  FROM noisy_g WHERE fl GROUP BY doc_id, grp
),
cand AS (
  SELECT n.doc_id, n.n_start, n.n_end, g.g_start, g.g_end,
         CASE WHEN g.g_start IS NULL THEN NULL
              ELSE least(n.n_end, g.g_end) - greatest(n.n_start, g.g_start)
         END AS overlap
  FROM noisy n
  LEFT JOIN gold g
    ON n.doc_id = g.doc_id AND n.n_start < g.g_end AND g.g_start < n.n_end
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id, n_start
      ORDER BY overlap DESC NULLS LAST, g_start ASC NULLS LAST) AS rk
  FROM cand
)"""

SPAN_ALIGNMENT_SQL = f"""
WITH {_SPAN_CTES}
SELECT doc_id, n_start, n_end, g_start, g_end, overlap,
       CASE WHEN g_start IS NOT NULL THEN 'ENT' ELSE 'UNALIGNED' END AS aligned_label
FROM ranked WHERE rk = 1 ORDER BY doc_id, n_start
"""


def span_prob_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """align_for_span_labeling (/root/reference/nessie/task_support/
    span_labeling.py:194-331) + BIO→type reduction (:334-365) — the J3 graft:
    per-token BIO-tag probabilities are MEAN-aggregated over each aligned
    span's token range (span_aggregator=np.mean, :244), then the BIO tag
    axis reduces to entity types via label_map (PER ← {{B-PER, I-PER}},
    function_aggregator=np.mean, :336-346). Unaligned spans keep their own
    range (:268-271) and the UNALIGNED label.

    Token probabilities here are the deterministic softmax over BIO logits
    derived from word length + run position (the engine's model-free stand-
    in; the reference takes them from a tagger). Float discipline: the
    over-tokens mean folds an array collected in pos order (Spark
    ``aggregate`` over ``array_sort(collect_list)``; DuckDB ``list_sum``
    over ``list(... ORDER BY pos)``) — sequential left-to-right adds in
    both engines, so the oracle is exact.

    Scale shape: the token→span range join and both window passes all key
    on doc_id — one shuffle shared end-to-end."""
    docs = T(spark, sf_dir, "documents")
    ts = F.split(F.trim("text"), r"\s+")
    ex = docs.select("doc_id", F.posexplode(ts).alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    L = F.length("word").cast("double")
    fl = F.length("word") >= 4
    prev = F.lag(fl.cast("int")).over(w)
    start = fl & (prev.isNull() | (prev == 0))
    toks = ex.select(
        "doc_id",
        "pos",
        (F.lit(4.0) - L).alias("lO"),
        ((L - F.lit(4.0)) + F.when(start, F.lit(1.0)).otherwise(F.lit(-1.0))).alias("lB"),
        ((L - F.lit(4.0)) + F.when(fl & ~start, F.lit(1.0)).otherwise(F.lit(-1.0))).alias("lI"),
    )
    mx = F.greatest("lO", "lB", "lI")
    eO, eB, eI = (F.exp(F.col(c) - mx) for c in ("lO", "lB", "lI"))
    den = (eO + eB) + eI
    probs = toks.select(
        "doc_id", "pos", (eO / den).alias("pO"), (eB / den).alias("pB"), (eI / den).alias("pI")
    )
    spans = span_alignment(spark, sf_dir).select(
        "doc_id",
        "n_start",
        "n_end",
        "aligned_label",
        F.coalesce("g_start", "n_start").alias("p_start"),
        F.coalesce("g_end", "n_end").alias("p_end"),
    )
    j = spans.join(probs, "doc_id").where(
        (F.col("pos") >= F.col("p_start")) & (F.col("pos") < F.col("p_end"))
    )
    agg = j.groupBy("doc_id", "n_start", "n_end", "aligned_label").agg(
        F.array_sort(F.collect_list(F.struct("pos", "pO", "pB", "pI"))).alias("arr")
    )

    def _mean(field: str):
        vals = F.transform("arr", lambda s: s[field])
        return F.aggregate(vals, F.lit(0.0), lambda a, v: a + v) / F.size("arr")

    mO, mB, mI = _mean("pO"), _mean("pB"), _mean("pI")
    return agg.select(
        "doc_id",
        "n_start",
        "n_end",
        "aligned_label",
        F.round(mO, 6).alias("p_o"),
        F.round((mB + mI) / F.lit(2.0), 6).alias("p_ent"),
    ).orderBy("doc_id", "n_start")


SPAN_PROB_AGG_SQL = f"""
WITH {_SPAN_CTES},
spans AS (
  SELECT doc_id, n_start, n_end,
         CASE WHEN g_start IS NOT NULL THEN 'ENT' ELSE 'UNALIGNED' END AS aligned_label,
         COALESCE(g_start, n_start) AS p_start,
         COALESCE(g_end, n_end) AS p_end
  FROM ranked WHERE rk = 1
),
tok_l AS (
  SELECT doc_id, pos,
         4.0 - CAST(length(word) AS DOUBLE) AS lO,
         (CAST(length(word) AS DOUBLE) - 4.0)
           + CASE WHEN length(word) >= 4
                   AND COALESCE(LAG(CAST(length(word) >= 4 AS INT))
                                OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
                  THEN 1.0 ELSE -1.0 END AS lB,
         (CAST(length(word) AS DOUBLE) - 4.0)
           + CASE WHEN length(word) >= 4
                   AND COALESCE(LAG(CAST(length(word) >= 4 AS INT))
                                OVER (PARTITION BY doc_id ORDER BY pos), 0) = 1
                  THEN 1.0 ELSE -1.0 END AS lI
  FROM ex
),
probs AS (
  SELECT doc_id, pos,
         exp(lO - greatest(lO, lB, lI))
           / ((exp(lO - greatest(lO, lB, lI)) + exp(lB - greatest(lO, lB, lI)))
              + exp(lI - greatest(lO, lB, lI))) AS pO,
         exp(lB - greatest(lO, lB, lI))
           / ((exp(lO - greatest(lO, lB, lI)) + exp(lB - greatest(lO, lB, lI)))
              + exp(lI - greatest(lO, lB, lI))) AS pB,
         exp(lI - greatest(lO, lB, lI))
           / ((exp(lO - greatest(lO, lB, lI)) + exp(lB - greatest(lO, lB, lI)))
              + exp(lI - greatest(lO, lB, lI))) AS pI
  FROM tok_l
),
agg AS (
  SELECT s.doc_id, s.n_start, s.n_end, s.aligned_label,
         list_sum(list(p.pO ORDER BY p.pos)) / COUNT(*) AS mO,
         list_sum(list(p.pB ORDER BY p.pos)) / COUNT(*) AS mB,
         list_sum(list(p.pI ORDER BY p.pos)) / COUNT(*) AS mI
  FROM spans s
  JOIN probs p ON s.doc_id = p.doc_id AND p.pos >= s.p_start AND p.pos < s.p_end
  GROUP BY s.doc_id, s.n_start, s.n_end, s.aligned_label
)
SELECT doc_id, n_start, n_end, aligned_label,
       ROUND(mO, 6) AS p_o,
       ROUND((mB + mI) / 2.0, 6) AS p_ent
FROM agg ORDER BY doc_id, n_start
"""


def variation_ngrams_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariationNGramsSpan (/root/reference/nessie/detectors/
    variational_principle.py:146-245), the J7 span-context equi-join:
    each span occurrence is keyed by (left context word | span surface |
    right context word); keys seen with >1 distinct label get a majority
    vote and minority occurrences are flagged.

    Spans = maximal runs of words of length ≥ 6; occurrence label = the
    document's lang (the engine's noisy-label analog, as in
    variation_ngrams_flags). Two shuffles at scale: the span window pass on
    doc_id, then the groupBy on the context key."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("ts")
    )
    ex = docs.select("doc_id", F.posexplode("ts").alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    fl = ex.withColumn("fl", F.length("word") >= 6)
    chg = F.when(
        F.lag("fl").over(w).isNull() | (F.lag("fl").over(w) != F.col("fl")), 1
    ).otherwise(0)
    spans = (
        fl.withColumn("grp", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .where(F.col("fl"))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("start"), (F.max("pos") + 1).alias("end"))
        .drop("grp")
    )
    occ = spans.join(docs, "doc_id").select(
        "doc_id", "start", "lang",
        F.concat_ws(
            "|",
            F.coalesce(F.get("ts", F.col("start") - 1), F.lit("^")),
            F.array_join(F.slice("ts", F.col("start") + 1, F.col("end") - F.col("start")), " "),
            F.coalesce(F.get("ts", F.col("end")), F.lit("$")),
        ).alias("key"),
    )
    counts = occ.groupBy("key", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.groupBy("key").agg(
        F.sum("cnt").alias("n_occ"), F.count(F.lit(1)).alias("n_langs")
    )
    mw = Window.partitionBy("key").orderBy(F.desc("cnt"), F.asc("lang"))
    modal = (
        counts.withColumn("rk", F.row_number().over(mw))
        .where(F.col("rk") == 1)
        .select("key", F.col("lang").alias("majority_lang"))
    )
    return (
        occ.join(stats.where((F.col("n_occ") >= 2) & (F.col("n_langs") >= 2)), "key")
        .join(modal, "key")
        .select(
            "key", "doc_id", "start", "lang", "majority_lang",
            (F.col("lang") != F.col("majority_lang")).alias("flag"),
        )
        .orderBy("key", "doc_id", "start")
    )


VARIATION_NGRAMS_SPAN_SQL = """
WITH docs AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
), ex AS (
  SELECT doc_id, generate_subscripts(ts, 1) - 1 AS pos, unnest(ts) AS word
  FROM docs
), flg AS (
  SELECT doc_id, pos, length(word) >= 6 AS fl FROM ex
), segc AS (
  SELECT doc_id, pos, fl,
         CASE WHEN LAG(fl) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR LAG(fl) OVER (PARTITION BY doc_id ORDER BY pos) != fl
              THEN 1 ELSE 0 END AS chg
  FROM flg
), seg AS (
  SELECT doc_id, pos, fl,
         SUM(chg) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM segc
), spans AS (
  SELECT doc_id, MIN(pos) AS start, MAX(pos) + 1 AS "end"
  FROM seg WHERE fl GROUP BY doc_id, grp
), occ AS (
  SELECT s.doc_id, s.start, d.lang,
         COALESCE(d.ts[s.start], '^') || '|' ||
         array_to_string(d.ts[s.start + 1 : s."end"], ' ') || '|' ||
         COALESCE(d.ts[s."end" + 1], '$') AS key
  FROM spans s JOIN docs d USING (doc_id)
), counts AS (
  SELECT key, lang, COUNT(*) AS cnt FROM occ GROUP BY key, lang
), stats AS (
  SELECT key, SUM(cnt) AS n_occ, COUNT(*) AS n_langs FROM counts GROUP BY key
), modal AS (
  SELECT key, lang AS majority_lang
  FROM (SELECT key, lang, ROW_NUMBER() OVER
          (PARTITION BY key ORDER BY cnt DESC, lang ASC) AS rk FROM counts)
  WHERE rk = 1
)
SELECT occ.key, occ.doc_id, occ.start, occ.lang, modal.majority_lang,
       occ.lang != modal.majority_lang AS flag
FROM occ
JOIN stats ON occ.key = stats.key AND stats.n_occ >= 2 AND stats.n_langs >= 2
JOIN modal ON occ.key = modal.key
ORDER BY occ.key, occ.doc_id, occ.start
"""


def percentage_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentage_flagged_score (/root/reference/nessie/evaluation/
    metrics.py:4-5): sum(flags)/N over the Retag-style flags of voter 1
    (retag.py:18-34: noisy != prediction). Integer count sums → exact."""
    v = _votes(spark, sf_dir)
    return v.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum((F.col("v1") != F.col("noisy")).cast("int"))
            / F.count(F.lit(1)),
            6,
        ).alias("flagged_fraction"),
    )


PERCENTAGE_FLAGGED_SQL = f"""
WITH v AS ({_VOTES_SQL})
SELECT COUNT(*) AS n,
       ROUND(SUM(CAST(v1 != noisy AS INT)) * 1.0 / COUNT(*), 6) AS flagged_fraction
FROM v
"""


N_PROJ_MODELS = 3


def projection_ensemble_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxEntProjectionEnsemble (/root/reference/nessie/detectors/
    projection_ensemble.py:17-131): a grid of random-projection models
    votes; flag = majority vote ≠ noisy label. The reference trains
    LogisticRegressions on Gaussian projections in parallel processes; the
    engine twin is k=3 deterministic sign-projection linear models —
    logit(m,c) = Σ_j sign(md5(m,c,j))·e_j — the same embarrassingly
    parallel fan-out, expressed as one posexplode + broadcast grid join +
    groupBy (the O8 `parallelize(combinations)` pattern, SURVEY.md §2.7).

    Float discipline: per-(vec,model,class) logit sums cross the shuffle →
    round(·, 6) before argmax; ties break on class asc."""
    emb = T(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        (F.col("label") % N_CLASSES).alias("noisy"),
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "j", "e"
        ),
    )
    grid = (
        spark.range(N_PROJ_MODELS)
        .select((F.col("id") + 1).cast("int").alias("m"))
        .crossJoin(spark.range(N_CLASSES).select(F.col("id").cast("int").alias("c")))
    )
    from nessie_spark.functions.core import h64

    sgn = F.when(
        F.pmod(
            h64(F.concat_ws("_", F.lit("proj"), "m", "c", "j")), F.lit(2)
        )
        == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    logits = (
        ex.crossJoin(F.broadcast(grid))
        .groupBy("vec_id", "noisy", "m", "c")
        .agg(F.round(F.sum(sgn * F.col("e")), 6).alias("logit"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.desc("logit"), F.asc("c"))
    preds = (
        logits.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .groupBy("vec_id", "noisy")
        .pivot("m", [1, 2, 3])
        .agg(F.first("c"))
        .withColumnsRenamed({"1": "p1", "2": "p2", "3": "p3"})
    )
    vote = (
        F.when((F.col("p1") == F.col("p2")) | (F.col("p1") == F.col("p3")), F.col("p1"))
        .when(F.col("p2") == F.col("p3"), F.col("p2"))
        .otherwise(F.least("p1", "p2", "p3"))
    )
    return preds.select(
        "vec_id", "noisy",
        vote.alias("vote"),
        (vote != F.col("noisy")).alias("flag"),
    ).orderBy("vec_id")


PROJECTION_ENSEMBLE_SQL = f"""
WITH ex AS (
  SELECT vec_id, label % 4 AS noisy,
         generate_subscripts(e, 1) - 1 AS j,
         unnest(e) AS e
  FROM (SELECT vec_id, label,
               list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
        FROM embeddings)
), grid AS (
  SELECT m, c
  FROM (SELECT UNNEST([1, 2, 3]) AS m) CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS c)
), logits AS (
  SELECT vec_id, noisy, m, c,
         ROUND(SUM(
           (CASE WHEN {h64_sql("'proj' || '_' || m || '_' || c || '_' || j")} % 2 = 0
                 THEN 1.0 ELSE -1.0 END) * e), 6) AS logit
  FROM ex CROSS JOIN grid
  GROUP BY vec_id, noisy, m, c
), preds_l AS (
  SELECT vec_id, noisy, m, c,
         ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY logit DESC, c ASC) AS rk
  FROM logits
), preds AS (
  SELECT vec_id, noisy,
         MAX(CASE WHEN m = 1 THEN c END) AS p1,
         MAX(CASE WHEN m = 2 THEN c END) AS p2,
         MAX(CASE WHEN m = 3 THEN c END) AS p3
  FROM preds_l WHERE rk = 1 GROUP BY vec_id, noisy
)
SELECT vec_id, noisy,
       CASE WHEN p1 = p2 OR p1 = p3 THEN p1
            WHEN p2 = p3 THEN p2
            ELSE least(p1, p2, p3) END AS vote,
       (CASE WHEN p1 = p2 OR p1 = p3 THEN p1
             WHEN p2 = p3 THEN p2
             ELSE least(p1, p2, p3) END) != noisy AS flag
FROM preds ORDER BY vec_id
"""


CS_EPOCHS = 4  # divides n·t by 4 → exact in binary floating point
CS_DECAY = 0.5  # deterministic stand-in for "training improves selected items"


def curriculum_spotter_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CurriculumSpotter (/root/reference/nessie/detectors/
    curriculum_spotter.py:30-62, callback :140-261) — the W4 per-epoch
    loss-resampling loop, driver-orchestrated:

    per epoch t = 1..E over the WHOLE dataset:
      λ_t   = mean loss of correctly-classified items (:215-220)
      easy  = loss ≤ λ_t (:222-227); hard = loss > λ_t
      picks = the ⌊n·t/E⌋ lowest-loss hard items (:229-255, argsort order =
              (loss asc, index asc))
      score += pick·(loss + 1/n_picks) (:257-261)
      next epoch's loss: items selected for training (easy ∪ picks) improve
      by CS_DECAY — the deterministic stand-in for the transformer actually
      training on the re-sampled subset (model-free engine contract).
    After the loop: score += (score == 0)·loss_final (:146-153 tie-break).

    Base loss = cross-entropy −ln p[noisy] of the deterministic softmax
    voter. The λ/n_picks scalars join back via broadcast one-row aggregates
    (no driver collect in the per-epoch dataflow); each epoch is
    localCheckpoint-ed like the Dawid–Skene loop. The oracle unrolls the
    same E epochs as MATERIALIZED CTEs."""
    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    probs = _slice(1)
    sm_mx = F.array_max(probs)
    exps = F.transform(probs, lambda v: F.exp(v - sm_mx))
    den = F.aggregate(exps, F.lit(0.0), lambda a, v: a + v)
    p = F.transform(exps, lambda v: v / den)
    d = emb.select(
        "vec_id",
        (F.col("label") % N_CLASSES).cast("int").alias("noisy"),
        p.alias("p"),
    ).select(
        "vec_id",
        "noisy",
        (F.array_position("p", F.array_max("p")) - 1).cast("int").alias("pred"),
        (-F.log(F.get("p", F.col("noisy")))).alias("loss"),
        F.lit(0.0).alias("score"),
    )
    for t in range(1, CS_EPOCHS + 1):
        d = d.localCheckpoint()
        # λ as an ORDERED fold, not avg(): a group-avg sums in shuffle order
        # and its last-ulp wobble would flip is_hard for items with loss ≈ λ.
        # (Scalar-of-the-whole-dataset: at extreme scale swap for plain avg
        # and tolerance; here cross-engine exactness wins.)
        lam = (
            d.where(F.col("pred") == F.col("noisy"))
            .agg(F.array_sort(F.collect_list(F.struct("vec_id", "loss"))).alias("arr"))
            .select(
                (
                    F.aggregate(
                        F.transform("arr", lambda s: s["loss"]),
                        F.lit(0.0),
                        lambda a, v: a + v,
                    )
                    / F.size("arr")
                ).alias("lam")
            )
        )
        k = int(n * t / CS_EPOCHS)
        dd = d.crossJoin(F.broadcast(lam)).withColumn(
            "is_hard", F.col("loss") > F.col("lam")
        )
        w = Window.partitionBy("is_hard").orderBy(F.asc("loss"), F.asc("vec_id"))
        dd = dd.withColumn("hrk", F.row_number().over(w)).withColumn(
            "pick", F.col("is_hard") & (F.col("hrk") <= k)
        )
        nh = dd.agg(F.sum(F.col("pick").cast("long")).alias("nh"))
        dd = dd.crossJoin(F.broadcast(nh))
        d = dd.select(
            "vec_id",
            "noisy",
            "pred",
            F.when(
                (F.col("loss") <= F.col("lam")) | F.col("pick"),
                F.col("loss") * CS_DECAY,
            ).otherwise(F.col("loss")).alias("loss"),
            (
                F.col("score")
                + F.when(
                    F.col("pick"), F.col("loss") + F.lit(1.0) / F.col("nh")
                ).otherwise(F.lit(0.0))
            ).alias("score"),
        )
    return d.select(
        "vec_id",
        F.round(
            F.col("score")
            + F.when(F.col("score") == 0.0, F.col("loss")).otherwise(F.lit(0.0)),
            6,
        ).alias("score"),
    ).orderBy("vec_id")


def _curriculum_sql() -> str:
    parts = [
        f"""WITH base AS MATERIALIZED (
  SELECT vec_id, noisy,
         CAST(list_position(p, list_max(p)) - 1 AS INT) AS pred,
         -ln(p[noisy + 1]) AS loss,
         0.0 AS score
  FROM (
    SELECT vec_id, CAST(label % {N_CLASSES} AS INT) AS noisy,
           list_transform(list_transform(e, x -> exp(x - list_max(e))),
                          x -> x / list_sum(list_transform(e, y -> exp(y - list_max(e))))) AS p
    FROM (SELECT vec_id, label,
                 list_transform(embedding[1:{N_CLASSES}], v -> CAST(v AS DOUBLE)) AS e
          FROM embeddings)
  )
),
n AS (SELECT COUNT(*) AS n FROM base),
e0 AS MATERIALIZED (SELECT * FROM base),"""
    ]
    for t in range(1, CS_EPOCHS + 1):
        p_ = t - 1
        parts.append(
            f"""lam{t} AS MATERIALIZED (
  SELECT list_sum(list(loss ORDER BY vec_id)) / COUNT(*) AS lam
  FROM e{p_} WHERE pred = noisy
),
rk{t} AS MATERIALIZED (
  SELECT e.*, lam, loss > lam AS is_hard,
         ROW_NUMBER() OVER (PARTITION BY loss > lam ORDER BY loss ASC, vec_id ASC) AS hrk
  FROM e{p_} e CROSS JOIN lam{t}
),
pk{t} AS MATERIALIZED (
  SELECT rk{t}.*, is_hard AND hrk <= CAST(n.n * {t} / {CS_EPOCHS}.0 AS INT) AS pick
  FROM rk{t} CROSS JOIN n
),
nh{t} AS (SELECT SUM(CAST(pick AS BIGINT)) AS nh FROM pk{t}),
e{t} AS MATERIALIZED (
  SELECT vec_id, noisy, pred,
         CASE WHEN loss <= lam OR pick THEN loss * {CS_DECAY} ELSE loss END AS loss,
         score + CASE WHEN pick THEN loss + 1.0 / nh ELSE 0.0 END AS score
  FROM pk{t} CROSS JOIN nh{t}
),"""
        )
    parts.append(
        f"""final AS (SELECT * FROM e{CS_EPOCHS})
SELECT vec_id,
       ROUND(score + CASE WHEN score = 0.0 THEN loss ELSE 0.0 END, 6) AS score
FROM final ORDER BY vec_id"""
    )
    return "\n".join(parts)


CURRICULUM_SQL = _curriculum_sql()


LS_EPOCHS = 4
LS_QUEUES = 5


def leitner_spotter_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeitnerSpotter (/root/reference/nessie/detectors/
    leitner_spotter.py:30-63, callback :225-266) — spaced-repetition queue
    scheduling as a driver loop over epoch state columns:

    every item starts in queue 0; queue q trains on epochs divisible by 2^q
    (epoch 1 trains everything, :147-152). After an epoch: trained+correct →
    promote one queue (capped), trained+wrong → demote to queue 0, untrained
    → stay. score += (in new queue 0)·(loss + 1/|queue 0|) (:262-266);
    after the loop score += (score == 0)·loss_final. (The reference's
    `_compute_new_queues` promotes `idx + 1` — the INSTANCE index, not the
    queue index — and appends new queue ids into the old queue's list; we
    graft the intended Leitner semantics the paper and the rest of the file
    describe, not the indexing slip.)

    Loss/pred are the deterministic cross-entropy voter shared with
    curriculum_spotter_scores; trained items improve by CS_DECAY per epoch.
    All state transitions are integer/comparison-exact — no float aggregates
    at all — so the unrolled-CTE oracle is bit-stable."""
    emb = T(spark, sf_dir, "embeddings")
    probs = _slice(1)
    sm_mx = F.array_max(probs)
    exps = F.transform(probs, lambda v: F.exp(v - sm_mx))
    den = F.aggregate(exps, F.lit(0.0), lambda a, v: a + v)
    p = F.transform(exps, lambda v: v / den)
    d = emb.select(
        "vec_id",
        (F.col("label") % N_CLASSES).cast("int").alias("noisy"),
        p.alias("p"),
    ).select(
        "vec_id",
        "noisy",
        (F.array_position("p", F.array_max("p")) - 1).cast("int").alias("pred"),
        (-F.log(F.get("p", F.col("noisy")))).alias("loss"),
        F.lit(0).cast("int").alias("q"),
        F.lit(0.0).alias("score"),
    )
    for t in range(1, LS_EPOCHS + 1):
        d = d.localCheckpoint()
        # shiftleft with a COLUMN amount needs the SQL form (DSL wants a literal)
        trained = F.lit(t == 1) | (F.lit(t) % F.expr("shiftleft(1, q)") == 0)
        correct = F.col("pred") == F.col("noisy")
        q_next = (
            F.when(trained & correct, F.least(F.col("q") + 1, F.lit(LS_QUEUES - 1)))
            .when(trained & ~correct, F.lit(0))
            .otherwise(F.col("q"))
        ).cast("int")
        dd = d.withColumn("qn", q_next)
        nq0 = dd.agg(F.sum((F.col("qn") == 0).cast("long")).alias("nq0"))
        d = dd.crossJoin(F.broadcast(nq0)).select(
            "vec_id",
            "noisy",
            "pred",
            F.when(trained, F.col("loss") * CS_DECAY).otherwise(F.col("loss")).alias("loss"),
            F.col("qn").alias("q"),
            (
                F.col("score")
                + F.when(
                    F.col("qn") == 0, F.col("loss") + F.lit(1.0) / F.col("nq0")
                ).otherwise(F.lit(0.0))
            ).alias("score"),
        )
    return d.select(
        "vec_id",
        F.round(
            F.col("score")
            + F.when(F.col("score") == 0.0, F.col("loss")).otherwise(F.lit(0.0)),
            6,
        ).alias("score"),
    ).orderBy("vec_id")


def _leitner_sql() -> str:
    parts = [
        f"""WITH e0 AS MATERIALIZED (
  SELECT vec_id, noisy,
         CAST(list_position(p, list_max(p)) - 1 AS INT) AS pred,
         -ln(p[noisy + 1]) AS loss,
         0 AS q,
         0.0 AS score
  FROM (
    SELECT vec_id, CAST(label % {N_CLASSES} AS INT) AS noisy,
           list_transform(list_transform(e, x -> exp(x - list_max(e))),
                          x -> x / list_sum(list_transform(e, y -> exp(y - list_max(e))))) AS p
    FROM (SELECT vec_id, label,
                 list_transform(embedding[1:{N_CLASSES}], v -> CAST(v AS DOUBLE)) AS e
          FROM embeddings)
  )
),"""
    ]
    for t in range(1, LS_EPOCHS + 1):
        p_ = t - 1
        trained = f"({'TRUE' if t == 1 else f'{t} % (1 << q) = 0'})"
        parts.append(
            f"""qn{t} AS MATERIALIZED (
  SELECT *,
         CAST(CASE WHEN {trained} AND pred = noisy THEN least(q + 1, {LS_QUEUES - 1})
                   WHEN {trained} THEN 0
                   ELSE q END AS INT) AS qn,
         {trained} AS trained
  FROM e{p_}
),
nq0_{t} AS (SELECT SUM(CAST(qn = 0 AS BIGINT)) AS nq0 FROM qn{t}),
e{t} AS MATERIALIZED (
  SELECT vec_id, noisy, pred,
         CASE WHEN trained THEN loss * {CS_DECAY} ELSE loss END AS loss,
         qn AS q,
         score + CASE WHEN qn = 0 THEN loss + 1.0 / nq0 ELSE 0.0 END AS score
  FROM qn{t} CROSS JOIN nq0_{t}
),"""
        )
    parts.append(
        f"""final AS (SELECT * FROM e{LS_EPOCHS})
SELECT vec_id,
       ROUND(score + CASE WHEN score = 0.0 THEN loss ELSE 0.0 END, 6) AS score
FROM final ORDER BY vec_id"""
    )
    return "\n".join(parts)


LEITNER_SQL = _leitner_sql()


QUERIES: dict[str, tuple] = {
    "dropout_uncertainty_scores": (dropout_uncertainty_scores, DROPOUT_UNCERTAINTY_SQL),
    "dropout_original_scores": (dropout_original_scores, DROPOUT_ORIGINAL_SQL),
    "dropout_variance_scores": (dropout_variance_scores, DROPOUT_VARIANCE_SQL),
    "span_alignment": (span_alignment, SPAN_ALIGNMENT_SQL),
    "span_prob_aggregation": (span_prob_aggregation, SPAN_PROB_AGG_SQL),
    "variation_ngrams_span": (variation_ngrams_span, VARIATION_NGRAMS_SPAN_SQL),
    "percentage_flagged": (percentage_flagged, PERCENTAGE_FLAGGED_SQL),
    "projection_ensemble_flags": (projection_ensemble_flags, PROJECTION_ENSEMBLE_SQL),
    "token_featurizer": (token_featurizer, TOKEN_FEATURIZER_SQL),
    "item_discrimination_flags": (item_discrimination_flags, ITEM_DISCRIMINATION_SQL),
    "dawid_skene_labels": (dawid_skene_labels, DAWID_SKENE_SQL),
    "dawid_skene_soft_labels": (dawid_skene_soft_labels, None),
    "curriculum_spotter_scores": (curriculum_spotter_scores, CURRICULUM_SQL),
    "leitner_spotter_scores": (leitner_spotter_scores, LEITNER_SQL),
}
