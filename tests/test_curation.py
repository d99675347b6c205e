"""Sequence packing + stratified mixing (operators/curation.py): the
batch-assembly semantics and the determinism/scale properties the
docstrings promise."""

import pyspark.sql.functions as F

from nessie_spark.operators import curation as C


def _docs(spark, tmp_path, rows):
    d = str(tmp_path / "cur")
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_pack_concat_then_split_layout(spark, tmp_path):
    """Documents pack contiguously per shard: offsets advance by token
    count mod budget, a straddler belongs to the sequence it starts in,
    and sequence ids are nondecreasing in doc order."""
    B = C.PACK_BUDGET
    # lang 'a': 3 docs of 200 tokens — doc 2 starts at 400, straddles the
    # 512 boundary, and must land in seq 0 at offset 400
    rows = [(i, "a", " ".join(["tok"] * 200)) for i in range(3)]
    # lang 'b': one oversized doc (700 tokens > budget) then a small one
    rows += [(10, "b", " ".join(["tok"] * 700)), (11, "b", "x y z")]
    got = {r.doc_id: r for r in C.doc_pack_sequences(spark, _docs(spark, tmp_path, rows)).collect()}
    assert (got[0].seq_id, got[0].seq_offset) == (0, 0)
    assert (got[1].seq_id, got[1].seq_offset) == (0, 200)
    assert (got[2].seq_id, got[2].seq_offset) == (0, 400)  # straddler
    assert (got[10].seq_id, got[10].seq_offset) == (0, 0)
    # doc 11 starts at 700 → seq 1, offset 700 - 512
    assert (got[11].seq_id, got[11].seq_offset) == (1, 700 - B)
    assert all(0 <= r.seq_offset < B for r in got.values())


def test_pack_shards_are_independent(spark, tmp_path):
    """Adding documents to one shard never moves another shard's packing
    (the property that makes the job parallel across shards)."""
    base = [(i, "a", "one two three") for i in range(5)]
    d1 = _docs(spark, tmp_path / "v1", base)
    d2 = _docs(spark, tmp_path / "v2", base + [(100, "zz", " ".join(["t"] * 50))])
    p1 = {r.doc_id: (r.seq_id, r.seq_offset) for r in C.doc_pack_sequences(spark, d1).collect()}
    p2 = {r.doc_id: (r.seq_id, r.seq_offset) for r in C.doc_pack_sequences(spark, d2).collect()}
    assert all(p2[i] == p1[i] for i in p1)


def test_stratified_sample_rates_and_determinism(spark, tmp_path):
    rows = (
        [(i, "a", " ".join(["w"] * 80)) for i in range(40)]          # long
        + [(100 + i, "a", " ".join(["w"] * 30)) for i in range(40)]  # mid
        + [(200 + i, "a", "w w") for i in range(200)]                # short
    )
    d = _docs(spark, tmp_path, rows)
    kept = C.stratified_sample(spark, d)
    k1 = {(r.doc_id, r.bucket) for r in kept.collect()}
    # long: rate 100 → every doc kept
    assert {i for i, b in k1 if b == "long"} == set(range(40))
    # mid ≈ 50%, short ≈ 10% (hash-uniform; wide tolerance at n=40/200)
    n_mid = sum(1 for _, b in k1 if b == "mid")
    n_short = sum(1 for _, b in k1 if b == "short")
    assert 10 <= n_mid <= 30
    assert 5 <= n_short <= 40
    # deterministic: a second evaluation returns the identical id set
    k2 = {(r.doc_id, r.bucket) for r in C.stratified_sample(spark, d).collect()}
    assert k1 == k2


def test_stratified_sample_is_monotone_in_rate(spark, tmp_path):
    """Tightening a keep rate keeps a subset of the previous rows (the
    hash-threshold property that makes mixtures refinable): every doc the
    10% threshold keeps, the 50% threshold also keeps."""
    from nessie_spark.functions.core import h64

    rows = [(i, "a", "w w") for i in range(300)]
    d = _docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    draw = F.pmod(h64(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), F.lit(100))
    at10 = {r.doc_id for r in docs.where(draw < 10).collect()}
    at50 = {r.doc_id for r in docs.where(draw < 50).collect()}
    assert at10 <= at50
    assert len(at10) < len(at50) < 300


def test_pack_plan_has_no_python_udf(spark, tmp_path):
    """Both curation ops are pure Catalyst — no Python evaluation nodes in
    the physical plan."""
    import contextlib
    import io

    rows = [(i, "a", "one two") for i in range(10)]
    d = _docs(spark, tmp_path, rows)
    for fn in (C.doc_pack_sequences, C.stratified_sample):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, d).explain("formatted")
        plan = buf.getvalue()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, fn.__name__


def _docs_src(spark, tmp_path, rows):
    d = str(tmp_path / "mix")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_domain_mixture_quotas_are_exact_and_upweight_small(spark, tmp_path):
    """Per-domain keep counts equal the integer-exact quota formula
    (B*w_s) DIV w_total with w_s = round(n_s^alpha * 1e6), and the
    temperature rule up-weights the small domain: its keep FRACTION
    exceeds the big domain's."""
    import math

    rows = [(i, "big", f"doc number {i} words") for i in range(160)]
    rows += [(1000 + i, "small", f"tiny doc {i}") for i in range(10)]
    got = C.domain_mixture_sample(spark, _docs_src(spark, tmp_path, rows)).collect()
    by_src = {"big": 0, "small": 0}
    for r in got:
        by_src[r.source] += 1
    w = {s: round(math.pow(n, C.MIX_ALPHA) * 1_000_000) for s, n in (("big", 160), ("small", 10))}
    budget = (170 * C.MIX_BUDGET_PCT) // 100
    q = {s: (budget * w[s]) // (w["big"] + w["small"]) for s in w}
    assert by_src == q, (by_src, q)
    assert q["small"] / 10 > q["big"] / 160  # alpha<1 favors small domains
    # ranks within a domain are exactly 1..q_s (the q_s smallest draws)
    ranks = sorted(r.src_rank for r in got if r.source == "small")
    assert ranks == list(range(1, q["small"] + 1))


def test_domain_mixture_is_deterministic(spark, tmp_path):
    """Re-running the sampler picks the identical mixture (hash draws,
    not RNG state)."""
    rows = [(i, "s" + str(i % 3), f"text {i}") for i in range(90)]
    d = _docs_src(spark, tmp_path, rows)
    a = {r.doc_id for r in C.domain_mixture_sample(spark, d).collect()}
    b = {r.doc_id for r in C.domain_mixture_sample(spark, d).collect()}
    assert a == b and len(a) > 0


def test_trigram_lm_garbled_doc_scores_lowest(spark, tmp_path):
    """A doc made of corpus-rare trigrams gets the lowest avg_logp (the
    CCNet-tail property the filter exists for); a doc shorter than one
    trigram scores NULL with n_grams=0."""
    common = "the cat sat on the mat and the dog sat on the log"
    rows = [(i, "a", common) for i in range(20)]
    rows += [(100, "a", "zq xvj qkz wxq jzv kqx vjz")]  # garbled
    rows += [(101, "a", "zz")]  # too short after normalization
    got = {r.doc_id: r for r in C.trigram_lm_quality(spark, _docs_src(spark, tmp_path, rows)).collect()}
    assert got[101].n_grams == 0 and got[101].avg_logp is None
    scored = {i: r.avg_logp for i, r in got.items() if r.avg_logp is not None}
    assert min(scored, key=scored.get) == 100
    # natural docs share identical text -> identical scores
    assert len({scored[i] for i in range(20)}) == 1


def test_dsir_target_like_doc_scores_higher_and_keeps(spark, tmp_path):
    """A train doc written in the target split's character distribution
    gets a higher importance ratio (and keep=True) than a corpus-typical
    doc; target-split docs never appear in the output."""
    rows = [(i, "src0", "zebra quilt jazz vex zebra quilt jazz vex") for i in range(3)]
    rows += [(10 + i, "srcA", "common words appear here very often indeed") for i in range(6)]
    rows += [(20, "srcB", "zebra quilt jazz vex zebra")]   # target-like
    rows += [(21, "srcB", "common words appear here too")]  # corpus-typical
    got = {r.doc_id: r for r in C.dsir_importance_score(
        spark, _docs_src(spark, tmp_path, rows)).collect()}
    assert all(i not in got for i in range(3))  # target split excluded
    assert got[20].keep and got[20].avg_log_ratio > got[21].avg_log_ratio
    assert not got[21].keep


def test_quality_mix_by_source_shares(spark):
    """Mix report: shares are floor-ppm per source (sum ≤ 1e6), buckets lie
    in [0, 9], and per-source counts reconcile with the corpus."""
    from nessie_spark.operators import textstats as TS

    sf = "/root/testdata/sf0.001"
    rows = TS.quality_mix_by_source(spark, sf).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert 0 <= r.q_bucket <= 9
        by_src.setdefault(r.source, []).append(r)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    per_src = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, rs in by_src.items():
        assert sum(r.n_docs for r in rs) == per_src[src]
        assert sum(r.share_ppm for r in rs) <= 1_000_000
