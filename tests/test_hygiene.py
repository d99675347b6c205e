"""Hygiene ops: PII true positives + cross-dialect parity, contamination
behavior on planted overlaps."""

import duckdb
import pandas as pd

from nessie_spark.operators import hygiene

PLANTED = [
    (1, "contact me at jane.doe+spam@example.co.uk for details"),
    (2, "server at 10.0.255.3 responded; backup 192.168.1.1 did not"),
    (3, "ssn 123-45-6789 leaked next to id 12-345-678"),
    (4, "clean text with no identifiers at all"),
    (5, "two mails a@b.io c.d@e.org and ip 1.2.3.4"),
]


def test_pii_scrub_true_positives_and_dialect_parity(spark):
    sdf = spark.createDataFrame(PLANTED, "doc_id long, text string")
    clean = hygiene.F.col("text")
    n = hygiene.F.lit(0).cast("long")
    for tag, pat in hygiene._PII_PATTERNS:
        n = n + hygiene.F.size(
            hygiene.F.regexp_extract_all("text", hygiene.F.lit(pat), hygiene.F.lit(0))
        )
        clean = hygiene.F.regexp_replace(clean, pat, tag)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_redactions"])
        for r in sdf.select(
            "doc_id", clean.alias("clean_text"), n.alias("n_redactions")
        ).collect()
    }
    assert got[1][0] == "contact me at <EMAIL> for details" and got[1][1] == 1
    assert got[2][0] == "server at <IP> responded; backup <IP> did not" and got[2][1] == 2
    assert got[3][1] == 1 and "<SSN>" in got[3][0] and "12-345-678" in got[3][0]
    assert got[4] == ("clean text with no identifiers at all", 0)
    assert got[5][1] == 3 and got[5][0].count("<EMAIL>") == 2 and "<IP>" in got[5][0]

    # the DuckDB oracle's RE2 patterns must redact identically (dialect parity)
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(PLANTED, columns=["doc_id", "text"])
    )
    orows = con.execute(hygiene.PII_SCRUB_SQL).fetchall()
    assert {r[0]: (r[1], r[2]) for r in orows} == got


def test_contamination_flags_planted_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, bench_text, "en", "src0", 0),
        (2, bench_text + " extra", "en", "src1", 0),  # near-copy of benchmark
        (3, "one two three four five six seven eight", "en", "src1", 0),
        (4, "tiny doc", "en", "src2", 0),  # < 5 tokens -> no row
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    g = hygiene._doc_grams(sdf)
    bench = (
        g.where(hygiene.F.col("source") == "src0").select("gram").distinct()
        .withColumn("hit", hygiene.F.lit(1))
    )
    train = g.where(hygiene.F.col("source") != "src0")
    rep = {
        r["doc_id"]: r
        for r in train.join(bench, "gram", "left")
        .groupBy("doc_id", "source")
        .agg(
            hygiene.F.count(hygiene.F.lit(1)).alias("n_grams"),
            hygiene.F.coalesce(hygiene.F.sum("hit"), hygiene.F.lit(0))
            .cast("long")
            .alias("n_overlap"),
        )
        .collect()
    }
    # doc 2: 5 grams, 4 of them inside the benchmark doc
    assert rep[2]["n_grams"] == 5 and rep[2]["n_overlap"] == 4
    assert rep[3]["n_overlap"] == 0
    assert 4 not in rep


def test_contamination_fuzzy_flags_near_dup_of_benchmark(spark, tmp_path):
    """A paraphrased (near- but not exact-) copy of a benchmark doc is
    caught with 0.5 <= jaccard < 1; an exact clone scores 1.0; train-train
    near-dups never appear (only bench matches count)."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (1, base, "en", "src0", 0),                                  # benchmark
        (2, base.rsplit(" ", 2)[0] + " changed words", "en", "src1", 0),  # paraphrase
        (3, base, "en", "src2", 0),                                  # exact leak
        (4, "totally unrelated text about engines and parquet files and joins",
         "en", "src1", 0),
        # train-train dup pair, unrelated to the benchmark
        (5, "five six seven eight nine ten eleven twelve thirteen fourteen",
         "en", "src3", 0),
        (6, "five six seven eight nine ten eleven twelve thirteen fourteen",
         "en", "src4", 0),
    ]
    d = str(tmp_path / "fz")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in hygiene.contamination_fuzzy(spark, d).collect()}
    assert set(got) == {2, 3}
    assert got[3].bench_id == 1 and got[3].jaccard == 1.0
    assert got[2].bench_id == 1 and 0.5 <= got[2].jaccard < 1.0
