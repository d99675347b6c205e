"""Corpus diagnostics: langid confusion, sentence dedup, novelty, norms.

Tiny hand-checkable fixtures; the oracle gate separately proves
engine-vs-DuckDB equality at sf0.01."""

from nessie_spark.operators.corpus import (
    embedding_norm_outliers,
    langid_confusion,
    ngram_novelty,
    sentence_dup_stats,
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


def test_langid_confusion_cells(spark, tmp_path):
    _write(
        spark, tmp_path, "documents",
        [
            (0, "the cat is on the mat and happy", "en"),  # en → en
            (1, "der hund und die katze ist da", "de"),    # de → de
            (2, "el perro es grande y la casa", "es"),     # es → es
            (3, "the der el counts tie here", "en"),       # 1-1-1 tie → en (order)
        ],
        "doc_id long, text string, lang string",
    )
    rows = {(r.lang, r.pred_lang): r for r in langid_confusion(spark, str(tmp_path)).collect()}
    assert rows[("en", "en")].n == 2
    assert rows[("de", "de")].n == 1
    assert rows[("es", "es")].n == 1
    assert rows[("en", "en")].frac_of_true == 1.0


def test_sentence_dup_flags_cross_doc_only(spark, tmp_path):
    boiler = "this exact boilerplate sentence repeats across documents"
    _write(
        spark, tmp_path, "documents",
        [
            (0, f"{boiler}. a unique first sentence of substance here."),
            (1, f"{boiler}. another unique sentence of real substance."),
            # repeated within ONE doc only → not corpus-duplicated
            (2, "twice in this document but nowhere else. "
                "twice in this document but nowhere else."),
            (3, "short. tiny."),  # all units under the 20-char floor
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in sentence_dup_stats(spark, str(tmp_path)).collect()}
    assert got[0].n_sents == 2 and got[0].n_dup_sents == 1
    assert got[0].dup_frac == 0.5
    assert got[1].n_dup_sents == 1
    assert got[2].n_sents == 1 and got[2].n_dup_sents == 0
    assert got[3].n_sents == 0 and got[3].dup_frac == 0.0


def test_ngram_novelty_counts_first_occurrence(spark, tmp_path):
    # doc 0 contributes its trigram; doc 9 repeats it (not new) and adds one
    _write(
        spark, tmp_path, "documents",
        [
            (0, "alpha beta gamma"),
            (9, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    rows = {r.bucket: r for r in ngram_novelty(spark, str(tmp_path)).collect()}
    # max_id=9 → doc 0 lands in bucket 0, doc 9 in bucket 90
    assert rows[0].new_grams == 1
    assert rows[90].new_grams == 1  # "beta gamma delta"; "alpha beta gamma" is old
    assert rows[90].cum_vocab == 2


def test_embedding_norm_outlier_flags_extreme(spark, tmp_path):
    rows = [(i, [1.0, 0.0]) for i in range(20)] + [(99, [50.0, 0.0])]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in embedding_norm_outliers(spark, str(tmp_path)).collect()}
    assert got[99].is_outlier and got[99].norm == 50.0
    assert not got[0].is_outlier and got[0].norm == 1.0


def test_winnowing_guarantee_and_density(spark, tmp_path):
    from nessie_spark.operators.corpus import (
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )

    shared = "a common run of words that is quite long indeed here"
    rows = [
        (0, shared + " plus unique tail zero zebra quill jocks"),
        (1, shared + " with another different ending vexed whomp"),
        (2, "entirely unrelated content nothing matches xylophone"),
        (3, "zz"),  # shorter than one gram → zero fingerprints
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    fp = {r.doc_id: r for r in winnowing_fingerprints(spark, str(tmp_path)).collect()}
    assert fp[3].n_fingerprints == 0 and fp[3].density == 0.0
    # winnowing guarantee: ~2/(w+1) density, never more than 1 per window
    assert 0 < fp[0].density < 1
    pairs = {(r.id_a, r.id_b): r.n_shared
             for r in winnowing_overlap_pairs(spark, str(tmp_path)).collect()}
    # the 50-char shared run guarantees many shared fingerprints for (0,1)
    assert pairs.get((0, 1), 0) >= 3
    assert all(k == (0, 1) for k in pairs)
