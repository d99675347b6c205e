"""Connected-component dedup clusters (operators/dedup.py):
min_label_components on adversarial graph shapes, and the end-to-end
dedup_clusters semantics (canonical election, singleton handling)."""

import pyspark.sql.functions as F

from nessie_spark.operators import dedup as D


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.node: r.comp for r in D.min_label_components(df).collect()}


def test_cc_chain_transitivity(spark):
    """A 7-node path: min-label must reach the far end even though the
    endpoints never share an edge (diameter > 1 ⇒ multiple rounds)."""
    got = _cc(spark, [(i, i + 1) for i in range(10, 16)])
    assert got == {i: 10 for i in range(10, 17)}


def test_cc_star_and_separate_components(spark):
    """A star (center NOT the min id), a 2-cycle, and a triangle stay
    three distinct components with the right minima."""
    edges = (
        [(50, j) for j in (7, 51, 52)]      # star centered at 50, min = 7
        + [(100, 101)]                       # pair
        + [(200, 201), (201, 202), (200, 202)]  # triangle
    )
    got = _cc(spark, edges)
    assert got[50] == got[7] == got[51] == got[52] == 7
    assert got[100] == got[101] == 100
    assert got[200] == got[201] == got[202] == 200
    assert len(set(got.values())) == 3


def test_cc_two_chains_merged_by_bridge(spark):
    """Two chains whose label fronts collide mid-way through iteration."""
    edges = [(1, 3), (3, 5), (5, 7), (8, 6), (6, 4), (4, 2), (7, 8)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 8


def test_dedup_clusters_end_to_end(spark, tmp_path):
    """Identical docs cluster with the min doc_id canonical; unrelated
    docs stay singleton canonicals."""
    t1 = "the quick brown fox jumps over the lazy dog again and again today"
    t2 = "completely different words about spark shuffles and parquet files"
    t3 = "yet another unrelated document mentioning neither foxes nor dogs"
    rows = [
        (4, t1, "en", "s", 0), (2, t1, "en", "s", 0), (9, t1, "en", "s", 0),
        (1, t2, "en", "s", 0), (7, t3, "en", "s", 0),
    ]
    d = str(tmp_path / "cc")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in D.dedup_clusters(spark, d).collect()}
    assert [got[i].cluster_id for i in (2, 4, 9)] == [2, 2, 2]
    assert got[2].is_canonical and not got[4].is_canonical and not got[9].is_canonical
    assert got[1].cluster_id == 1 and got[1].is_canonical
    assert got[7].cluster_id == 7 and got[7].is_canonical


def test_embedding_clusters_refine_direct_canon(spark):
    """Transitive-closure consistency: any two vectors the direct-neighbor
    canon assignment collapses (canon_id) must land in the same connected
    component, and cluster minima are canonical."""
    sf = "/root/testdata/sf0.001"
    canon = {r.vec_id: r.canon_id for r in D.dedup_embedding_cosine(spark, sf).collect()}
    clus = {r.vec_id: r.cluster_id for r in D.dedup_embedding_clusters(spark, sf).collect()}
    assert set(canon) == set(clus)
    for v, c in canon.items():
        assert clus[v] == clus[c], (v, c)
        assert clus[v] <= c  # component min never exceeds the direct min


def test_keep_best_policy_longest_wins(spark, tmp_path):
    """dedup_keep_best keeps exactly one doc per near-dup cluster — the
    one with max n_chars (doc_id ascending breaks ties) — and singletons
    keep themselves."""
    t1 = "the quick brown fox jumps over the lazy dog again and again today"
    t2 = "completely different words about spark shuffles and parquet files"
    rows = [
        # cluster {2,4,9}: identical text, doc 4 is the longest copy
        (4, t1, "en", "s", 30), (2, t1, "en", "s", 10), (9, t1, "en", "s", 20),
        # tie cluster {11,12}: equal n_chars → lower doc_id wins
        (12, t2, "en", "s", 15), (11, t2, "en", "s", 15),
        # singleton
        (7, "yet another unrelated document mentioning neither foxes nor dogs",
         "en", "s", 5),
    ]
    d = str(tmp_path / "kb")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in D.dedup_keep_best(spark, d).collect()}
    assert len(got) == 6
    assert [got[i].cluster_id for i in (2, 4, 9)] == [2, 2, 2]
    assert got[4].keep and not got[2].keep and not got[9].keep  # longest, not min id
    assert got[11].keep and not got[12].keep                    # tie → lower id
    assert got[7].keep                                          # singleton
    # exactly one keeper per cluster
    keepers = [r for r in got.values() if r.keep]
    assert len({r.cluster_id for r in keepers}) == len(keepers) == 3


def test_dup_ngram_coverage_partial_and_full_overlap(spark, tmp_path):
    """Cross-doc duplicated-span coverage: a shared 8-token prefix marks
    exactly its 4 five-gram windows as duplicated in each doc; exact
    copies score 1.0; unique docs 0.0; sub-5-token docs have no
    positions and a NULL fraction."""
    shared = "a b c d e f g h"
    rows = [
        (1, shared + " u1 u2 u3", "en", "s", 0),       # 7 pos, 4 dup
        (2, shared + " v1 v2 v3 v4", "en", "s", 0),    # 8 pos, 4 dup
        (3, "q w e r t y p s k j m n", "en", "s", 0),  # 8 pos, 0 dup
        (4, "copy copy one two three four five", "en", "s", 0),
        (5, "copy copy one two three four five", "en", "s", 0),
        (6, "x y z", "en", "s", 0),                    # < 5 tokens
    ]
    d = str(tmp_path / "cov")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in D.dup_ngram_coverage(spark, d).collect()}
    assert len(got) == 6
    assert (got[1].n_positions, got[1].n_dup_positions, got[1].flagged) == (7, 4, True)
    assert (got[2].n_positions, got[2].n_dup_positions, got[2].flagged) == (8, 4, True)
    assert (got[3].n_dup_positions, got[3].flagged) == (0, False)
    assert got[4].dup_frac == 1.0 and got[4].flagged and got[5].dup_frac == 1.0
    assert (got[6].n_positions, got[6].dup_frac, got[6].flagged) == (0, None, False)


def test_incremental_bloom_flags_new_near_copy_of_history(spark, tmp_path):
    """A new-batch doc (doc_id % 5 == 0) sharing most grams with a
    historical doc is flagged; a genuinely fresh doc sits at the bloom's
    FP floor; a sub-5-token doc has no grams and a NULL fraction."""
    hist = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron")
    rows = [
        (1, hist, "en", "s", 0),                       # history (1 % 5 != 0)
        (2, "one two three four six seven eight nine eleven twelve", "en", "s", 0),
        (5, hist + " changed tail", "en", "s", 0),     # new, near-copy
        (10, "totally fresh words nobody wrote before anywhere here today now",
         "en", "s", 0),                                # new, clean
        (15, "too few words", "en", "s", 0),           # new, < 5 tokens
    ]
    d = str(tmp_path / "ib")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in D.dedup_incremental_bloom(spark, d).collect()}
    assert set(got) == {5, 10, 15}  # only the new batch is screened
    assert got[5].flagged and got[5].seen_frac > 0.5
    assert not got[10].flagged
    assert (got[15].n_grams, got[15].seen_frac, got[15].flagged) == (0, None, False)


def test_cc_distributed_path_matches_driver_union_find(spark):
    """The distributed hop+halving loop and the driver union-find gate
    produce identical labels on a worst-case chain (diameter 39), a star,
    and a bridge — and the distributed loop converges within its 32-round
    halving budget on the long chain."""
    edges = [(i, i + 1) for i in range(40)]               # chain 0..40
    edges += [(100, x) for x in (101, 102, 103)]          # star
    edges += [(200, 201), (201, 202), (202, 200)]         # triangle
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    drv = {r.node: r.comp for r in D.min_label_components(pairs).collect()}
    dist = {r.node: r.comp
            for r in D.min_label_components(pairs, driver_max_edges=0).collect()}
    assert drv == dist
    assert all(drv[i] == 0 for i in range(41))
    assert all(drv[x] == 100 for x in (100, 101, 102, 103))
    assert all(drv[x] == 200 for x in (200, 201, 202))


def test_dup_span_removal_cuts_covered_tokens_only(spark, tmp_path):
    """The transform twin of the coverage signal: a shared 8-token prefix
    is cut from both docs (all 8 positions sit under a duplicated 5-gram
    window), the unique tails survive verbatim, exact copies empty out,
    unique and sub-5-token docs pass through untouched."""
    shared = "a b c d e f g h"
    rows = [
        (1, shared + " u1 u2 u3", "en", "s", 0),
        (2, shared + " v1 v2 v3 v4", "en", "s", 0),
        (3, "q w e r t y p s k j m n", "en", "s", 0),
        (4, "copy copy one two three four five", "en", "s", 0),
        (5, "copy copy one two three four five", "en", "s", 0),
        (6, "x y z", "en", "s", 0),
    ]
    d = str(tmp_path / "spanrm")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in D.dup_span_removal(spark, d).collect()}
    assert len(got) == 6
    assert (got[1].n_tokens, got[1].n_removed, got[1].cleaned_text) == (
        11, 8, "u1 u2 u3"
    )
    assert (got[2].n_tokens, got[2].n_removed, got[2].cleaned_text) == (
        12, 8, "v1 v2 v3 v4"
    )
    assert got[3].n_removed == 0 and got[3].cleaned_text == rows[2][1]
    assert got[4].cleaned_text == "" and got[4].n_removed == 7
    assert got[5].cleaned_text == "" and got[5].n_removed == 7
    assert got[6].n_removed == 0 and got[6].cleaned_text == "x y z"


def test_dedup_soft_weights_planted(spark, tmp_path):
    """Soft dedup: a 3-copy cluster carries weight_ppm = 333333 per copy
    (Σ ≈ 1e6 per content), singletons keep the full 1e6."""
    t1 = "the quick brown fox jumps over the lazy dog again and again today"
    t2 = "completely different words about spark shuffles and parquet files"
    rows = [
        (4, t1, "en", "s", 0), (2, t1, "en", "s", 0), (9, t1, "en", "s", 0),
        (1, t2, "en", "s", 0),
    ]
    d = str(tmp_path / "soft")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in D.dedup_soft_weights(spark, d).collect()}
    assert len(got) == 4
    for i in (2, 4, 9):
        assert got[i].cluster_id == 2
        assert got[i].cluster_size == 3 and got[i].weight_ppm == 333333
    assert got[1].cluster_size == 1 and got[1].weight_ppm == 1_000_000
    # per-cluster weight mass never exceeds 1e6
    assert sum(got[i].weight_ppm for i in (2, 4, 9)) <= 1_000_000
