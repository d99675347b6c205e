"""Driver-contract tests: entry/queries/oracle_sql shape + a sampled oracle
parity check (the full check runs via tools/check_oracle.py)."""

import duckdb
import pytest

import __spark_entry__ as E
from tools.check_oracle import TABLES, canon

SF = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

SAMPLED = [
    "q1_pricing_summary",
    "majority_per_surface_flags",
    "dedup_simhash",
    "doc_fingerprints",
    "events_sessionize",
    "dawid_skene_labels",
    "dedup_embedding_cosine",
]


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "l_returnflag" in df.columns


def test_queries_registry_shape(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # every operator has an oracle except the maintenance/multimodal demos
    # and the explicitly pytest-gated iterative ops (each has its own test
    # module asserting semantics: test_lof, test_calibration, test_hungarian)
    PYTEST_GATED = {
        "mean_distance_lof_scores",
        "calibration_platt_transform",
        "interval_optimal_match",
        # soft Dawid–Skene (tests/test_dawid_skene_soft.py): float EM
        # posteriors — NumPy-twin allclose gated
        "dawid_skene_soft_labels",
        # model zoo / IRT (tests/test_models.py): pyspark.ml LBFGS and the
        # 2PL gradient fit are float-iterative — NumPy-twin/accuracy gated
        "model_zoo_maxent_cv_flags",
        "model_zoo_bow_nb_cv_flags",
        "model_zoo_repeated_probas",
        "irt_2pl_discrimination_flags",
        # model-driven spotters (tests/test_spotter_models.py): tree-
        # ensemble float losses — noise-tracking gated
        "curriculum_spotter_model_scores",
        "leitner_spotter_model_scores",
        # MaxEnt sequence tagger (tests/test_spotter_models.py): LBFGS
        # floats — held-out-accuracy gated
        "model_zoo_token_tagger_cv",
        # MLP + GBT-OvR zoo slots (tests/test_zoo_mlp_gbt.py +
        # test_models.py separable-accuracy parametrization): float fits
        "model_zoo_mlp_flags",
        "model_zoo_gbt_flags",
        # fastText slot (tests/test_models.py bigram-channel separation):
        # L-BFGS floats
        "model_zoo_fasttext_cv_flags",
        # IVF ANN (tests/test_ivf.py): float centroids; recall-gated
        "ann_ivf_topk",
        # PQ ANN (tests/test_pq.py): float codebooks; recall@5-gated
        "ann_pq_topk",
        # IVF-PQ composition (tests/test_pq.py): recall gated ≥ the
        # IVF-L2 ceiling; plan-asserted bounded candidate Exchange
        "ann_ivfpq_topk",
        # CRF tagger (tests/test_crf_tagger.py): parameter-mixing average
        # is no DuckDB one-liner — accuracy/transition/noise-recall gated
        "model_zoo_crf_tagger_cv",
        # BPE merge learning (tests/test_bpe.py): iterative argmax +
        # re-segmentation — full-table equality vs a pure-Python reference
        "bpe_vocab_merges",
        # BPE apply/encode stats (tests/test_bpe.py): consumes the learned
        # merge table — same pure-Python-twin gating as the trainer
        "bpe_tokenize_stats",
    }
    no_oracle = {k for k in qs if k not in oracles} - PYTEST_GATED
    assert all(k.startswith(("maintenance_", "multimodal_")) for k in no_oracle)


@pytest.mark.parametrize("name", SAMPLED)
def test_oracle_parity_sampled(spark, name):
    qs = E.queries()
    sql = E.oracle_sql()[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    sdf = qs[name](spark, SF_ORACLE)
    srows = [r.asDict(recursive=True) for r in sdf.collect()]
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    orows = [dict(zip(cols, row)) for row in rel.fetchall()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(cols)
    assert canon(srows) == canon(orows)
