"""Source loaders: TSV + CoNLL block parsing, flatten/unflatten round trip
(SURVEY.md §2.1 S1/S2/S4; ragged↔flat EP2 lifecycle)."""

import pyspark.sql.functions as F

from nessie_spark.sources import (
    load_sequence_labeling_conll,
    load_text_classification_tsv,
    write_text_classification_tsv,
)
from nessie_spark.sources.loaders import (
    flatten_sequence_dataset,
    unflatten_sequence_dataset,
)

CONLL = """\
The\tDET\tDET
fox\tNOUN\tNOUN
runs\tVERB\tNOUN

A\tDET\tDET
dog\tNOUN\tNOUN

It\tPRON\tPRON
sleeps\tVERB\tVERB
now\tADV\tADV
"""


def test_tsv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.tsv")
    with open(p, "w") as fh:
        fh.write("hello world\tpos\tneg\nbye now\tneg\tneg\n")
    df = load_text_classification_tsv(spark, p)
    assert df.count() == 2
    assert set(df.columns) == {"instance_id", "text", "gold", "noisy"}
    out = str(tmp_path / "out")
    write_text_classification_tsv(df, out)
    back = load_text_classification_tsv(spark, out)
    assert sorted(r.text for r in back.collect()) == ["bye now", "hello world"]


def test_conll_blocks(spark, tmp_path):
    p = str(tmp_path / "d.conll")
    with open(p, "w") as fh:
        fh.write(CONLL)
    df = load_sequence_labeling_conll(spark, p)
    rows = {tuple(r.tokens): r for r in df.collect()}
    assert len(rows) == 3
    r = rows[("The", "fox", "runs")]
    assert r.gold == ["DET", "NOUN", "VERB"]
    assert r.noisy == ["DET", "NOUN", "NOUN"]
    # per-sentence length invariant (dataloader.py:88-89)
    for r in rows.values():
        assert len(r.tokens) == len(r.gold) == len(r.noisy)


def test_flatten_unflatten_roundtrip(spark, tmp_path):
    p = str(tmp_path / "d.conll")
    with open(p, "w") as fh:
        fh.write(CONLL)
    ragged = load_sequence_labeling_conll(spark, p)
    flat = flatten_sequence_dataset(ragged)
    assert flat.count() == 8  # 3 + 2 + 3 tokens
    # token-level gold-vs-noisy flags (P3)
    n_flags = flat.where(F.col("gold") != F.col("noisy")).count()
    assert n_flags == 1
    back = unflatten_sequence_dataset(flat)
    a = {tuple(r.tokens): (r.gold, r.noisy) for r in ragged.collect()}
    b = {tuple(r.tokens): (r.gold, r.noisy) for r in back.collect()}
    assert a == b
