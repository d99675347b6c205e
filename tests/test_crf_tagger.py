"""CRF-style sequence tagger (structured perceptron + parameter mixing).

Reference parity target: models/tagging/handcrafted_crf_sequence_tagger.py
(linear-chain CRF: emission + transition scores, Viterbi decode). Gates:
out-of-fold accuracy far above majority, structurally valid BIO output
(transitions actually learned), and planted-noise recall on the perceptron
core — the property the reference's model-based detectors are scored on.
"""

import numpy as np
import pandas as pd
import pytest

import nessie_spark.operators.modelzoo as M


def test_crf_tagger_cv_held_out_accuracy(spark):
    """The BIO rule is a deterministic function of (word, prev word) — both
    in the feature window — so out-of-fold accuracy must be near-perfect
    and far above the majority-class baseline."""
    rows = M.model_zoo_crf_tagger_cv(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 10_000
    acc = sum(1 for r in rows if r.pred == r.noisy) / len(rows)
    counts = {}
    for r in rows:
        counts[r.noisy] = counts.get(r.noisy, 0) + 1
    majority = max(counts.values()) / len(rows)
    assert acc > 0.97, (acc, majority)
    assert acc > majority + 0.3

    # transition semantics: a linear-chain decode must never emit I (2)
    # after O (0) — I is only reachable from B/I. An emission-only tagger
    # has no mechanism to guarantee this; the learned transition matrix
    # does. Validate per document in prediction order.
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.pred))
    for doc, seq in by_doc.items():
        seq = [p for _, p in sorted(seq)]
        for prev, cur in zip(seq, seq[1:]):
            assert not (prev == 0 and cur == 2), (doc, seq)
        assert seq[0] != 2, (doc, seq)  # I cannot start a sentence


def _synth_sentences(rng, n_sent, flip_frac):
    """Sentences over a small vocabulary where the BIO rule (len ≥ 5 → B/I)
    holds, with flip_frac of token labels flipped to a wrong class."""
    short = ["a", "on", "the", "cat", "dog", "runs"]
    long_ = ["mountain", "elephant", "crystal", "harbor", "lantern"]
    recs = []
    flipped = set()
    tid = 0
    for s in range(n_sent):
        n = rng.randint(5, 12)
        words, labels = [], []
        prev_long = False
        for i in range(n):
            if rng.rand() < 0.4:
                w = long_[rng.randint(len(long_))]
                lab = 2 if prev_long else 1
                prev_long = True
            else:
                w = short[rng.randint(len(short))]
                lab = 0
                prev_long = False
            words.append(w)
            labels.append(lab)
        for i in range(n):
            lab = labels[i]
            if rng.rand() < flip_frac:
                lab = (lab + 1 + rng.randint(2)) % 3
                flipped.add(tid)
            recs.append((s, i, words[i], lab, 0))
            tid += 1
    pdf = pd.DataFrame(recs, columns=["doc_id", "pos", "word", "label", "shard"])
    return pdf, flipped


def test_crf_perceptron_flags_planted_noise():
    """Core-level planted-noise gate (no Spark): train the averaged
    structured perceptron on 10%-flipped labels; the model generalizes the
    rule from the clean majority, so flags (pred != noisy) must
    concentrate on the flipped tokens."""
    rng = np.random.RandomState(7)
    pdf, flipped = _synth_sentences(rng, n_sent=200, flip_frac=0.10)

    w_em = np.zeros((M.CRF_L, M.CRF_D))
    w_tr = np.zeros((M.CRF_L + 1, M.CRF_L))
    for _ in range(M.CRF_ROUNDS):
        out = M._crf_train_udf(w_em, w_tr)(pdf)
        flat = np.asarray(out["w"].iloc[0])
        w_em = flat[: M.CRF_L * M.CRF_D].reshape(M.CRF_L, M.CRF_D)
        w_tr = flat[M.CRF_L * M.CRF_D:].reshape(M.CRF_L + 1, M.CRF_L)

    dec = M._crf_decode_udf(w_em, w_tr)(pdf)
    dec["tid"] = range(len(dec))  # doc-sorted, same order as pdf build
    flags = set(dec.loc[dec["pred"] != dec["label"], "tid"])
    assert flipped, "fixture must plant noise"
    recall = len(flags & flipped) / len(flipped)
    precision = len(flags & flipped) / max(len(flags), 1)
    assert recall >= 0.6, (recall, precision, len(flags))
    assert precision >= 0.6, (recall, precision, len(flags))


def test_crf_viterbi_prefers_transition_consistent_path():
    """Viterbi must trade emission score for transition score: with a
    strong O→I penalty, a weak I emission after O flips to B."""
    esc = np.array([[0.0, 1.0, 0.0], [0.0, 0.9, 1.0]])  # t0: B, t1: I barely
    tmat = np.zeros((4, 3))
    tmat[0, 2] = -10.0  # O cannot precede I
    path = M._crf_viterbi(esc, tmat)
    assert path.tolist() == [1, 2]  # B then I (B→I allowed)
    esc2 = np.array([[1.0, 0.0, 0.0], [0.0, 0.9, 1.0]])  # t0: O
    path2 = M._crf_viterbi(esc2, tmat)
    assert path2.tolist() == [0, 1]  # I blocked after O → falls to B
