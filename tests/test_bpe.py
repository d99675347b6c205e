"""Distributed BPE tokenizer training (operators/curation.bpe_vocab_merges):
the merge table must equal a pure-Python reference implementation of
Sennrich et al. 2016 (count pairs weighted by word freq, merge the argmax
greedily left-to-right, count-desc / lexicographic tie-break) — on planted
corpora that force ties and overlap chains, and on real testdata."""

import collections
import decimal
import re

import duckdb

from nessie_spark.operators import curation as C

_WS = re.compile(r"[ \t\n\f\r]+")


def _ref_bpe(texts: list[str], m: int) -> list[tuple]:
    wf = collections.Counter()
    for t in texts:
        for w in _WS.split(t.strip()):
            if w:
                wf[w] += 1
    seqs = [[list(w) + ["</w>"], f] for w, f in sorted(wf.items())]
    merges = []
    for rank in range(m):
        pc = collections.Counter()
        for s, f in seqs:
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, a + b, cnt))
        for s, _ in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s[:] = out
    return merges


def _write_docs(spark, d, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")


def _got(spark, d):
    return [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in C.bpe_vocab_merges(spark, d).collect()
    ]


def test_bpe_matches_reference_on_planted_corpus(spark, tmp_path):
    """Overlap chains (aaaa), repeated-merge symbols (low/lower/lowest:
    'lo' then 'low' merging a previously merged symbol), and count ties
    broken lexicographically — the classic Sennrich worked example."""
    texts = [
        "low low low low low lower lower newest newest",
        "newest newest newest newest widest widest widest",
        "aaaa aaaa baab",
    ]
    want = _ref_bpe(texts, C.BPE_MERGES)
    d = str(tmp_path / "bpe1")
    _write_docs(spark, d, texts)
    assert _got(spark, d) == want


def test_bpe_tie_break_is_lexicographic(spark, tmp_path):
    """'xy' and 'pq' tie on count: the lexicographically smaller pair
    must win every round, on both engines."""
    texts = ["xy xy pq pq"]
    want = _ref_bpe(texts, C.BPE_MERGES)
    d = str(tmp_path / "bpe2")
    _write_docs(spark, d, texts)
    got = _got(spark, d)
    assert got == want
    # the round-1 winner is the lexicographically smaller of the tied pairs
    assert got[0][1:3] == ("p", "q")


def test_bpe_matches_reference_on_testdata(spark):
    """Full-table equality against the Python reference on the real
    sf0.001 documents table (the corpus the rows-only gate runs on)."""
    sf = "/root/testdata/sf0.001"
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf}/documents.parquet'"
        ).fetchall()
    ]
    assert _got(spark, sf) == _ref_bpe(texts, C.BPE_MERGES)


def _ref_encode_counts(texts: list[str], m: int) -> dict[int, tuple]:
    """Pure-Python twin of bpe_tokenize_stats: per-doc (n_words, n_tokens,
    chars_per_token) after applying the trained merges."""
    merges = [(a, b) for _, a, b, _, _ in _ref_bpe(texts, m)]
    enc: dict[str, int] = {}

    def n_tok(w):
        if w not in enc:
            s = list(w) + ["</w>"]
            for a, b in merges:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            enc[w] = len(s)
        return enc[w]

    out = {}
    for i, t in enumerate(texts):
        ws = [w for w in _WS.split(t.strip()) if w]
        toks = sum(n_tok(w) for w in ws)
        chars = sum(len(w) for w in ws)
        # Spark F.round is HALF_UP over the double's shortest decimal
        # repr (BigDecimal.valueOf); Python round is banker's — mirror
        # Spark exactly
        cpt = (
            float(
                decimal.Decimal(repr(chars / toks)).quantize(
                    decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
                )
            )
            if toks
            else None
        )
        out[i] = (len(ws), toks, cpt)
    return out


def test_bpe_apply_matches_reference(spark, tmp_path):
    texts = [
        "low low low low low lower lower newest newest",
        "newest newest newest newest widest widest widest",
        "aaaa aaaa baab",
        "low",
    ]
    d = str(tmp_path / "bpe3")
    _write_docs(spark, d, texts)
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.chars_per_token)
        for r in C.bpe_tokenize_stats(spark, d).collect()
    }
    assert got == _ref_encode_counts(texts, C.BPE_MERGES)


def test_bpe_apply_matches_reference_on_testdata(spark):
    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    texts = [t for _, t in rows]
    want = _ref_encode_counts(texts, C.BPE_MERGES)
    # re-key the reference by the real doc_id
    want = {rows[i][0]: v for i, v in want.items()}
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.chars_per_token)
        for r in C.bpe_tokenize_stats(spark, sf).collect()
    }
    assert got == want
