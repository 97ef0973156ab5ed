"""Bigram-LM quality scoring (CCNet architecture): exactness vs a pure
Python reference implementation (same sample, same smoothing, same
micro-nat quantization), plus edge cases — the Spark plan must agree
with the from-scratch computation token for token."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from go_readability_spark.operators.lm_score import UNK, bigram_lm_scores

CORPUS = [
    (0, "the cat sat on the mat and the dog sat on the rug"),
    (1, "the dog ate the bone and the cat ate the fish"),
    (2, "a completely different sentence with rare words entirely"),
    (3, "the the the the the cat cat cat dog dog"),
    (4, "one"),                      # single token: no bigrams, absent
    (5, ""),                         # empty: absent
    (6, "  THE   Cat  SAT  "),       # case/whitespace normalization
    (7, "zebra quark boson lepton"),  # all-OOV bigrams
]


def _md5_prefix(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_reference(corpus, sample_pct=40, min_count=2, salt="lm"):
    toks = {i: t.lower().split() for i, t in corpus}
    train = {i for i in toks if _md5_prefix(f"{salt}:{i}") % 100 < sample_pct}
    uni = Counter(w for i in train for w in toks[i])
    vocab = {w for w, c in uni.items() if c >= min_count}
    V = len(vocab) + 1
    mapped = {i: [w if w in vocab else UNK for w in ws] for i, ws in toks.items()}
    bgc = Counter(
        (ws[j], ws[j + 1]) for i, ws in mapped.items() if i in train
        for j in range(len(ws) - 1)
    )
    ctx = Counter()
    for (w1, _), c in bgc.items():
        ctx[w1] += c
    out = {}
    for i, ws in mapped.items():
        bgs = [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        if not bgs:
            continue
        nll = n_oov = 0
        for bg in bgs:
            c12 = bgc.get(bg, 0)
            if c12 == 0:
                n_oov += 1
            p = (c12 + 1) / (ctx.get(bg[0], 0) + V)
            q = math.log(p) * 1e6
            # round-half-away-from-zero, matching Spark/DuckDB round()
            nll -= int(math.floor(q + 0.5) if q >= 0 else math.ceil(q - 0.5))
        out[i] = (len(bgs), n_oov, nll)
    return out


def test_matches_pure_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.n_oov_bigrams, r.nll_micro)
        for r in bigram_lm_scores(df, min_count=2).collect()
    }
    assert got == _py_reference(CORPUS, min_count=2)


def test_short_docs_absent_and_oov_counted(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_lm_scores(df, min_count=2).collect()}
    assert 4 not in got and 5 not in got
    r7 = got[7]
    # none of doc 7's bigrams can be in the LM (its words are unique and
    # below min_count) — unless the whole doc collapsed to <unk> chains
    assert r7.n_bigrams == 3
    assert r7.nll_micro > 0


def test_deterministic_across_runs(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a = sorted(map(tuple, bigram_lm_scores(df, min_count=2).collect()))
    b = sorted(map(tuple, bigram_lm_scores(df.repartition(7), min_count=2).collect()))
    assert a == b


def test_higher_nll_for_unseen_transitions(spark):
    """With the whole corpus as training data, a doc whose transitions
    were all observed must average a lower per-bigram NLL than one built
    from the same vocabulary in an unseen order (smoothing gives unseen
    bigrams c12=0 < any seen bigram's c12)."""
    # md5("lm:0")%100=44, md5("lm:1")%100=8, md5("lm:11")%100=89 — with
    # sample_pct=50 docs 0/1 train the LM and doc 11 is held out
    corpus = CORPUS[:2] + [(11, "mat the on cat sat the dog on bone the")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in bigram_lm_scores(df, min_count=1, sample_pct=50).collect()
    }
    assert got[11].n_oov_bigrams > 0
    assert (got[0].nll_micro / got[0].n_bigrams
            < got[11].nll_micro / got[11].n_bigrams)
