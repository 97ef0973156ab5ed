"""Sequence-packing operator: exact global prefix sums + span math."""

from __future__ import annotations

import pytest

from go_readability_spark.operators.packing import (
    sequence_manifest,
    with_sequence_spans,
    with_token_offsets,
)

DOCS = [
    # (doc_id, n_tokens) — includes zeros, a giant doc spanning many
    # sequences, and ids far apart (sparse id space)
    (0, 7),
    (1, 0),
    (2, 13),
    (5, 1),
    (9, 250),
    (1000, 3),
    (1001, 64),
    (200000, 5),  # lands in another block at block_size=100k
]


def _df(spark, block_rows=DOCS):
    return spark.createDataFrame(block_rows, "doc_id long, n_tokens long")


def _expected_offsets():
    out, run = {}, 0
    for doc_id, n in sorted(DOCS):
        out[doc_id] = (run, run + n)
        run += n
    return out


@pytest.mark.parametrize("block_size", [1, 3, 100_000])
def test_token_offsets_exact(spark, block_size):
    got = {
        r.doc_id: (r.start_offset, r.end_offset)
        for r in with_token_offsets(_df(spark), block_size=block_size).collect()
    }
    assert got == _expected_offsets()


def test_token_offsets_partitioning_invariant(spark):
    df = _df(spark).repartition(5)
    got = {
        r.doc_id: (r.start_offset, r.end_offset)
        for r in with_token_offsets(df, block_size=2).collect()
    }
    assert got == _expected_offsets()


def test_sequence_spans(spark):
    L = 16
    spans = {
        r.doc_id: (r.first_seq, r.last_seq)
        for r in with_sequence_spans(_df(spark), L).collect()
    }
    exp = _expected_offsets()
    for doc_id, (s, e) in exp.items():
        first, last = spans[doc_id]
        assert first == s // L
        assert last == ((e - 1) // L if e > s else first)
    # the 250-token doc crosses many boundaries
    s, e = exp[9]
    assert spans[9] == (s // L, (e - 1) // L)
    assert spans[9][1] - spans[9][0] >= 250 // L - 1
    # empty doc occupies no tokens but keeps a stable span
    assert spans[1] == (exp[1][0] // L, exp[1][0] // L)


def test_sequence_manifest_reconstructs_exactly(spark):
    L = 16
    rows = sequence_manifest(_df(spark), L).collect()
    exp = _expected_offsets()
    total = sum(n for _, n in DOCS)

    # per-document: slices are contiguous, start at 0, cover all tokens
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.seq_id, r.take_from, r.take_to))
    for doc_id, slices in by_doc.items():
        slices.sort()
        assert slices[0][1] == 0
        assert slices[-1][2] == exp[doc_id][1] - exp[doc_id][0]
        for (_, _, a_to), (_, b_from, _) in zip(slices, slices[1:]):
            assert a_to == b_from
    assert set(by_doc) == {d for d, n in DOCS if n > 0}

    # per-sequence: every sequence except the last is exactly full
    by_seq = {}
    for r in rows:
        by_seq[r.seq_id] = by_seq.get(r.seq_id, 0) + (r.take_to - r.take_from)
    last_seq = max(by_seq)
    for seq_id, n in by_seq.items():
        assert n == L or (seq_id == last_seq and n == total - last_seq * L)
    assert sum(by_seq.values()) == total


def test_packing_validates_args(spark):
    with pytest.raises(ValueError, match="block_size"):
        with_token_offsets(_df(spark), block_size=0)
    with pytest.raises(ValueError, match="seq_len"):
        with_sequence_spans(_df(spark), 0)


def test_packing_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert with_sequence_spans(df, 8).count() == 0
    assert sequence_manifest(df, 8).count() == 0
