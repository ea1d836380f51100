"""int32 device-counter overflow guards (round-2 VERDICT weak #1).

Device kernels accumulate per-record statistics in int32 (Mosaic v5e
cannot reduce into int64); the reference accumulates u64 throughout
(reference: src/parser/cigar.rs:629-707).  Dispatching callers must
route any record whose per-record totals can reach 2^31 to the int64
host engine.  These tests cross the boundary exactly: a record whose
matched total is 2^31 - 1 must go through the device path bit-exact,
and records past 2^31 must take the host fallback and still come back
in input order with int64-correct values -- without materializing
gigabase column arrays (synthetic op lengths only).
"""

import io

import numpy as np
import pytest

from wgatools_tpu.io.paf import PafReader
from wgatools_tpu.ops.segments import (
    SEG_INS_SIZE,
    SEG_MATCHED,
    cigar_batch_stats,
    pack_cigar_batch,
)
from wgatools_tpu.tools.validate import stream_batch_stats


def _paf_line(i, cg, q_span, t_span, strand="+"):
    qlen = max(q_span, 1) + 10
    tlen = max(t_span, 1) + 10
    return (
        f"q{i}\t{qlen}\t0\t{q_span}\t{strand}\tt{i}\t{tlen}\t0\t{t_span}"
        f"\t{t_span}\t{t_span}\t255\tcg:Z:{cg}"
    )


def test_segment_sums_exact_at_int32_boundary():
    """matched total == 2^31 - 1 stays on the device path and is exact."""
    a, b = 2**30, 2**30 - 1  # a + b == 2^31 - 1
    ops, lens, rows = pack_cigar_batch(
        [np.frombuffer(b"MM", np.uint8), np.frombuffer(b"MI", np.uint8)],
        [np.array([a, b], np.int32), np.array([7, 5], np.int32)],
    )
    out = np.asarray(cigar_batch_stats(ops, lens, rows, 2))
    assert out[0, SEG_MATCHED] == 2**31 - 1  # no wrap at the boundary
    assert out[1, SEG_MATCHED] == 7
    assert out[1, SEG_INS_SIZE] == 5


def test_stream_batch_stats_overflow_host_fallback():
    """Records whose op totals pass 2^31 take the int64 host path; the
    stream keeps input order and every stat matches the host oracle."""
    rows = [
        _paf_line(0, "10M2I3D", 12, 13),
        # 1.5e9 + 0.9e9 = 2.4e9 matched: would wrap int32 to 2.4e9 - 2^32
        _paf_line(1, "1500000000M900000000M5I", 2400000005, 2400000000),
        _paf_line(2, "4M1X2M", 7, 7, strand="-"),
        # exactly at the boundary: must be rejected from the device path
        # (>= 2^31) and still exact
        _paf_line(3, f"{2**31 - 1}M1I", 2**31, 2**31 - 1),
    ]
    data = ("\n".join(rows) + "\n").encode()

    host = [
        (r.query_name, r.get_stat())
        for r in PafReader(io.BytesIO(data)).records()
    ]
    dev = [
        (rec.query_name, rs)
        for rec, rs in stream_batch_stats(
            PafReader(io.BytesIO(data)).records()
        )
    ]
    assert [n for n, _ in host] == [n for n, _ in dev]
    for (_, h), (_, d) in zip(host, dev):
        assert h == d
    # the giant records' matched counts are int64-correct, not wrapped
    assert dev[1][1].matched == 2400000000
    assert dev[3][1].matched == 2**31 - 1


def test_column_batch_overflow_host_fallback(monkeypatch):
    """Column-path dispatch (ops/batch.py): pairs at/above the (patched)
    int32-safe width take the host engine; results are byte-identical to
    the device path on the same inputs and order is preserved."""
    from wgatools_tpu.ops import batch as batch_mod

    pairs = [
        (b"ACGT-ACC", b"ACC-TAC-"),
        (b"ACGTACGTACGTACGT", b"ACGT--GTACGTACGA"),  # >= patched bound
        (b"AC", b"-C"),
    ]
    negatives = [False, True, False]

    want = batch_mod.batch_rec_stats(pairs, negatives)
    monkeypatch.setattr(batch_mod, "INT32_SAFE_COLUMNS", 16)
    got = batch_mod.batch_rec_stats(pairs, negatives)
    assert got == want

    items = [
        (t, q, neg, i) for i, ((t, q), neg) in enumerate(zip(pairs, negatives))
    ]
    got_stream = list(batch_mod.stream_seq_pair_stats(items))
    assert [m for m, _ in got_stream] == [0, 1, 2]
    assert [s for _, s in got_stream] == want


def test_column_stats_rejects_int32_unsafe_width():
    """The kernel dispatch itself refuses rows that could wrap."""
    from wgatools_tpu.ops.classify import column_stats

    class FakeWide:
        shape = (1, 2**31)

    with pytest.raises(AssertionError):
        column_stats(FakeWide(), FakeWide(), np.array([2**31]))
