"""Device liftover_scan + coverage parity tests (ops/liftover.py)."""

import io
import random

import numpy as np
import pytest


def _random_cigar(rng, n_runs):
    ops, lens = [], []
    last = None
    for _ in range(n_runs):
        op = rng.choice([o for o in "MIDX=" if o != last])
        last = op
        ops.append(ord(op))
        lens.append(rng.randint(1, 60))
    return np.array(ops, dtype=np.uint8), np.array(lens, dtype=np.int64)


def test_liftover_scan_matches_host_walk():
    """Per-op offsets must match the sequential coordinate walk
    (update_cov_vec advance rule, reference cigar.rs:710-741)."""
    from wgatools_tpu.ops.liftover import liftover_scan, pack_ops_batch

    rng = random.Random(5)
    op_arrays, len_arrays = [], []
    for _ in range(9):
        o, l = _random_cigar(rng, rng.randint(1, 20))
        op_arrays.append(o)
        len_arrays.append(l)
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    t_off, q_off = liftover_scan(ops, lens)
    t_off, q_off = np.asarray(t_off), np.asarray(q_off)

    for b, (o, l) in enumerate(zip(op_arrays, len_arrays)):
        t = q = 0
        for k, (op, n) in enumerate(zip(o.tolist(), l.tolist())):
            assert t_off[b, k] == t, (b, k)
            assert q_off[b, k] == q, (b, k)
            c = chr(op)
            if c not in "IS":
                t += n
            if c != "D":
                q += n


def test_coverage_span_table_matches_host():
    from wgatools_tpu.ops.liftover import (
        coverage_span_table,
        pack_ops_batch,
    )
    from wgatools_tpu.tools.pafcov import coverage_spans

    rng = random.Random(11)
    op_arrays, len_arrays, starts = [], [], []
    for _ in range(7):
        o, l = _random_cigar(rng, rng.randint(1, 15))
        op_arrays.append(o)
        len_arrays.append(l)
        starts.append(rng.randint(0, 500))
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    s_dev, e_dev = coverage_span_table(
        ops, lens, np.array(starts, dtype=np.int32)
    )
    s_dev, e_dev = np.asarray(s_dev), np.asarray(e_dev)
    for b, (o, l) in enumerate(zip(op_arrays, len_arrays)):
        hs, he = coverage_spans(o, l, starts[b])
        keep = s_dev[b] >= 0
        assert np.array_equal(s_dev[b][keep][: hs.size], hs)
        assert np.array_equal(e_dev[b][keep][: he.size], he)
        assert keep.sum() == hs.size


def test_spans_to_coverage():
    from wgatools_tpu.ops.liftover import spans_to_coverage

    starts = np.array([2, 5, -1, 8], dtype=np.int32)
    ends = np.array([6, 9, -1, 12], dtype=np.int32)
    cov = np.asarray(spans_to_coverage(starts, ends, 10))
    want = np.zeros(10, dtype=np.int32)
    for s, e in [(2, 6), (5, 9), (8, 12)]:
        want[s : min(e, 10)] += 1
    assert np.array_equal(cov, want)


def test_chain_advance_table_matches_host():
    from wgatools_tpu.ops.liftover import chain_advance_table, pack_ops_batch

    rng = random.Random(3)
    o, l = _random_cigar(rng, 25)
    ops, lens = pack_ops_batch([o], [l])
    cum_i, cum_d = chain_advance_table(ops, lens)
    ins = np.where(o == ord("I"), l, 0).cumsum()
    dele = np.where(o == ord("D"), l, 0).cumsum()
    assert np.array_equal(np.asarray(cum_i)[0, : len(o)], ins)
    assert np.array_equal(np.asarray(cum_d)[0, : len(o)], dele)


def test_chain_advance_table_large_lens_exact():
    """Op lengths >= 2^16 (chain gaps/SVs) must not corrupt the
    cumulative tables: chain_advance_table routes through chain_scan
    (exact on every backend) and forwards wide for the jnp/mm fallback
    (ADVICE r3 medium finding)."""
    from wgatools_tpu.ops.liftover import (
        _chain_scan_impl,
        chain_advance_table,
        pack_ops_batch,
    )

    o = np.frombuffer(b"M" + b"ID" * 20 + b"M", dtype=np.uint8)
    l = np.array(
        [100] + [1 << 17, 70000] * 20 + [5], dtype=np.int64
    )  # every indel >= 2^16, totals < 2^31
    ops, lens = pack_ops_batch([o], [l])
    ins = np.where(o == ord("I"), l, 0).cumsum()
    dele = np.where(o == ord("D"), l, 0).cumsum()
    for wide in (False, True):
        cum_i, cum_d = chain_advance_table(ops, lens, wide=wide)
        assert np.array_equal(np.asarray(cum_i)[0, : len(o)], ins), wide
        assert np.array_equal(np.asarray(cum_d)[0, : len(o)], dele), wide
    # the TPU wide fallback (4-limb mm cumsum) directly, since CPU runs
    # never select use_mm on their own
    ex_i, ex_d = _chain_scan_impl(ops, lens.astype(np.int32), True, True)
    adv_i = np.where(o == ord("I"), l, 0)
    adv_d = np.where(o == ord("D"), l, 0)
    assert np.array_equal(
        np.asarray(ex_i)[0, : len(o)] + adv_i, ins
    )
    assert np.array_equal(
        np.asarray(ex_d)[0, : len(o)] + adv_d, dele
    )


def test_pack_ops_words16_rejects_unknown_ops():
    """N/H/corrupt op bytes must raise, not silently pack to the padding
    class (which would advance nothing -- ADVICE r3 low finding)."""
    from wgatools_tpu.ops.liftover import pack_ops_words16

    ops = np.frombuffer(b"M=XN", dtype=np.uint8).reshape(1, 4).copy()
    lens = np.ones((1, 4), dtype=np.int32)
    with pytest.raises(ValueError, match="unsupported op"):
        pack_ops_words16(ops, lens)
    ops[0, 3] = ord("H")
    with pytest.raises(ValueError, match="unsupported op"):
        pack_ops_words16(ops, lens)
    ops[0, 3] = ord("S")  # supported: packs fine
    pack_ops_words16(ops, lens)


def _synth_paf_bytes(n=29, seed=13):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        o, l = _random_cigar(rng, rng.randint(2, 14))
        q_span = int(l[np.isin(o, [ord(c) for c in "MXI="])].sum())
        t_span = int(l[np.isin(o, [ord(c) for c in "MXD="])].sum())
        t_start = rng.randint(0, 200)
        cg = "".join(f"{n_}{chr(c)}" for c, n_ in zip(o.tolist(), l.tolist()))
        rows.append(
            f"q{i}\t3000\t0\t{q_span}\t+\tt{i % 3}\t3000\t{t_start}\t"
            f"{t_start + t_span}\t{t_span}\t{max(q_span, t_span)}\t255"
            f"\tcg:Z:{cg}"
        )
    return ("\n".join(rows) + "\n").encode()


@pytest.mark.parametrize("batch_ops", [1 << 20, 16])
def test_pafcov_device_parity(batch_ops):
    """Device pafcov must be byte-identical to the host path, including
    with tiny flush batches (multi-flush accumulation)."""
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.pafcov import _pafcov_device, pafcov

    data = _synth_paf_bytes()
    host = io.BytesIO()
    pafcov(PafReader(io.BytesIO(data)), host, device=False)
    dev = io.BytesIO()
    _pafcov_device(PafReader(io.BytesIO(data)), dev, batch_ops=batch_ops)
    assert host.getvalue() == dev.getvalue()
    assert host.getvalue()


@pytest.mark.parametrize("wide", [False, True])
def test_cumsum_mm_matches_numpy(wide):
    from wgatools_tpu.ops.liftover import _cumsum_mm

    rng = np.random.default_rng(2)
    for N in (5, 256, 300, 1024):
        x = rng.integers(0, 60, size=(3, N)).astype(np.int32)
        got = np.asarray(_cumsum_mm(x, wide=wide))
        assert np.array_equal(got, np.cumsum(x, axis=1)), (N, wide)


def test_cumsum_mm_wide_exact_on_large_values():
    """Op lengths beyond 2^16 need wide=True; verify the 4-limb path
    stays exact near int32 limits."""
    from wgatools_tpu.ops.liftover import _cumsum_mm

    x = np.full((1, 512), 4_000_000, dtype=np.int32)  # total ~2.05e9 < 2^31
    got = np.asarray(_cumsum_mm(x, wide=True))
    assert np.array_equal(got, np.cumsum(x, axis=1))


def test_liftover_scan_wide_parity():
    from wgatools_tpu.ops.liftover import liftover_scan, pack_ops_batch

    rng = random.Random(8)
    o, l = _random_cigar(rng, 40)
    ops, lens = pack_ops_batch([o], [l])
    a = [np.asarray(v) for v in liftover_scan(ops, lens, wide=False)]
    b = [np.asarray(v) for v in liftover_scan(ops, lens, wide=True)]
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_liftover_pallas_kernel_parity():
    """The fused Pallas scan (interpret mode on CPU) must equal the jnp
    formulation on multi-tile shapes, including cross-tile carries and
    row/column padding."""
    from wgatools_tpu.ops.liftover import (
        _liftover_scan_impl,
        liftover_scan_pallas,
        pack_ops_batch,
    )

    rng = random.Random(21)
    op_arrays, len_arrays = [], []
    for _ in range(11):  # 11 rows -> row padding to 16
        o, l = _random_cigar(rng, rng.randint(1, 700))  # multi 256-col tiles
        op_arrays.append(o)
        len_arrays.append(np.minimum(l * 97, 60000))  # lens near 2^16
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    want_t, want_q = _liftover_scan_impl(ops, lens, False, False)
    got_t, got_q = liftover_scan_pallas(ops, lens, interpret=True)
    assert np.array_equal(np.asarray(got_t), np.asarray(want_t))
    assert np.array_equal(np.asarray(got_q), np.asarray(want_q))


@pytest.mark.parametrize("seed", range(30, 34))
def test_liftover_pallas_kernel_fuzz(seed):
    """Seeded fuzz over the stacked-matmul Pallas scan: random row counts,
    op mixes with S ops, zero-length ops, and single-op rows."""
    from wgatools_tpu.ops.liftover import (
        _liftover_scan_impl,
        liftover_scan_pallas,
        pack_ops_batch,
    )

    rng = random.Random(seed)
    op_arrays, len_arrays = [], []
    for _ in range(rng.randint(1, 13)):
        n = rng.randint(1, 900)
        ops = np.frombuffer(
            bytes(rng.choice(b"M=XIDS") for _ in range(n)), dtype=np.uint8
        )
        lens = np.array(
            [rng.choice((0, 1, 2, 31, 999, 65535)) for _ in range(n)],
            dtype=np.int64,
        )
        op_arrays.append(ops)
        len_arrays.append(lens)
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    want_t, want_q = _liftover_scan_impl(ops, lens, False, False)
    got_t, got_q = liftover_scan_pallas(ops, lens, interpret=True)
    assert np.array_equal(np.asarray(got_t), np.asarray(want_t))
    assert np.array_equal(np.asarray(got_q), np.asarray(want_q))
