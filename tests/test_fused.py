"""Fused classify+liftover kernel parity (ops/fused.py, round 3).

Every variant -- mm scans (full triangle + two-level chunks), the vpu
Hillis ladder, and the packed op-word path -- must be bit-identical to
the jnp references (classify_stat_jnp + _liftover_scan_impl) across
ragged batches, caller mode, and mismatched row counts.
"""

import numpy as np
import pytest

from wgatools_tpu.ops.classify import classify_stat_jnp
from wgatools_tpu.ops.fused import classify_liftover_fused
from wgatools_tpu.ops.liftover import (
    _liftover_scan_impl,
    pack_ops_batch,
    pack_ops_words,
)


def _case(rng, B, L, B2, n_ops_max):
    import jax.numpy as jnp

    alpha = np.frombuffer(b"ACGT-", np.uint8)
    t = np.full((B, L), ord("-"), np.uint8)
    q = np.full((B, L), ord("-"), np.uint8)
    lengths = rng.integers(1, L + 1, size=B).astype(np.int32)
    lengths[0] = L
    for b in range(B):
        t[b, : lengths[b]] = alpha[rng.integers(0, 5, lengths[b])]
        q[b, : lengths[b]] = alpha[rng.integers(0, 5, lengths[b])]
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    op_arrays, len_arrays = [], []
    for _ in range(B2):
        n = int(rng.integers(1, n_ops_max))
        op_arrays.append(op_chars[rng.integers(0, 6, n)])
        len_arrays.append(rng.integers(0, 60000, n).astype(np.int32))
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    return (
        jnp.asarray(t.view("<i4")),
        jnp.asarray(q.view("<i4")),
        jnp.asarray(t),
        jnp.asarray(q),
        jnp.asarray(lengths),
        jnp.asarray(ops),
        jnp.asarray(lens),
    )


@pytest.mark.parametrize(
    "mode,chunk,packed",
    [
        ("mm", None, False),
        ("mm", 128, False),
        ("vpu", None, False),
        ("vpu", None, True),
    ],
)
@pytest.mark.parametrize("caller", [False, True])
def test_fused_parity(mode, chunk, packed, caller):
    rng = np.random.default_rng(42)
    tw, qw, t, q, lengths, ops, lens = _case(rng, 5, 2048, 7, 300)
    want_stats = np.asarray(classify_stat_jnp(t, q, lengths, caller=caller))
    want_t, want_q = (
        np.asarray(a) for a in _liftover_scan_impl(ops, lens, False, False)
    )
    if packed:
        opw = pack_ops_words(np.asarray(ops), np.asarray(lens))
        import jax.numpy as jnp

        args = (tw, qw, lengths, jnp.asarray(opw), None)
    else:
        args = (tw, qw, lengths, ops, lens)
    stats, t_off, q_off = classify_liftover_fused(
        *args,
        tile_lw=256,
        tile_lo=256,
        scan_chunk=chunk,
        scan_mode=mode,
        interpret=True,
        caller=caller,
    )
    assert np.array_equal(np.asarray(stats), want_stats)
    assert np.array_equal(np.asarray(t_off), want_t)
    assert np.array_equal(np.asarray(q_off), want_q)


def test_pack_ops_words_roundtrip():
    rng = np.random.default_rng(0)
    ops = np.frombuffer(b"M=XID" * 20, np.uint8).reshape(4, 25)
    lens = rng.integers(0, 65536, size=(4, 25)).astype(np.int32)
    w = pack_ops_words(ops, lens)
    assert np.array_equal((w >> 24) & 0xFF, ops)
    assert np.array_equal(w & 0xFFFF, lens)
    # explicit ValueError (assert would be stripped under python -O)
    with pytest.raises(ValueError):
        pack_ops_words(ops, lens + 0x10000)


@pytest.mark.parametrize("caller", [False, True])
def test_fused16_parity(caller):
    """16-bit packed path (two ops/word, half-width ladder, even/odd
    offset halves) must match the jnp references bit-for-bit."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.fused import classify_liftover_fused16
    from wgatools_tpu.ops.liftover import interleave_halves, pack_ops_words16

    rng = np.random.default_rng(7)
    tw, qw, t, q, lengths, _, _ = _case(rng, 5, 2048, 1, 2)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    op_arrays, len_arrays = [], []
    for _ in range(7):
        n = int(rng.integers(1, 300))
        op_arrays.append(op_chars[rng.integers(0, 6, n)])
        len_arrays.append(rng.integers(0, 8192, n).astype(np.int32))
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    opw16 = jnp.asarray(pack_ops_words16(ops, lens))

    want_stats = np.asarray(classify_stat_jnp(t, q, lengths, caller=caller))
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), False, False
        )
    )
    stats, te, to, qe, qo = classify_liftover_fused16(
        tw, qw, lengths, opw16,
        tile_b=4, tile_lw=256, interpret=True, caller=caller,
    )
    assert np.array_equal(np.asarray(stats), want_stats)
    got_t = interleave_halves(te, to)[:, : ops.shape[1]]
    got_q = interleave_halves(qe, qo)[:, : ops.shape[1]]
    assert np.array_equal(got_t, want_t)
    assert np.array_equal(got_q, want_q)


@pytest.mark.parametrize("nibble", [False, True])
def test_fused16_scan_mm_parity(nibble):
    """The MXU triangle-matmul scan mode (scan_mode="mm") must be
    bit-identical to the VPU ladder: 2-limb bf16 decomposition is exact
    for packed16 pair sums < 2^14 (limbs <= 255 are bf16-exact,
    within-tile partial sums < 2^24 are f32-exact)."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.classify import pack_nibble_words
    from wgatools_tpu.ops.fused import classify_liftover_fused16
    from wgatools_tpu.ops.liftover import pack_ops_words16

    rng = np.random.default_rng(21)
    _, _, t, q, lengths, _, _ = _case(rng, 5, 2048, 1, 2)
    if nibble:
        tw, qw = (
            jnp.asarray(a)
            for a in pack_nibble_words(np.asarray(t), np.asarray(q))
        )
    else:
        tw = jnp.asarray(np.asarray(t).view("<i4"))
        qw = jnp.asarray(np.asarray(q).view("<i4"))
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    op_arrays, len_arrays = [], []
    for _ in range(7):
        n = int(rng.integers(1, 300))
        op_arrays.append(op_chars[rng.integers(0, 6, n)])
        # hit the 8191 length bound explicitly
        ls = rng.integers(0, 8192, n).astype(np.int32)
        ls[0] = 8191
        len_arrays.append(ls)
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    opw16 = jnp.asarray(pack_ops_words16(ops, lens))

    kw = dict(tile_b=4, tile_lw=128 if nibble else 256, interpret=True,
              nibble=nibble)
    a = classify_liftover_fused16(tw, qw, lengths, opw16,
                                  scan_mode="vpu", **kw)
    b = classify_liftover_fused16(tw, qw, lengths, opw16,
                                  scan_mode="mm", **kw)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("scan_mode", ["vpu", "mm"])
@pytest.mark.parametrize("caller", [False, True])
def test_fused_adv16_parity(caller, scan_mode):
    """Advance-packed path (pack_ops_adv16: host-side class decode,
    kernel does two shift/mask ops per direction) must match the jnp
    references bit-for-bit in both scan modes."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.fused import classify_liftover_fused_adv16
    from wgatools_tpu.ops.liftover import interleave_halves, pack_ops_adv16

    rng = np.random.default_rng(13)
    tw, qw, t, q, lengths, _, _ = _case(rng, 5, 2048, 1, 2)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    op_arrays, len_arrays = [], []
    for _ in range(7):
        n = int(rng.integers(1, 300))
        op_arrays.append(op_chars[rng.integers(0, 6, n)])
        ls = rng.integers(0, 8192, n).astype(np.int32)
        ls[0] = 8191
        len_arrays.append(ls)
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    wt, wq = (jnp.asarray(a) for a in pack_ops_adv16(ops, lens))

    want_stats = np.asarray(classify_stat_jnp(t, q, lengths, caller=caller))
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), False, False
        )
    )
    stats, te, to, qe, qo = classify_liftover_fused_adv16(
        tw, qw, lengths, wt, wq,
        tile_b=4, tile_lw=256, interpret=True, caller=caller,
        scan_mode=scan_mode,
    )
    assert np.array_equal(np.asarray(stats), want_stats)
    got_t = interleave_halves(te, to)[:, : ops.shape[1]]
    got_q = interleave_halves(qe, qo)[:, : ops.shape[1]]
    assert np.array_equal(got_t, want_t)
    assert np.array_equal(got_q, want_q)


def test_pack_ops_adv16_bounds():
    from wgatools_tpu.ops.liftover import pack_ops_adv16

    ops = np.frombuffer(b"MIDS=X", np.uint8).reshape(1, 6)
    lens = np.array([[1, 8191, 0, 5, 7, 2]], np.int32)
    wt, wq = pack_ops_adv16(ops, lens)
    assert wt.shape == (1, 3) and wq.shape == (1, 3)
    # M pair (1, I 8191): target advances 1 on even, pair sum 1
    assert wt[0, 0] == (1 << 14) | 1
    # query advances on M and I: even 1, pair sum 8192
    assert wq[0, 0] == (1 << 14) | 8192
    # explicit ValueError (not a -O-strippable assert, round-4 advisor)
    with pytest.raises(ValueError, match="len < 8192"):
        pack_ops_adv16(ops, lens + 8192)
    with pytest.raises(ValueError):
        pack_ops_adv16(np.frombuffer(b"NH", np.uint8).reshape(1, 2),
                       np.array([[1, 2]], np.int32))


def test_pack_ops_words16_bounds():
    from wgatools_tpu.ops.liftover import pack_ops_words16

    ops = np.frombuffer(b"MIDS=X", np.uint8).reshape(1, 6)
    lens = np.array([[1, 8191, 0, 5, 7, 2]], np.int32)
    w = pack_ops_words16(ops, lens)
    assert w.shape == (1, 3)
    with pytest.raises(ValueError, match="len < 8192"):
        pack_ops_words16(ops, lens + 8192)


def test_fused16_row_mismatch_and_multiblock():
    """fused16 with B2 != B and multiple row blocks (nb > 1): offsets and
    stats stay exact."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.fused import classify_liftover_fused16
    from wgatools_tpu.ops.liftover import interleave_halves, pack_ops_words16

    rng = np.random.default_rng(9)
    tw, qw, t, q, lengths, _, _ = _case(rng, 9, 1024, 1, 2)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    op_arrays = [op_chars[rng.integers(0, 6, 77)] for _ in range(3)]
    len_arrays = [rng.integers(0, 8192, 77).astype(np.int32) for _ in range(3)]
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    opw16 = jnp.asarray(pack_ops_words16(ops, lens))

    want_stats = np.asarray(classify_stat_jnp(t, q, lengths))
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), False, False
        )
    )
    # tile_b=2 -> nb = ceil(9/2)=5 row blocks; op rows pad from 3
    stats, te, to, qe, qo = classify_liftover_fused16(
        tw, qw, lengths, opw16, tile_b=2, tile_lw=128, interpret=True
    )
    assert np.array_equal(np.asarray(stats), want_stats)
    assert np.array_equal(
        interleave_halves(te, to)[:, : ops.shape[1]], want_t
    )
    assert np.array_equal(
        interleave_halves(qe, qo)[:, : ops.shape[1]], want_q
    )


def test_fused16_odd_op_count_and_empty_rows():
    import jax.numpy as jnp

    from wgatools_tpu.ops.fused import classify_liftover_fused16
    from wgatools_tpu.ops.liftover import interleave_halves, pack_ops_words16

    rng = np.random.default_rng(3)
    tw, qw, t, q, lengths, _, _ = _case(rng, 2, 512, 1, 2)
    # odd op counts (pack pads to even) and an all-padding row
    ops = np.zeros((2, 5), np.uint8)
    lens = np.zeros((2, 5), np.int32)
    ops[0] = np.frombuffer(b"M=IDM", np.uint8)
    lens[0] = [3, 4, 5, 6, 7]
    opw16 = jnp.asarray(pack_ops_words16(ops, lens))
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), False, False
        )
    )
    stats, te, to, qe, qo = classify_liftover_fused16(
        tw, qw, lengths, opw16, tile_b=2, tile_lw=128, interpret=True
    )
    got_t = interleave_halves(te, to)[:, :5]
    got_q = interleave_halves(qe, qo)[:, :5]
    assert np.array_equal(got_t, want_t)
    assert np.array_equal(got_q, want_q)
    assert np.array_equal(
        np.asarray(stats), np.asarray(classify_stat_jnp(t, q, lengths))
    )


def test_sharded_fused16_matches_direct():
    """The flagship fused16 kernel through shard_map on the 8-device
    virtual mesh must reproduce the direct call exactly (record-axis
    data parallelism, no collectives)."""
    import jax
    import jax.numpy as jnp

    from wgatools_tpu.ops.fused import classify_liftover_fused16
    from wgatools_tpu.ops.liftover import pack_ops_words16
    from wgatools_tpu.parallel.mesh import make_mesh, sharded_fused16

    rng = np.random.default_rng(5)
    B = 16  # 2 records per device
    tw, qw, t, q, lengths, _, _ = _case(rng, B, 1024, 1, 2)
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    op_arrays = [op_chars[rng.integers(0, 5, 50)] for _ in range(B)]
    len_arrays = [rng.integers(0, 4000, 50).astype(np.int32) for _ in range(B)]
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    opw16 = jnp.asarray(pack_ops_words16(ops, lens))

    direct = classify_liftover_fused16(
        tw, qw, lengths, opw16, tile_b=2, tile_lw=256, interpret=True
    )
    mesh = make_mesh(8)
    sharded = sharded_fused16(mesh, tw, qw, lengths, opw16)
    for d, s in zip(direct, sharded):
        assert np.array_equal(np.asarray(d), np.asarray(s))

    # and zero collective bytes: pure record-axis data parallelism
    from test_comm_volume import _collective_bytes

    jaxpr = jax.make_jaxpr(
        lambda a, b, l, o: sharded_fused16(mesh, a, b, l, o)
    )(tw, qw, lengths, opw16)
    assert _collective_bytes(jaxpr.jaxpr) == 0


@pytest.mark.parametrize("caller", [False, True])
def test_fused16_nibble_parity(caller):
    """Nibble-plane fused16 (4-bit dictionary classify + packed16 scan)
    must match the byte-plane jnp references bit-for-bit, including
    padded rows and the edge corrections."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.classify import pack_nibble_words
    from wgatools_tpu.ops.fused import classify_liftover_fused16
    from wgatools_tpu.ops.liftover import interleave_halves, pack_ops_words16

    rng = np.random.default_rng(17)
    _, _, t, q, lengths, _, _ = _case(rng, 9, 2048, 1, 2)
    tn, qn = pack_nibble_words(np.asarray(t), np.asarray(q))
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    op_arrays, len_arrays = [], []
    for _ in range(6):
        n = int(rng.integers(1, 300))
        op_arrays.append(op_chars[rng.integers(0, 6, n)])
        len_arrays.append(rng.integers(0, 8192, n).astype(np.int32))
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    opw16 = jnp.asarray(pack_ops_words16(ops, lens))

    want_stats = np.asarray(classify_stat_jnp(t, q, lengths, caller=caller))
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), False, False
        )
    )
    stats, te, to, qe, qo = classify_liftover_fused16(
        jnp.asarray(tn), jnp.asarray(qn), lengths, opw16,
        tile_b=4, tile_lw=128, interpret=True, caller=caller, nibble=True,
    )
    assert np.array_equal(np.asarray(stats), want_stats)
    got_t = interleave_halves(te, to)[:, : ops.shape[1]]
    got_q = interleave_halves(qe, qo)[:, : ops.shape[1]]
    assert np.array_equal(got_t, want_t)
    assert np.array_equal(got_q, want_q)


def test_fused16_nibble_vs_words_identical():
    """The nibble and byte-word fused16 forms of the SAME batch must
    agree exactly (the packing is a bijection on its domain)."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.classify import pack_nibble_words
    from wgatools_tpu.ops.fused import classify_liftover_fused16
    from wgatools_tpu.ops.liftover import pack_ops_words16

    rng = np.random.default_rng(23)
    tw, qw, t, q, lengths, _, _ = _case(rng, 5, 1024, 1, 2)
    tn, qn = pack_nibble_words(np.asarray(t), np.asarray(q))
    ops = np.frombuffer(b"M=XID" * 10, np.uint8).reshape(1, 50).copy()
    lens = rng.integers(0, 8192, (1, 50)).astype(np.int32)
    opw16 = jnp.asarray(pack_ops_words16(ops, lens))

    a = classify_liftover_fused16(
        tw, qw, lengths, opw16, tile_b=4, tile_lw=256, interpret=True
    )
    b = classify_liftover_fused16(
        jnp.asarray(tn), jnp.asarray(qn), lengths, opw16,
        tile_b=4, tile_lw=128, interpret=True, nibble=True,
    )
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_sharded_fused16_nibble_matches_direct():
    """Nibble-plane fused16 through shard_map on the 8-device virtual
    mesh == direct call, still with zero collective bytes."""
    import jax
    import jax.numpy as jnp

    from wgatools_tpu.ops.classify import pack_nibble_words
    from wgatools_tpu.ops.fused import classify_liftover_fused16
    from wgatools_tpu.ops.liftover import pack_ops_words16
    from wgatools_tpu.parallel.mesh import make_mesh, sharded_fused16

    rng = np.random.default_rng(31)
    B = 16
    _, _, t, q, lengths, _, _ = _case(rng, B, 1024, 1, 2)
    tn, qn = pack_nibble_words(np.asarray(t), np.asarray(q))
    tn, qn = jnp.asarray(tn), jnp.asarray(qn)
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    op_arrays = [op_chars[rng.integers(0, 5, 50)] for _ in range(B)]
    len_arrays = [rng.integers(0, 4000, 50).astype(np.int32) for _ in range(B)]
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    opw16 = jnp.asarray(pack_ops_words16(ops, lens))

    direct = classify_liftover_fused16(
        tn, qn, lengths, opw16, tile_b=2, tile_lw=128, interpret=True,
        nibble=True,
    )
    mesh = make_mesh(8)
    sharded = sharded_fused16(mesh, tn, qn, lengths, opw16, nibble=True)
    for d, s in zip(direct, sharded):
        assert np.array_equal(np.asarray(d), np.asarray(s))

    from test_comm_volume import _collective_bytes

    jaxpr = jax.make_jaxpr(
        lambda a, b, l, o: sharded_fused16(mesh, a, b, l, o, nibble=True)
    )(tn, qn, lengths, opw16)
    assert _collective_bytes(jaxpr.jaxpr) == 0


def test_sharded_fused_adv16_matches_direct():
    """The round-4 flagship (advance-packed ops + MXU triangle scan)
    through shard_map on the 8-device virtual mesh == direct call,
    still with zero collective bytes."""
    import jax
    import jax.numpy as jnp

    from wgatools_tpu.ops.classify import pack_nibble_words
    from wgatools_tpu.ops.fused import classify_liftover_fused_adv16
    from wgatools_tpu.ops.liftover import pack_ops_adv16
    from wgatools_tpu.parallel.mesh import make_mesh, sharded_fused_adv16

    rng = np.random.default_rng(37)
    B = 16
    _, _, t, q, lengths, _, _ = _case(rng, B, 1024, 1, 2)
    tn, qn = pack_nibble_words(np.asarray(t), np.asarray(q))
    tn, qn = jnp.asarray(tn), jnp.asarray(qn)
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    op_arrays = [op_chars[rng.integers(0, 5, 50)] for _ in range(B)]
    len_arrays = [rng.integers(0, 4000, 50).astype(np.int32) for _ in range(B)]
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    wt, wq = (jnp.asarray(a) for a in pack_ops_adv16(ops, lens))

    mesh = make_mesh(8)
    for mode in ("vpu", "mm"):
        direct = classify_liftover_fused_adv16(
            tn, qn, lengths, wt, wq, tile_b=2, tile_lw=128,
            interpret=True, nibble=True, scan_mode=mode,
        )
        sharded = sharded_fused_adv16(
            mesh, tn, qn, lengths, wt, wq, nibble=True, scan_mode=mode
        )
        for d, s in zip(direct, sharded):
            assert np.array_equal(np.asarray(d), np.asarray(s))

    from test_comm_volume import _collective_bytes

    jaxpr = jax.make_jaxpr(
        lambda a, b, l, o1, o2: sharded_fused_adv16(
            mesh, a, b, l, o1, o2, nibble=True, scan_mode="mm"
        )
    )(tn, qn, lengths, wt, wq)
    assert _collective_bytes(jaxpr.jaxpr) == 0


@pytest.mark.parametrize("chunk", [None, 128])
@pytest.mark.parametrize("emit_odd", [True, False])
def test_fused_adv16_chunk_emit_odd_parity(chunk, emit_odd):
    """adv16 kernel options: two-level (c, c) triangle scan and the
    even-only output form (odd derived host-side via adv16_odd_offsets)
    must stay bit-identical to the jnp references."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.fused import classify_liftover_fused_adv16
    from wgatools_tpu.ops.liftover import (
        adv16_odd_offsets,
        interleave_halves,
        pack_ops_adv16,
    )

    rng = np.random.default_rng(41)
    tw, qw, t, q, lengths, _, _ = _case(rng, 5, 2048, 1, 2)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    op_arrays, len_arrays = [], []
    for _ in range(7):
        n = int(rng.integers(1, 600))
        op_arrays.append(op_chars[rng.integers(0, 6, n)])
        ls = rng.integers(0, 8192, n).astype(np.int32)
        ls[0] = 8191
        len_arrays.append(ls)
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    wt_np, wq_np = pack_ops_adv16(ops, lens)
    wt, wq = jnp.asarray(wt_np), jnp.asarray(wq_np)

    want_stats = np.asarray(classify_stat_jnp(t, q, lengths))
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), False, False
        )
    )
    outs = classify_liftover_fused_adv16(
        tw, qw, lengths, wt, wq,
        tile_b=4, tile_lw=256, tile_loh=256, interpret=True,
        scan_mode="mm", chunk=chunk, emit_odd=emit_odd,
    )
    assert np.array_equal(np.asarray(outs[0]), want_stats)
    if emit_odd:
        _, te, to, qe, qo = outs
    else:
        _, te, qe = outs
        to = adv16_odd_offsets(np.asarray(te), wt_np)
        qo = adv16_odd_offsets(np.asarray(qe), wq_np)
    got_t = interleave_halves(np.asarray(te), np.asarray(to))[:, : ops.shape[1]]
    got_q = interleave_halves(np.asarray(qe), np.asarray(qo))[:, : ops.shape[1]]
    assert np.array_equal(got_t, want_t)
    assert np.array_equal(got_q, want_q)


def test_sharded_fused_adv16_production_combo():
    """The bench.py production combo (chunk=128, emit_odd=False)
    through shard_map: 3 outputs, odd offsets derivable, zero
    collectives."""
    import jax
    import jax.numpy as jnp

    from wgatools_tpu.ops.classify import pack_nibble_words
    from wgatools_tpu.ops.liftover import adv16_odd_offsets, pack_ops_adv16
    from wgatools_tpu.parallel.mesh import make_mesh, sharded_fused_adv16

    rng = np.random.default_rng(43)
    B = 16
    _, _, t, q, lengths, _, _ = _case(rng, B, 1024, 1, 2)
    tn, qn = pack_nibble_words(np.asarray(t), np.asarray(q))
    tn, qn = jnp.asarray(tn), jnp.asarray(qn)
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    op_arrays = [op_chars[rng.integers(0, 5, 50)] for _ in range(B)]
    len_arrays = [rng.integers(0, 4000, 50).astype(np.int32) for _ in range(B)]
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    wt_np, wq_np = pack_ops_adv16(ops, lens)
    wt, wq = jnp.asarray(wt_np), jnp.asarray(wq_np)

    mesh = make_mesh(8)
    full = sharded_fused_adv16(
        mesh, tn, qn, lengths, wt, wq, nibble=True, scan_mode="mm"
    )
    stats, te, qe = sharded_fused_adv16(
        mesh, tn, qn, lengths, wt, wq, nibble=True, scan_mode="mm",
        chunk=128, emit_odd=False,
    )
    assert np.array_equal(np.asarray(stats), np.asarray(full[0]))
    assert np.array_equal(np.asarray(te), np.asarray(full[1]))
    assert np.array_equal(
        adv16_odd_offsets(np.asarray(te), wt_np), np.asarray(full[2])
    )
    assert np.array_equal(np.asarray(qe), np.asarray(full[3]))
    assert np.array_equal(
        adv16_odd_offsets(np.asarray(qe), wq_np), np.asarray(full[4])
    )

    from test_comm_volume import _collective_bytes

    jaxpr = jax.make_jaxpr(
        lambda a, b, l, o1, o2: sharded_fused_adv16(
            mesh, a, b, l, o1, o2, nibble=True, scan_mode="mm",
            chunk=128, emit_odd=False,
        )
    )(tn, qn, lengths, wt, wq)
    assert _collective_bytes(jaxpr.jaxpr) == 0


@pytest.mark.parametrize("group", [2, 4, 8])
def test_fused_group_sums_parity(group):
    """Raw group-sum path (pack_ops_sums -> kernel anchors ->
    expand_group_prefix host reconstruction) must reproduce the full
    offset tables bit-for-bit at every group size."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.fused import classify_liftover_fused_adv16
    from wgatools_tpu.ops.liftover import (
        adv16_odd_offsets,
        interleave_halves,
        pack_ops_adv16,
        pack_ops_sums,
    )

    rng = np.random.default_rng(47)
    tw, qw, t, q, lengths, _, _ = _case(rng, 5, 2048, 1, 2)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    op_arrays, len_arrays = [], []
    for _ in range(7):
        n = int(rng.integers(1, 600))
        op_arrays.append(op_chars[rng.integers(0, 6, n)])
        ls = rng.integers(0, 8192, n).astype(np.int32)
        ls[:min(8, n)] = 8191  # group sums at the 2^16 boundary (g=8)
        len_arrays.append(ls)
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    wt16, wq16 = pack_ops_adv16(ops, lens)
    st, sq = pack_ops_sums(ops, lens, group=group)
    assert st.max() < (1 << 16) and sq.max() < (1 << 16)

    want_stats = np.asarray(classify_stat_jnp(t, q, lengths))
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), False, False
        )
    )
    for mode in ("vpu", "mm"):
        stats, ta, qa = classify_liftover_fused_adv16(
            tw, qw, lengths, jnp.asarray(st), jnp.asarray(sq),
            tile_b=4, tile_lw=256, interpret=True,
            scan_mode=mode, raw_sums=True,
        )
        assert np.array_equal(np.asarray(stats), want_stats)
        from wgatools_tpu.ops.liftover import expand_group_prefix

        te = expand_group_prefix(np.asarray(ta), wt16, group=group)
        qe = expand_group_prefix(np.asarray(qa), wq16, group=group)
        to = adv16_odd_offsets(te, wt16)
        qo = adv16_odd_offsets(qe, wq16)
        got_t = interleave_halves(te, to)[:, : ops.shape[1]]
        got_q = interleave_halves(qe, qo)[:, : ops.shape[1]]
        assert np.array_equal(got_t, want_t), mode
        assert np.array_equal(got_q, want_q), mode


@pytest.mark.parametrize("caller", [False, True])
@pytest.mark.parametrize("kw", [
    {"raw_sums": True},
    {"emit_odd": True},
    {"emit_odd": False},
])
def test_fused_adv16_scan_once_vs_per_step(caller, kw):
    """scan_mode='once' (round 5: resident op tables, whole scan at
    j == 0) must be bit-identical to the per-step mm scan for every op
    packing and both category tables."""
    from wgatools_tpu.ops.classify import pack_cat_nibbles, pack_pairs
    from wgatools_tpu.ops.fused import classify_liftover_fused_adv16
    from wgatools_tpu.ops.liftover import pack_ops_adv16, pack_ops_sums

    rng = np.random.default_rng(5)
    import random as _r
    src = _r.Random(23)
    pairs = []
    for _ in range(5):
        n = src.randint(1, 700)
        pairs.append((
            "".join(src.choice("ACGTacgt-N") for _ in range(n)).encode(),
            "".join(src.choice("ACGTacgt-N") for _ in range(n)).encode(),
        ))
    t, q, lens = pack_pairs(pairs, align=256)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    ops = op_chars[rng.integers(0, 6, (4, 64))]
    lens_op = rng.integers(0, 8000, (4, 64)).astype(np.int32)
    if kw.get("raw_sums"):
        wt, wq = pack_ops_sums(ops, lens_op, group=8)
    else:
        wt, wq = pack_ops_adv16(ops, lens_op)
    cw = pack_cat_nibbles(t, q)
    import jax.numpy as jnp

    args = (
        jnp.asarray(cw), None, jnp.asarray(lens),
        jnp.asarray(wt), jnp.asarray(wq),
    )
    want = classify_liftover_fused_adv16(
        *args, tile_b=2, tile_lw=32, interpret=True, caller=caller,
        catmode=True, scan_mode="mm", **kw,
    )
    got = classify_liftover_fused_adv16(
        *args, tile_b=2, tile_lw=32, interpret=True, caller=caller,
        catmode=True, scan_mode="once", **kw,
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fused_adv16_scan_once_vmem_fallback():
    """A too-wide op table must silently fall back to the per-step mm
    scan (the resident blocks would blow VMEM) and still be exact."""
    from wgatools_tpu.ops.classify import pack_cat_nibbles, pack_pairs
    from wgatools_tpu.ops.fused import classify_liftover_fused_adv16
    from wgatools_tpu.ops.liftover import pack_ops_sums
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    pairs = [(b"ACGT" * 64, b"ACGT" * 64)] * 64
    t, q, lens = pack_pairs(pairs, align=256)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    # 64 rows x 8192 g8 words x 4 outputs+inputs > the 6 MB bound at
    # tile_b=64
    ops = op_chars[rng.integers(0, 6, (64, 8192 * 8))]
    lens_op = rng.integers(0, 64, (64, 8192 * 8)).astype(np.int32)
    wt, wq = pack_ops_sums(ops, lens_op, group=8)
    cw = pack_cat_nibbles(t, q)
    args = (
        jnp.asarray(cw), None, jnp.asarray(lens),
        jnp.asarray(wt), jnp.asarray(wq),
    )
    want = classify_liftover_fused_adv16(
        *args, tile_b=64, tile_lw=32, interpret=True, catmode=True,
        scan_mode="mm", raw_sums=True,
    )
    got = classify_liftover_fused_adv16(
        *args, tile_b=64, tile_lw=32, interpret=True, catmode=True,
        scan_mode="once", raw_sums=True,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
