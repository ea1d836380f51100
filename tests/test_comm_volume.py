"""Communication-volume assertions (round-2 VERDICT next-step #5).

The ≥85%-at-2-hosts scaling target is hardware-blocked in this
container (one real chip), so the assertable proxy is that the
collectives move only what the reference's try_reduce merges move:
pair tables / coverage difference arrays / counters -- NEVER the column
or op data.  These tests (a) count collective operand bytes in the
traced jaxprs of every mesh primitive, asserting exact sizes and
independence from the record volume, and (b) record the actual
allgather payload sizes of the distributed stat path, asserting they
scale with the pair table, not the columns.
"""

import io
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from wgatools_tpu.ops.classify import pack_pairs
from wgatools_tpu.parallel.mesh import (
    make_mesh,
    sharded_column_stats,
    sharded_coverage,
    sharded_liftover,
    sharded_pair_reduce,
)

COLLECTIVES = {
    "psum",
    "psum2",
    "psum_invariant",
    "all_gather",
    "all_gather_invariant",
    "all_reduce",
    "all_to_all",
    "reduce_scatter",
    "ppermute",
}


def _collective_bytes(jaxpr) -> int:
    """Total operand bytes of collective primitives, recursing into
    sub-jaxprs (shard_map bodies, pjit calls, scans)."""
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in COLLECTIVES:
            for v in eqn.invars:
                aval = getattr(v, "aval", None)
                if aval is not None and hasattr(aval, "dtype"):
                    total += int(
                        np.prod(aval.shape) * np.dtype(aval.dtype).itemsize
                    )
        for param in eqn.params.values():
            inner = getattr(param, "jaxpr", None)
            if inner is not None:
                total += _collective_bytes(inner)
            elif hasattr(param, "eqns"):
                total += _collective_bytes(param)
            elif isinstance(param, (list, tuple)):
                for p in param:
                    if hasattr(p, "jaxpr"):
                        total += _collective_bytes(p.jaxpr)
                    elif hasattr(p, "eqns"):
                        total += _collective_bytes(p)
    return total


def _pairs(B, L):
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT-", np.uint8)
    return pack_pairs(
        [
            (
                alpha[rng.integers(0, 5, L)].tobytes(),
                alpha[rng.integers(0, 5, L)].tobytes(),
            )
            for _ in range(B)
        ]
    )


def test_record_axis_kernels_move_zero_collective_bytes():
    """Pure data parallelism: sharded_column_stats and sharded_liftover
    must contain NO collectives at all."""
    mesh = make_mesh(8)
    t, q, lens = _pairs(8, 300)
    jaxpr = jax.make_jaxpr(
        lambda a, b, c: sharded_column_stats(mesh, a, b, c)
    )(t, q, lens)
    assert _collective_bytes(jaxpr.jaxpr) == 0

    ops = np.full((8, 128), ord("M"), np.uint8)
    ol = np.ones((8, 128), np.int32)
    jaxpr = jax.make_jaxpr(lambda a, b: sharded_liftover(mesh, a, b))(ops, ol)
    assert _collective_bytes(jaxpr.jaxpr) == 0


def test_pair_reduce_collective_is_pair_table_sized():
    """sharded_pair_reduce's psum moves exactly num_pairs x 8 x int32 --
    and the size must NOT change when the record count grows 8x."""
    mesh = make_mesh(8)
    num_pairs = 5

    def traced(B):
        stats = np.ones((B, 8), np.int32)
        ids = (np.arange(B) % num_pairs).astype(np.int32)
        jaxpr = jax.make_jaxpr(
            lambda s, i: sharded_pair_reduce(mesh, s, i, num_pairs)
        )(stats, ids)
        return _collective_bytes(jaxpr.jaxpr)

    small, big = traced(16), traced(128)
    assert small == big == num_pairs * 8 * 4


def test_coverage_collective_is_genome_sized_not_span_sized():
    """sharded_coverage psums one int32 difference array of genome_len+1
    regardless of how many spans contribute."""
    mesh = make_mesh(8)
    n = 1000

    def traced(n_spans):
        starts = np.zeros(n_spans, np.int32)
        ends = np.ones(n_spans, np.int32)
        jaxpr = jax.make_jaxpr(
            lambda s, e: sharded_coverage(mesh, s, e, n)
        )(starts, ends)
        return _collective_bytes(jaxpr.jaxpr)

    small, big = traced(8), traced(256)
    assert small == big == (n + 1) * 4


def _stat_maf_payload_bytes(monkeypatch, tmp_path, cols, name):
    """Run distributed_stat_maf (1-process mode) recording the allgather
    payload sizes; return (payload_bytes, column_bytes)."""
    from wgatools_tpu.parallel import dist_tools

    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    maf = tmp_path / f"{name}.maf"
    with open(maf, "w") as f:
        f.write("##maf version=1.6\n")
        for i in range(6):
            seq = alpha[rng.integers(0, 4, cols)].tobytes().decode()
            f.write("a score=0\n")
            f.write(f"s\tref.chr1\t{i * cols}\t{cols}\t+\t99999999\t{seq}\n")
            f.write(
                f"s\tq{i % 2}.chr1\t{i * cols}\t{cols}\t+\t99999999\t{seq}\n\n"
            )

    sizes = []
    real = dist_tools._allgather_bytes

    def spy(payload):
        sizes.append(len(payload))
        return real(payload)

    monkeypatch.setattr(dist_tools, "_allgather_bytes", spy)
    out = io.BytesIO()
    dist_tools.distributed_stat_maf(str(maf), out)
    assert out.getvalue().startswith(b"ref_name\t")
    assert sizes, "allgather never ran"
    return sum(sizes), 6 * cols * 2


def test_dist_stat_payload_scales_with_pairs_not_columns(
    monkeypatch, tmp_path
):
    """10x the columns, same pair table -> allgather payload must stay
    pair-table-sized (pickle jitter aside), i.e. nothing ships columns."""
    small_payload, small_cols = _stat_maf_payload_bytes(
        monkeypatch, tmp_path, 500, "small"
    )
    big_payload, big_cols = _stat_maf_payload_bytes(
        monkeypatch, tmp_path, 5000, "big"
    )
    assert big_cols == 10 * small_cols
    # pair-table partials: a handful of ints per (ref, query) pair.  The
    # magnitude growth of the counters may add a few pickle bytes, never
    # a column-proportional amount.
    assert big_payload <= small_payload + 64
    # absolute bound: ~500 pickled bytes per pair row, 2 pairs here --
    # nowhere near the 60 kB of columns
    assert big_payload < 4096


def test_replicate_rows_roundtrip():
    """The dist merge gather replicates every device's row everywhere."""
    from wgatools_tpu.parallel.dist_tools import _replicate_rows

    n = len(jax.devices())
    rows = np.arange(n * 8, dtype=np.uint8).reshape(n, 8)
    got = _replicate_rows(rows)
    assert np.array_equal(got, rows)


def test_sequence_parallel_scan_parity_and_carry_bytes():
    """sharded_liftover_sp (op axis sharded across the mesh -- one giant
    record spanning every device) must be bit-identical to the unsharded
    scan, and its only collective is the [2, B]-int32 shard-total
    all_gather: 8*B bytes, INDEPENDENT of the op count N."""
    from wgatools_tpu.ops.liftover import _liftover_scan_impl
    from wgatools_tpu.parallel.mesh import sharded_liftover_sp

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)

    def case(B, N, n_real):
        ops = op_chars[rng.integers(0, 6, (B, N))]
        ops[:, n_real:] = 0
        lens = rng.integers(0, 100000, (B, N)).astype(np.int32)
        lens[ops == 0] = 0
        return ops, lens

    for B, N, n_real in [(1, 256, 200), (5, 1024, 1000)]:
        ops, lens = case(B, N, n_real)
        got_t, got_q = sharded_liftover_sp(
            mesh, jnp.asarray(ops), jnp.asarray(lens), wide=True
        )
        want_t, want_q = _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), True, False
        )
        assert np.array_equal(np.asarray(got_t), np.asarray(want_t))
        assert np.array_equal(np.asarray(got_q), np.asarray(want_q))

    def traced_bytes(B, N):
        ops = np.full((B, N), ord("M"), np.uint8)
        ol = np.ones((B, N), np.int32)
        jaxpr = jax.make_jaxpr(
            lambda a, b: sharded_liftover_sp(mesh, a, b, wide=True)
        )(ops, ol)
        return _collective_bytes(jaxpr.jaxpr)

    small, big = traced_bytes(4, 256), traced_bytes(4, 8192)
    assert small == big == 2 * 4 * 4  # [2, B] int32 shard totals only


def test_sequence_parallel_scan_guards():
    """Round-4 advisor: a non-divisible op axis must raise a clear error
    (not an opaque shard_map sharding failure), and per-direction
    advance totals past int32 must raise in BOTH width modes -- 'wide'
    widens per-op lengths, never the int32 offsets, so such records
    must route to the int64 host engine."""
    import pytest

    from wgatools_tpu.parallel.mesh import sharded_liftover_sp

    mesh = make_mesh(8)
    ops = np.full((1, 257), ord("M"), np.uint8)  # 257 % 8 != 0
    lens = np.ones((1, 257), np.int32)
    with pytest.raises(ValueError, match="divide evenly"):
        sharded_liftover_sp(mesh, ops, lens)

    ops = np.full((1, 256), ord("M"), np.uint8)
    lens = np.full((1, 256), 10_000_000, np.int32)  # 2.56G total
    with pytest.raises(ValueError, match="int32 offsets"):
        sharded_liftover_sp(mesh, ops, lens, wide=False)
    # 'wide' widens per-op LENGTHS, not the int32 offsets -- the ceiling
    # applies in both modes (round-5 finding: wide=True previously
    # slipped past the guard and wrapped silently)
    with pytest.raises(ValueError, match="int32 offsets"):
        sharded_liftover_sp(mesh, ops, lens, wide=True)
    # ... but the check is PER DIRECTION: 1.28G of I + 1.28G of D sums
    # past 2^31 combined while each direction stays in int32 -- must be
    # ACCEPTED and scan exactly (round-5 review finding)
    import jax.numpy as jnp

    from wgatools_tpu.ops.liftover import _liftover_scan_impl

    ops_mix = np.frombuffer(b"ID" * 128, np.uint8).reshape(1, 256)
    lens_mix = np.full((1, 256), 10_000_000, np.int32)
    t, q = sharded_liftover_sp(
        mesh, jnp.asarray(ops_mix), jnp.asarray(lens_mix), wide=True
    )
    w_t, w_q = _liftover_scan_impl(
        jnp.asarray(ops_mix), jnp.asarray(lens_mix), True, False
    )
    assert np.array_equal(np.asarray(t), np.asarray(w_t))
    assert np.array_equal(np.asarray(q), np.asarray(w_q))
    # DEVICE-RESIDENT inputs take the f32-estimate guard branch (no
    # int64 on device, no bulk host copy) -- the 2.56G single-direction
    # case must still be rejected through it
    with pytest.raises(ValueError, match="int32 offsets"):
        sharded_liftover_sp(
            mesh, jnp.asarray(ops), jnp.asarray(lens), wide=True
        )


def test_coverage_scatter_variant_parity_and_bytes():
    """sharded_coverage_scatter (round 5): reduce_scatter + genome-
    sharded output must equal the psum variant bit-for-bit, and its
    collectives stay genome-sized and span-count-independent (one
    [padded] reduce_scatter -- ~half the wire bytes of the full psum --
    plus a [D]-scalar carry all_gather)."""
    from wgatools_tpu.parallel.mesh import (
        sharded_coverage,
        sharded_coverage_scatter,
    )

    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    genome = 1003  # non-divisible by 8: exercises the shard padding

    def case(n_spans):
        starts = rng.integers(0, genome, n_spans).astype(np.int32)
        ends = np.minimum(
            starts + rng.integers(1, 200, n_spans), genome
        ).astype(np.int32)
        starts[3] = -1  # padding sentinel rows are ignored
        return jnp.asarray(starts), jnp.asarray(ends)

    s, e = case(40)
    a = np.asarray(sharded_coverage(mesh, s, e, genome))
    b = np.asarray(sharded_coverage_scatter(mesh, s, e, genome))
    assert a.shape == b.shape == (genome,)
    assert np.array_equal(a, b)

    def traced_bytes(n_spans):
        s, e = case(n_spans)
        jaxpr = jax.make_jaxpr(
            lambda a, b: sharded_coverage_scatter(mesh, a, b, genome)
        )(s, e)
        return _collective_bytes(jaxpr.jaxpr)

    padded = ((genome + 1 + 7) // 8) * 8
    small, big = traced_bytes(8), traced_bytes(512)
    # one [padded]-i32 reduce_scatter + one [1]-i32 carry all_gather,
    # independent of span count
    assert small == big == padded * 4 + 4
