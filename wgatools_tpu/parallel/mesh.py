"""Multi-chip orchestration: record-axis data parallelism with collective
merges.

The reference's only parallel runtime is single-process rayon map-reduce
(reference: src/main.rs:30-32, rayon par_bridge/try_fold/try_reduce at 14
sites -- SURVEY.md §2.12).  The TPU equivalent is first-class here:

  * record batches shard over a 1-D device mesh axis "records"
    (the rayon-worker analog);
  * associative merges (stat vector sums, coverage element sums, validation
    counters) become `psum` over the mesh -- exactly the shapes the
    reference's try_reduce merges have (stat.rs:78-81, pafcov.rs:42-53,
    validate.rs:57-65);
  * the genome axis shards via interval chunking (SURVEY.md §5) with
    per-shard difference arrays psum-merged.

Multi-host extends the same mesh over ICI+DCN via jax.distributed (the mesh
axis simply spans all hosts' devices); nothing below changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.classify import classify_stat_jnp, classify_stat_pallas

RECORDS_AXIS = "records"


def make_mesh(n_devices=None):
    """1-D mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (RECORDS_AXIS,))


def sharded_column_stats(mesh: Mesh, t, q, lengths, use_pallas=None):
    """Column stats with the batch sharded over the record axis.

    Pure data parallelism: each device reduces its record shard; output
    stays record-sharded ([B, 8], no cross-device traffic).

    On TPU backends each shard runs the flagship Pallas kernel (shard_map
    composes with pallas_call); elsewhere the kernel runs in interpret
    mode or falls back to the fused-jnp implementation.  Both bodies are
    bit-identical (tested), so multi-chip runs use the same production
    kernel the single-chip path does.

    int32 inputs are treated as word-packed byte tensors (4 columns per
    lane, host `.view('<i4')` -- see ops.classify._kernel_words) and run
    the faster SWAR kernel; lengths stay in columns.
    """
    words = t.dtype == jnp.int32
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        interpret = jax.default_backend() != "tpu"

        if words:
            from ..ops.classify import classify_stat_pallas_words

            def body(ts, qs, ls):
                return classify_stat_pallas_words(
                    ts, qs, ls, interpret=interpret
                )

        else:

            def body(ts, qs, ls):
                return classify_stat_pallas(ts, qs, ls, interpret=interpret)

    elif words:

        def body(ts, qs, ls):
            # unpack words back to bytes for the jnp reference body
            B, LW = ts.shape
            tb = jax.lax.bitcast_convert_type(ts, jnp.uint8).reshape(B, -1)
            qb = jax.lax.bitcast_convert_type(qs, jnp.uint8).reshape(B, -1)
            return classify_stat_jnp(tb, qb, ls)

    else:
        body = classify_stat_jnp
    spec = P(RECORDS_AXIS, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, P(RECORDS_AXIS)),
        out_specs=spec,
        # pallas_call outputs carry no varying-mesh-axes annotation; the
        # body is per-shard pure data parallelism, so vma checking adds
        # nothing here
        check_vma=not use_pallas,
    )
    return fn(t, q, lengths)


def sharded_pair_reduce(mesh: Mesh, stats, pair_ids, num_pairs: int):
    """Merge record stats into per-pair aggregates across the mesh.

    The distributed analog of stat.rs's try_reduce: local segment-sum by
    pair id, then psum over the record axis so every device holds the full
    [num_pairs, 8] table.
    """

    def local(stats_shard, ids_shard):
        seg = jax.ops.segment_sum(
            stats_shard.astype(jnp.int32), ids_shard, num_segments=num_pairs
        )
        return jax.lax.psum(seg, RECORDS_AXIS)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(RECORDS_AXIS, None), P(RECORDS_AXIS)),
        out_specs=P(),
    )
    return fn(stats, pair_ids)


def sharded_coverage(mesh: Mesh, starts, ends, genome_len: int):
    """Coverage scatter-add with record spans sharded over the mesh and the
    merged difference array psum'd (pafcov.rs:42-53's elementwise vector sum
    as a collective)."""
    n = genome_len

    def local(starts_shard, ends_shard):
        diff = jnp.zeros(n + 1, dtype=jnp.int32)
        s = jnp.clip(starts_shard, 0, n)
        e = jnp.clip(ends_shard, 0, n)
        diff = diff.at[s].add(jnp.where(starts_shard < 0, 0, 1))
        diff = diff.at[e].add(jnp.where(starts_shard < 0, 0, -1))
        diff = jax.lax.psum(diff, RECORDS_AXIS)
        return jnp.cumsum(diff[:-1])

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(RECORDS_AXIS), P(RECORDS_AXIS)),
        out_specs=P(),
    )
    return fn(starts, ends)


def sharded_coverage_scatter(
    mesh: Mesh, starts, ends, genome_len: int, trim: bool = True
):
    """Coverage with the GENOME axis sharded on output: the per-device
    difference arrays merge with ONE reduce_scatter (psum_scatter)
    instead of a full psum, and each device keeps only its genome
    shard -- roughly HALVING the fabric bytes of the one volume-heavy
    merge in the toolkit (docs/SCALING.md analytic model: pafcov's
    genome-sized psum is the only collective below ~90% predicted
    multi-host efficiency; reduce_scatter + sharded output is the fix
    the model prescribes).

    The global running coverage needs each shard's prefix carry: shard
    diff totals exchange in one [D]-scalar all_gather (the
    sharded_liftover_sp carry pattern), then each device cumsums its
    shard locally.

    trim=True (default) returns the [genome_len] coverage -- NOTE the
    eager [:n] slice breaks the clean per-device partition when
    genome_len+1 does not divide the mesh (XLA reshards the tail), so
    it is the convenience form for centralized consumers; bit-identical
    to sharded_coverage (tested).  Per-shard consumers (BED emission in
    genome order without central materialization) pass trim=False to
    get the [padded] array still P(RECORDS_AXIS)-sharded, padded//D
    positions per device, and slice positions >= genome_len themselves
    (their values are the final running coverage carried into the
    padding -- ignore them)."""
    n = genome_len
    D = mesh.shape[RECORDS_AXIS]
    padded = ((n + 1 + D - 1) // D) * D

    def local(starts_shard, ends_shard):
        diff = jnp.zeros(padded, dtype=jnp.int32)
        s = jnp.clip(starts_shard, 0, n)
        e = jnp.clip(ends_shard, 0, n)
        diff = diff.at[s].add(jnp.where(starts_shard < 0, 0, 1))
        diff = diff.at[e].add(jnp.where(starts_shard < 0, 0, -1))
        part = jax.lax.psum_scatter(
            diff, RECORDS_AXIS, scatter_dimension=0, tiled=True
        )  # [shard]: this device's slice of the globally-summed diff
        tot = jnp.sum(part, dtype=jnp.int32)
        gat = jax.lax.all_gather(tot[None], RECORDS_AXIS)  # [D, 1]
        idx = jax.lax.axis_index(RECORDS_AXIS)
        mask = (jnp.arange(D) < idx)[:, None]
        carry = jnp.sum(jnp.where(mask, gat, 0), dtype=jnp.int32)
        return carry + jnp.cumsum(part)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(RECORDS_AXIS), P(RECORDS_AXIS)),
        out_specs=P(RECORDS_AXIS),
        check_vma=False,
    )
    out = fn(starts, ends)
    return out[:n] if trim else out


def sharded_fused16(mesh: Mesh, tw, qw, lengths, opw16, nibble=False):
    """The flagship fused CIGAR-engine kernel (classify + 16-bit packed
    op scan, ops.fused.classify_liftover_fused16) with records sharded
    over the mesh -- pure data parallelism, outputs stay record-sharded
    (stats [B,8]; even/odd offset halves [B2, NOH]).

    The kernel is Pallas-only (interpret mode off-TPU -- there is no jnp
    fallback body to choose, unlike sharded_column_stats).  nibble=True
    takes 4-bit dictionary planes (classify.pack_nibble_words).  Row
    counts per shard follow the same padding rules as the direct call;
    column/op batches must shard evenly over the record axis
    (pad_to_multiple)."""
    from ..ops.fused import classify_liftover_fused16

    interpret = jax.default_backend() != "tpu"

    def body(a, b, l, o):
        return classify_liftover_fused16(
            a, b, l, o,
            tile_b=min(64, max(a.shape[0], o.shape[0])),
            interpret=interpret,
            nibble=nibble,
        )

    spec = P(RECORDS_AXIS, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, P(RECORDS_AXIS), spec),
        out_specs=(spec, spec, spec, spec, spec),
        check_vma=False,
    )
    return fn(tw, qw, lengths, opw16)


def sharded_fused_adv16(
    mesh: Mesh, tw, qw, lengths, wt, wq, nibble=False, catmode=False,
    scan_mode="mm", chunk=None, emit_odd=True, raw_sums=False,
):
    """The round-4/5 flagship through shard_map: classify + ADVANCE-packed
    op scan (ops.fused.classify_liftover_fused_adv16 -- host-side class
    decode via liftover.pack_ops_adv16, MXU triangle pair-sum scan).
    Record-axis data parallelism like sharded_fused16; zero collectives,
    outputs stay record-sharded.  chunk/emit_odd/raw_sums as in the
    kernel wrapper (emit_odd=False returns (stats, t_even, q_even);
    callers derive odd = even + (w >> 14) via
    liftover.adv16_odd_offsets; raw_sums=True takes group-sum words
    from liftover.pack_ops_sums and returns group-prefix anchors for
    liftover.expand_group_prefix).  catmode=True (round 5): tw is ONE
    category plane from classify.pack_cat_nibbles, qw must be None."""
    from ..ops.fused import classify_liftover_fused_adv16

    interpret = jax.default_backend() != "tpu"
    if raw_sums:
        emit_odd = False

    spec = P(RECORDS_AXIS, None)
    if catmode:
        assert qw is None, "catmode takes ONE category plane"

        def body_cat(a, l, owt, owq):
            return classify_liftover_fused_adv16(
                a, None, l, owt, owq,
                tile_b=min(64, max(a.shape[0], owt.shape[0])),
                interpret=interpret,
                catmode=True,
                scan_mode=scan_mode,
                chunk=chunk,
                emit_odd=emit_odd,
                raw_sums=raw_sums,
            )

        fn = shard_map(
            body_cat,
            mesh=mesh,
            in_specs=(spec, P(RECORDS_AXIS), spec, spec),
            out_specs=(spec,) * (5 if emit_odd else 3),
            check_vma=False,
        )
        return fn(tw, lengths, wt, wq)

    def body(a, b, l, owt, owq):
        return classify_liftover_fused_adv16(
            a, b, l, owt, owq,
            tile_b=min(64, max(a.shape[0], owt.shape[0])),
            interpret=interpret,
            nibble=nibble,
            scan_mode=scan_mode,
            chunk=chunk,
            emit_odd=emit_odd,
            raw_sums=raw_sums,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, P(RECORDS_AXIS), spec, spec),
        out_specs=(spec,) * (5 if emit_odd else 3),
        check_vma=False,
    )
    return fn(tw, qw, lengths, wt, wq)


def pad_to_multiple(arr, multiple, axis=0, fill=0):
    """Pad an array along axis to a multiple (for even sharding)."""
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - n)
    return np.pad(arr, widths, constant_values=fill)


def sharded_liftover(mesh: Mesh, ops, lens, wide=False, use_pallas=None):
    """Liftover coordinate scan with records sharded over the mesh.

    Record-axis data parallelism like sharded_column_stats: each device
    scans its shard's op rows (the Pallas kernel on TPU, the jnp/mm
    formulation elsewhere); outputs stay record-sharded.
    """
    from ..ops.liftover import _liftover_scan_impl, liftover_scan_pallas

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and not wide:
        interpret = jax.default_backend() != "tpu"

        def body(o, l):
            return liftover_scan_pallas(o, l, interpret=interpret)

    else:

        def body(o, l):
            return _liftover_scan_impl(o, l, wide, use_pallas)

    spec = P(RECORDS_AXIS, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return fn(ops, lens)


def sharded_liftover_sp(mesh: Mesh, ops, lens, wide=False):
    """SEQUENCE-parallel liftover scan: the OP axis sharded across the
    mesh, so one multi-Gbp record spans every chip (the genome-axis
    analog of sharded_liftover's record parallelism; the reference's
    granularity is one rayon task per record, converter.rs:43, which a
    single giant record serializes -- the scan is associative, so TPU
    shards the axis instead).

    Each device scans its op shard locally (the same kernel/jnp path the
    single-chip liftover_scan dispatches to), then exchanges ONLY
    per-row shard totals: one [2, B]-int32 all_gather -- O(B x devices)
    bytes, independent of N (asserted in tests/test_comm_volume.py).
    The exclusive inter-device carry is the masked sum of the gathered
    totals below this device's mesh index.

    ops: uint8 [B, N], lens: int32 [B, N]; N must divide evenly over the
    mesh (pad with op 0 / len 0 -- padding advances nothing; checked
    below with a clear error instead of an opaque shard_map failure).
    wide=True widens the per-op LENGTH bound past 2^16 (the 4-limb
    scan, ops.liftover) -- offsets stay int32 in EVERY path, so a
    record whose total advanced bases reach 2^31 (~2.1 Gbp per
    direction) cannot be scanned on device at all; checked below from
    the host-visible totals with a clear error (records that large
    take the int64 host engine).  Returns (t_off, q_off) [B, N]
    bit-identical to ops.liftover.liftover_scan on the unsharded batch
    (tested)."""
    from ..ops.liftover import OP_D, OP_I, OP_S, liftover_scan

    n_dev = mesh.shape[RECORDS_AXIS]
    n_ops = ops.shape[1]
    if n_ops % n_dev:
        raise ValueError(
            f"sharded_liftover_sp: op axis ({n_ops}) must divide evenly "
            f"over the {n_dev}-device mesh -- pad with op 0 / len 0 "
            "(padding advances nothing)"
        )
    if not isinstance(lens, jax.core.Tracer) and not isinstance(
        ops, jax.core.Tracer
    ):
        # int32 offset ceiling applies in BOTH width modes ('wide' only
        # widens per-op lengths, not the accumulated offsets) -- checked
        # PER DIRECTION: a record mixing 1.2 Gbp of I and 1.2 Gbp of D
        # advances each direction < 2^31 and scans exactly, so the
        # combined length sum would over-reject it
        from ..ops.liftover import OP_D as _D, OP_I as _I, OP_S as _S

        if isinstance(ops, np.ndarray) and isinstance(lens, np.ndarray):
            # host inputs (the usual case: op tables pack on host):
            # exact int64 check
            o = ops
            l64 = np.asarray(lens, dtype=np.int64)
            pad = o == 0
            adv_t = np.where(pad | (o == _I) | (o == _S), 0, l64)
            adv_q = np.where(pad | (o == _D), 0, l64)
            total = max(
                int(adv_t.sum(axis=1).max(initial=0)),
                int(adv_q.sum(axis=1).max(initial=0)),
            )
            ceiling = 1 << 31
        else:
            # device-resident inputs: no int64 on device (x64 off) and
            # a host round-trip of the whole op table would cost more
            # than the scan.  EXACT check via nested int32 limb sums
            # (an f32 estimate is unsound: blocked accumulation can
            # round away millions of small ops once a partial sum
            # passes 2^24 -- round-5 review finding): split each
            # advance into 15-bit limbs, chunk-reduce so no partial
            # exceeds 2^30, split the chunk sums again, and recombine
            # the four per-row int32 scalars exactly in host int64.
            pad = ops == 0
            li = lens.astype(jnp.int32)
            adv_t = jnp.where(pad | (ops == _I) | (ops == _S), 0, li)
            adv_q = jnp.where(pad | (ops == _D), 0, li)
            C = 1 << 14
            n_pad = (-n_ops) % C
            if n_ops + n_pad >= (1 << 30):  # K*2^15 must stay in int32
                raise ValueError(
                    "sharded_liftover_sp: op axis too long for the "
                    "device-resident overflow check (>= 2^30 ops); "
                    "pass host numpy arrays"
                )

            def row_totals(adv):
                a = adv
                if n_pad:
                    a = jnp.pad(a, ((0, 0), (0, n_pad)))
                B2 = a.shape[0]
                a = a.reshape(B2, -1, C)
                # per-chunk limb sums: <= 2^14 * 2^16 = 2^30 (hi),
                # 2^14 * 2^15 = 2^29 (lo)
                hi_c = jnp.sum(a >> 15, axis=2)
                lo_c = jnp.sum(a & 0x7FFF, axis=2)

                def lvl2(cs):
                    # chunk sums < 2^30 split again; K < 2^16 keeps
                    # each K*2^15 partial in int32
                    return (
                        jnp.sum(cs >> 15, axis=1),
                        jnp.sum(cs & 0x7FFF, axis=1),
                    )

                hh, hl = lvl2(hi_c)
                lh, ll = lvl2(lo_c)
                sum_hi = (np.asarray(hh).astype(np.int64) << 15) + (
                    np.asarray(hl).astype(np.int64)
                )
                sum_lo = (np.asarray(lh).astype(np.int64) << 15) + (
                    np.asarray(ll).astype(np.int64)
                )
                return (sum_hi << 15) + sum_lo

            total = int(
                max(
                    row_totals(adv_t).max(initial=0),
                    row_totals(adv_q).max(initial=0),
                )
            )
            ceiling = 1 << 31
        if total >= ceiling:
            raise ValueError(
                f"sharded_liftover_sp: record advances up to ~{total} bases "
                "in one direction -- int32 offsets would wrap (route "
                "records past ~2.1 Gbp per direction through the int64 "
                "host engine)"
            )

    def body(o, l):
        t_loc, q_loc = liftover_scan(o, l, wide=wide)
        # shard totals from the last op's exclusive offset + its advance
        o_last = o[:, -1]
        l_last = l[:, -1].astype(jnp.int32)
        pad = o_last == 0
        at = jnp.where(pad | (o_last == OP_I) | (o_last == OP_S), 0, l_last)
        aq = jnp.where(pad | (o_last == OP_D), 0, l_last)
        tot_t = t_loc[:, -1] + at
        tot_q = q_loc[:, -1] + aq
        gat = jax.lax.all_gather(
            jnp.stack([tot_t, tot_q], axis=0), RECORDS_AXIS
        )  # [D, 2, B]
        idx = jax.lax.axis_index(RECORDS_AXIS)
        mask = (jnp.arange(gat.shape[0]) < idx)[:, None, None]
        carry = jnp.sum(jnp.where(mask, gat, 0), axis=0)  # [2, B]
        return t_loc + carry[0][:, None], q_loc + carry[1][:, None]

    spec = P(None, RECORDS_AXIS)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return fn(ops, lens)
