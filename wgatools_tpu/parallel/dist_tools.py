"""Distributed tool drivers: whole-tool flows across jax.distributed
processes.

The reference has no distributed mode at all (SURVEY.md §2.12); this is
the TPU-native extension: each process claims record work units from the
MAF-index manifest (claim_work_units -- deterministic, coordinator-free),
computes its partial results locally, and the variable-length outputs are
gathered with a length-padded byte allgather over the device mesh, then
merged deterministically by the natural-sort rules the serial tools
already apply.  Output is byte-identical to the single-process tool.

Activation: run one process per host with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set and WGA_TPU_DIST=1; `stat` then
routes through distributed_stat_maf (cli.py).  A MAF index
(`maf-index`) serves as the restartable shard manifest when present;
otherwise processes stripe the raw record-offset scan.
"""

import io
import logging
import os
import pickle
from contextlib import contextmanager

log = logging.getLogger("wgatools_tpu")


def dist_requested() -> bool:
    return os.environ.get("WGA_TPU_DIST", "") not in ("", "0", "false")


@contextmanager
def stdout_parked():
    """Temporarily point fd 1 at stderr: C++ comm backends (gloo) print
    connection banners straight to fd 1 at first collective, and tool
    stdout must stay byte-clean for pipes."""
    import sys

    sys.stdout.flush()
    saved = os.dup(1)
    try:
        os.dup2(2, 1)
        yield
    finally:
        os.dup2(saved, 1)
        os.close(saved)


def _replicate_rows(rows, devices=None):
    """[n_dev, L] host rows -> fully-replicated numpy array via ONE
    all-gather over a 1-axis device mesh (each device row-sharded in,
    P() out).  The merge collective of every dist tool; factored out so
    the driver's multi-chip dryrun exercises the exact shape
    (__graft_entry__.dryrun_multichip)."""
    import functools

    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if devices is None:
        devices = jax.devices()
    mesh = Mesh(np.array(devices), ("p",))
    sh = NamedSharding(mesh, P("p", None))
    arr = jax.make_array_from_callback(
        rows.shape, sh, lambda idx: rows[idx]
    )

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def gather(x):
        return x

    return np.asarray(jax.device_get(gather(arr)))


def _allgather_bytes(payload: bytes):
    """All-gather variable-length byte strings across processes.

    Pads to the max length (all processes learn it via a gather of
    lengths) and runs one uint8 all_gather over a 1-axis device mesh;
    every process receives every payload.  This is the DCN gather
    SURVEY.md §5 describes for variable-length outputs.
    """
    import jax
    import numpy as np

    nproc = jax.process_count()
    if nproc == 1:
        return [payload]
    devices = jax.devices()
    n_dev = len(devices)
    dev_per_proc = n_dev // nproc

    # 1) agree on the max payload length
    lens_local = np.zeros((n_dev, 1), dtype=np.int32)
    for d in range(dev_per_proc):
        lens_local[jax.process_index() * dev_per_proc + d, 0] = len(payload)
    all_lens = _replicate_rows(lens_local, devices)[:, 0]
    max_len = int(all_lens.max())

    # 2) padded uint8 all-gather (each process contributes one row per
    # local device; row content identical across a process's devices)
    pad = np.zeros((n_dev, max(max_len, 1)), dtype=np.uint8)
    row = np.frombuffer(payload.ljust(max(max_len, 1), b"\x00"), np.uint8)
    for d in range(dev_per_proc):
        pad[jax.process_index() * dev_per_proc + d] = row
    all_rows = _replicate_rows(pad, devices)
    out = []
    for p in range(nproc):
        n = int(all_lens[p * dev_per_proc])
        out.append(all_rows[p * dev_per_proc, :n].tobytes())
    return out


def _claimed_offsets(path, pid, nproc):
    """This process's record byte offsets: from the MAF-index shard
    manifest when present (claim_work_units -- restartable), else from a
    raw offset scan every process derives identically (the serial tools
    also work indexless)."""
    import os as _os

    from ..tools.index import index_path_for, load_index
    from .distributed import claim_work_units

    if _os.path.exists(index_path_for(path)):
        mafindex = load_index(index_path_for(path))
        units = claim_work_units(mafindex, pid, nproc)
        # units are (name, start, end, offset) per s-line; dedupe offsets
        # (a record's target s-line is the isref entry, one per record)
        return sorted({u[3] for u in units})
    from .host_pool import maf_record_offsets

    offsets = maf_record_offsets(path)
    return offsets[pid::nproc]


def distributed_stat_maf(path, writer, each=False, query_name=None):
    """Multi-process `stat`: claim -> local partials -> allgather -> merge.

    Each process seeks to its claimed records (MAF index offsets), computes
    PairStats locally (host or device engine as usual), and process 0
    writes the merged table -- byte-identical to the serial tool because
    write_style_result's merge/sort is order-insensitive at the pair level
    and `--each` rows are re-ordered by the deterministic unit order.
    """
    import jax

    from ..io.maf import MafReader
    from ..tools.stat import _stat_from_rec, write_style_result

    pid = jax.process_index()
    nproc = jax.process_count()
    offsets = _claimed_offsets(path, pid, nproc)

    reader = MafReader.from_path(path)
    local = []
    for off in offsets:
        reader.seek(off)
        rec = reader.next_record()
        if rec is None:
            continue
        if query_name is not None:
            rec.set_query_idx_byname(query_name)
        local.append((off, _stat_from_rec(rec)))

    with stdout_parked():
        payloads = _allgather_bytes(pickle.dumps(local, protocol=4))
    if pid != 0:
        return
    merged = []
    for blob in payloads:
        merged.extend(pickle.loads(blob))
    merged.sort(key=lambda t: t[0])  # deterministic record order
    write_style_result([ps for _, ps in merged], writer, each)


def _psum_row(local_row, contribute: bool):
    """Sum one int32 row across processes: each process places its row on
    its first local device (zeros elsewhere), and a replicated-output sum
    over the device axis merges them -- pafcov.rs:42-53's elementwise
    vector sum as a cross-host collective."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    n_dev = len(devices)
    mesh = Mesh(np.array(devices), ("p",))
    nproc = jax.process_count()
    dev_per_proc = n_dev // nproc
    L = local_row.shape[0]
    rows = np.zeros((n_dev, L), dtype=np.int32)
    if contribute:
        rows[jax.process_index() * dev_per_proc] = local_row
    sh = NamedSharding(mesh, P("p", None))
    g = jax.make_array_from_callback(rows.shape, sh, lambda idx: rows[idx])

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def merge(x):
        return jnp.sum(x, axis=0)

    return np.asarray(jax.device_get(merge(g)))


def distributed_pafcov(path, writer):
    """Multi-process `pafcov`: line-ranges -> local difference arrays ->
    per-target cross-process sum -> process 0 writes per-base BED.

    Byte-identical to the serial tool: target output order is the global
    first-appearance order (range order == file order), and the merged
    difference arrays are exact int32 sums.
    """
    import jax

    from ..io.paf import PafReader
    from ..tools.pafcov import accumulate_record, write_per_base_bed
    from .host_pool import paf_line_ranges

    import numpy as np

    pid = jax.process_index()
    nproc = jax.process_count()
    ranges = paf_line_ranges(path, nproc)

    diff_map = {}
    if pid < len(ranges):
        lo, hi, _ = ranges[pid]
        with open(path, "rb") as fp:
            fp.seek(lo)
            blob = fp.read(hi - lo)
        for rec in PafReader(io.BytesIO(blob)).records():
            accumulate_record(rec, diff_map)

    with stdout_parked():
        # agree on the global target list (first-appearance order across
        # ranges in file order) and sizes
        metas = _allgather_bytes(
            pickle.dumps(
                [(t, d.shape[0]) for t, d in diff_map.items()], protocol=4
            )
        )
        order = []
        sizes = {}
        for blob in metas:
            for t, n in pickle.loads(blob):
                if t not in sizes:
                    order.append(t)
                    sizes[t] = n
                elif n > sizes[t]:
                    # inconsistent target_length fields across records:
                    # every rank must psum the SAME global shape, so
                    # agree on the maximum (the pooled merge's rule,
                    # host_pool.parallel_pafcov) -- a rank-local length
                    # would hang the collective (round-5 review finding)
                    sizes[t] = n
        merged = {}
        for t in order:
            local = diff_map.get(t)
            contribute = local is not None
            if local is None:
                local = np.zeros(sizes[t], dtype=np.int32)
            elif local.shape[0] < sizes[t]:
                local = np.concatenate(
                    [
                        local,
                        np.zeros(
                            sizes[t] - local.shape[0], dtype=np.int32
                        ),
                    ]
                )
            merged[t] = _psum_row(local, contribute)

    if pid != 0:
        return
    for t in order:
        counts = np.cumsum(merged[t][:-1])
        write_per_base_bed(writer, t, counts)
    writer.flush()


def distributed_validate_paf(path, writer, fix_writer=None, fix_flag=False):
    """Multi-process `validate`: line-ranges -> local Validations ->
    allgather -> process 0 merges counters/lists/fixed rows in range
    (= file) order.  Byte-identical to the serial tool."""
    import jax

    from ..io.paf import PafReader, PafWriter
    from ..tools.validate import Validations, check_record
    from .host_pool import paf_line_ranges

    pid = jax.process_index()
    nproc = jax.process_count()
    ranges = paf_line_ranges(path, nproc)

    vd_local = Validations()
    fixed = io.BytesIO()
    if pid < len(ranges):
        lo, hi, _ = ranges[pid]
        with open(path, "rb") as fp:
            fp.seek(lo)
            blob = fp.read(hi - lo)
        for rec in PafReader(io.BytesIO(blob)).records():
            check_record(rec, rec.get_stat(), vd_local, fix_flag)
        if fix_flag:
            paf_writer = PafWriter(fixed)
            for rec in vd_local.fix_paf_recs:
                paf_writer.write_record(rec)
            vd_local.fix_paf_recs = []

    part = (
        vd_local.total,
        vd_local.query_invalid,
        vd_local.query_inv_list,
        vd_local.ref_invalid,
        vd_local.ref_inv_list,
        fixed.getvalue(),
    )
    with stdout_parked():
        payloads = _allgather_bytes(pickle.dumps(part, protocol=4))
    if pid != 0:
        return
    vd = Validations()
    fix_chunks = []
    for blob in payloads:
        total, q_inv, q_list, r_inv, r_list, fix_bytes = pickle.loads(blob)
        vd.total += total
        vd.query_invalid += q_inv
        vd.query_inv_list.extend(q_list)
        vd.ref_invalid += r_inv
        vd.ref_inv_list.extend(r_list)
        fix_chunks.append(fix_bytes)
    writer.write((vd.format() + "\n").encode("ascii"))
    writer.flush()
    if fix_writer is not None:
        for chunk in fix_chunks:
            fix_writer.write(chunk)
        fix_writer.flush()
    return vd


def distributed_call_maf(
    path,
    writer,
    if_snp,
    if_inv,
    svlen_cutoff,
    sample=None,
    query_name=None,
    query_regex=None,
    chunk_size=None,
):
    """Multi-process `call`: claim records from the index manifest, emit
    VCF body rows locally, allgather, merge in record-offset order.

    Process 0 writes header + merged body -- byte-identical to the serial
    tool (body rows are emitted per record and records are re-ordered by
    offset; within-record order is preserved by each worker)."""
    import os as _os

    import jax

    from ..io.maf import MafReader
    from ..io.vcf import VcfWriter
    from ..tools.caller import call_one_record
    from ..tools.index import index_path_for, load_index

    pid = jax.process_index()
    nproc = jax.process_count()
    mafindex = None
    if _os.path.exists(index_path_for(path)):
        mafindex = load_index(index_path_for(path))
    else:
        log.warning("maf index not found, will not generate contig info")
    offsets = _claimed_offsets(path, pid, nproc)

    reader = MafReader.from_path(path)
    local = []
    for off in offsets:
        reader.seek(off)
        rec = reader.next_record()
        if rec is None:
            continue
        body = io.BytesIO()
        call_one_record(
            rec, body, if_snp, if_inv, svlen_cutoff, chunk_size,
            query_name, query_regex,
        )
        local.append((off, body.getvalue()))

    with stdout_parked():
        payloads = _allgather_bytes(pickle.dumps(local, protocol=4))
    if pid != 0:
        return
    merged = []
    for blob in payloads:
        merged.extend(pickle.loads(blob))
    merged.sort(key=lambda t: t[0])
    vcf = VcfWriter(writer, sample or "sample")
    contigs = None
    if mafindex:
        contigs = [
            (name, item["size"])
            for name, item in mafindex.items()
            if item["isref"]
        ]
    vcf.write_header(contigs)
    for _, body in merged:
        writer.write(body)
    writer.flush()


def _merge_chunks_to(writer, payloads, pid):
    """Process 0 writes the gathered byte chunks in process (= file) order."""
    if pid != 0:
        return
    for chunk in payloads:
        writer.write(chunk)
    writer.flush()


# A MAF record whose text is at least this many bytes (~half that in
# alignment columns) is COLUMN-SLICED across all processes instead of
# being assigned to one: per-record granularity (the reference's rayon
# unit, converter.rs:43) would serialize a whole-chromosome record on one
# process.  Column classification is per-column, so contiguous slices
# classify independently and their run tables merge exactly at the
# boundaries.  Env-overridable for tests (WGA_TPU_GIANT_SPLIT).
GIANT_SPLIT_BYTES = 16 << 20


def _giant_threshold() -> int:
    import os as _os

    return int(_os.environ.get("WGA_TPU_GIANT_SPLIT", GIANT_SPLIT_BYTES))


def _giant_indices(path, offsets, threshold):
    """Record indices whose on-disk text reaches the split threshold --
    derived from the offset manifest alone, so every process agrees."""
    import os as _os

    if not offsets:
        return set()
    end = _os.path.getsize(path)
    bounds = list(offsets) + [end]
    return {
        k
        for k in range(len(offsets))
        if bounds[k + 1] - bounds[k] >= threshold
    }


def _giant_slice_runs(rec, pid, nproc):
    """ext-classify this process's contiguous column slice of one giant
    record.  Returns (cat_vals uint8, lens int64) for columns
    [L*pid//nproc, L*(pid+1)//nproc)."""
    import numpy as np

    from ..core.cigar import ext_runs, seq_bytes

    t = seq_bytes(rec.target_seq)
    q = seq_bytes(rec.query_seq)
    L = len(t)
    lo = (L * pid) // nproc
    hi = (L * (pid + 1)) // nproc
    if lo >= hi:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    return ext_runs(t[lo:hi], q[lo:hi])


def _merge_run_parts(parts):
    """Concatenate per-slice run tables, joining equal-category runs at
    slice boundaries (classification is per-column, so this equals the
    whole-record run table exactly; differential-tested)."""
    import numpy as np

    vals_out, lens_out = [], []
    for v, l in parts:
        v = np.asarray(v, np.uint8)
        l = np.array(l, np.int64, copy=True)
        if v.size == 0:
            continue
        if vals_out and vals_out[-1][-1] == v[0]:
            lens_out[-1][-1] += l[0]
            v, l = v[1:], l[1:]
            if v.size == 0:
                continue
        vals_out.append(v)
        lens_out.append(l)
    if not vals_out:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    return np.concatenate(vals_out), np.concatenate(lens_out)


def _distributed_maf_records(path, render, emit_merged, writer, query_name):
    """Shared skeleton of distributed maf2paf / maf2chain with giant-record
    column splitting.

    render(rec, k) -> bytes for a normally-assigned record;
    emit_merged(writer, rec, k, vals, lens) writes one giant record from
    its merged run table."""
    import pickle

    import jax

    from ..io.maf import MafReader
    from .host_pool import _ranges, maf_record_offsets

    pid = jax.process_index()
    nproc = jax.process_count()
    offsets = maf_record_offsets(path)
    giants = (
        _giant_indices(path, offsets, _giant_threshold())
        if nproc > 1
        else set()
    )
    normal = [k for k in range(len(offsets)) if k not in giants]
    ranges = _ranges(len(normal), nproc) if normal else []

    reader = MafReader.from_path(path)
    rows = {}
    if pid < len(ranges):
        lo, hi = ranges[pid]
        for j in range(lo, hi):
            k = normal[j]
            reader.seek(offsets[k])
            rec = reader.next_record()
            if rec is None:
                break
            rows[k] = render(rec, k)

    if not giants:
        out = io.BytesIO()
        for k in sorted(rows):
            out.write(rows[k])
        with stdout_parked():
            payloads = _allgather_bytes(out.getvalue())
        _merge_chunks_to(writer, payloads, pid)
        return

    # every process classifies its column slice of every giant record
    giant_recs = {}
    parts = {}
    for k in sorted(giants):
        reader.seek(offsets[k])
        rec = reader.next_record()
        if rec is None:
            continue
        if query_name is not None:
            rec.set_query_idx_byname(query_name)
        giant_recs[k] = rec
        parts[k] = _giant_slice_runs(rec, pid, nproc)

    with stdout_parked():
        payloads = _allgather_bytes(
            pickle.dumps({"rows": rows, "parts": parts}, protocol=4)
        )
    if pid != 0:
        return
    all_rows = {}
    all_parts = {k: [None] * nproc for k in giant_recs}
    for p, blob in enumerate(payloads):
        d = pickle.loads(blob)
        all_rows.update(d["rows"])
        for k, vp in d["parts"].items():
            if k in all_parts:
                all_parts[k][p] = vp
    for k in range(len(offsets)):
        if k in giant_recs:
            vals, lens = _merge_run_parts(
                [vp for vp in all_parts[k] if vp is not None]
            )
            emit_merged(writer, giant_recs[k], k, vals, lens)
        elif k in all_rows:
            writer.write(all_rows[k])
    writer.flush()


def distributed_maf2paf(path, writer, query_name=None):
    """Multi-process `maf2paf`: contiguous record ranges from the raw
    offset scan (every process derives the same manifest), local PAF
    rendering, allgather, process 0 concatenates in record (= file)
    order.  Records over the giant threshold are column-sliced across
    ALL processes and their run tables boundary-merged (see
    _distributed_maf_records).  Byte-identical to the serial tool."""
    from ..core.cigar import cigar_from_runs
    from ..tools.convert import _paf_from_cigar

    def render(rec, _k):
        return rec.convert2paf(query_name).to_row()

    def emit_merged(w, rec, _k, vals, lens):
        cigar = cigar_from_runs(vals, lens, rec.is_negative)
        w.write(_paf_from_cigar(rec, cigar).to_row())

    _distributed_maf_records(path, render, emit_merged, writer, query_name)


def distributed_paf2chain(path, writer):
    """Multi-process `paf2chain` over line-aligned byte ranges; chain ids
    continue the serial numbering via the per-range record counts the
    manifest already carries.  Byte-identical to the serial tool."""
    import jax

    from .host_pool import _paf2chain_worker, paf_line_ranges

    pid = jax.process_index()
    nproc = jax.process_count()
    ranges = [r for r in paf_line_ranges(path, nproc) if r[0] < r[1]]

    chunk = b""
    if pid < len(ranges):
        lo, hi, start_index = ranges[pid]
        chunk = _paf2chain_worker((path, lo, hi, start_index))

    with stdout_parked():
        payloads = _allgather_bytes(chunk)
    _merge_chunks_to(writer, payloads, pid)


def distributed_chain2paf(path, writer):
    """Multi-process `chain2paf` over whole-record byte ranges.
    Byte-identical to the serial tool."""
    import os as _os

    import jax

    from .host_pool import _chain2paf_worker, _ranges, chain_record_offsets

    pid = jax.process_index()
    nproc = jax.process_count()
    offsets = chain_record_offsets(path)
    ranges = _ranges(len(offsets), nproc) if offsets else []

    chunk = b""
    if pid < len(ranges):
        lo, hi = ranges[pid]
        size = _os.path.getsize(path)
        end = offsets[hi] if hi < len(offsets) else size
        chunk = _chain2paf_worker((path, offsets[lo], end))

    with stdout_parked():
        payloads = _allgather_bytes(chunk)
    _merge_chunks_to(writer, payloads, pid)


def distributed_maf2chain(path, writer, query_name=None):
    """Multi-process `maf2chain`: contiguous record ranges; chain ids are
    the global record indices, so numbering matches the serial tool.
    Giant records column-slice across processes like distributed_maf2paf."""
    from ..tools.convert import _emit_chain, _maf_ext_runs

    def render(rec, k):
        if query_name is not None:
            rec.set_query_idx_byname(query_name)
        vals, lens = _maf_ext_runs(rec)
        out = io.BytesIO()
        _emit_chain(out, rec, k, vals, lens)
        return out.getvalue()

    def emit_merged(w, rec, k, vals, lens):
        _emit_chain(w, rec, k, vals, lens)

    _distributed_maf_records(path, render, emit_merged, writer, query_name)


def dist_output(out, rw):
    """Open the real output on process 0 only; other ranks sink to a
    BytesIO.  Opening on every rank races the overwrite guard: a non-zero
    rank would raise FileReWrite and exit BEFORE its first collective,
    hanging the surviving ranks inside the allgather."""
    import jax

    from ..io.compression import open_output

    if jax.process_index() == 0:
        return open_output(out, rw)
    return io.BytesIO()


def distributed_filter_paf_align_pair(path, writer, min_align_size: int):
    """Multi-process all-to-all filter (reference filter.rs:108-160): the
    keyed-map sum of pass 1 merges via allgather (every process derives
    the identical keep set), pass 2's kept rows gather in range (= file)
    order.  Byte-identical to the serial tool."""
    import jax

    from ..io.paf import PafReader, PafWriter
    from .host_pool import paf_line_ranges

    pid = jax.process_index()
    nproc = jax.process_count()
    ranges = [r for r in paf_line_ranges(path, nproc) if r[0] < r[1]]

    sums = {}
    blob = b""
    if pid < len(ranges):
        lo, hi, _ = ranges[pid]
        with open(path, "rb") as fp:
            fp.seek(lo)
            blob = fp.read(hi - lo)
        for rec in PafReader(io.BytesIO(blob)).records():
            key = (rec.query_name, rec.target_name)
            sums[key] = sums.get(key, 0) + rec.target_align_size

    with stdout_parked():
        partials = _allgather_bytes(pickle.dumps(sums, protocol=4))
        merged = {}
        for p in partials:
            for key, v in pickle.loads(p).items():
                merged[key] = merged.get(key, 0) + v
        keep = {k for k, v in merged.items() if v >= min_align_size}

        out = io.BytesIO()
        if blob:
            paf_writer = PafWriter(out)
            for rec in PafReader(io.BytesIO(blob)).records():
                if (rec.query_name, rec.target_name) in keep:
                    paf_writer.write_record(rec)
        payloads = _allgather_bytes(out.getvalue())
    _merge_chunks_to(writer, payloads, pid)


def distributed_stat_paf(path, writer, each=False):
    """Multi-process `stat -f paf`: line ranges -> local PairStats ->
    allgather -> process 0 writes the merged table (range order = file
    order, so --each rows match the serial tool)."""
    import jax

    from ..io.paf import PafReader
    from ..tools.stat import _stat_from_rec, write_style_result
    from .host_pool import paf_line_ranges

    pid = jax.process_index()
    nproc = jax.process_count()
    ranges = [r for r in paf_line_ranges(path, nproc) if r[0] < r[1]]

    local = []
    if pid < len(ranges):
        lo, hi, _ = ranges[pid]
        with open(path, "rb") as fp:
            fp.seek(lo)
            blob = fp.read(hi - lo)
        local = [
            _stat_from_rec(rec) for rec in PafReader(io.BytesIO(blob)).records()
        ]

    with stdout_parked():
        payloads = _allgather_bytes(pickle.dumps(local, protocol=4))
    if pid != 0:
        return
    merged = []
    for blob in payloads:
        merged.extend(pickle.loads(blob))
    write_style_result(merged, writer, each)


def distributed_dotplot_rows(path, format, mode, no_identity, skip_cutoff,
                             query_name):
    """Multi-process dotplot row collection (the reference rayon sites
    dotplot.rs:236,303-366): contiguous ranges, pooled-worker row logic,
    allgathered; process 0 gets the full row list in serial order, other
    ranks an empty list (they render to a sink)."""
    import jax

    from .host_pool import (
        _PAF_RANGE_WORK,
        _WORK,
        _ranges,
        maf_record_offsets,
        paf_line_ranges,
    )

    pid = jax.process_index()
    nproc = jax.process_count()
    overview = mode == "overview"

    results = []
    if format == "maf":
        from ..io.maf import MafReader

        offsets = maf_record_offsets(path)
        rngs = _ranges(len(offsets), nproc) if offsets else []
        fn = _WORK["dotplot_overview" if overview else "dotplot_base"]
        extra = (
            (no_identity, query_name)
            if overview
            else (skip_cutoff, query_name)
        )
        if pid < len(rngs):
            lo, hi = rngs[pid]
            reader = MafReader.from_path(path)
            for k in range(lo, hi):
                reader.seek(offsets[k])
                rec = reader.next_record()
                if rec is None:
                    break
                results.append(fn(rec, None, k, extra))
    else:
        from ..io.paf import PafReader

        rngs = [r for r in paf_line_ranges(path, nproc) if r[0] < r[1]]
        fn = _PAF_RANGE_WORK[
            "dotplot_overview" if overview else "dotplot_base"
        ]
        extra = no_identity if overview else skip_cutoff
        if pid < len(rngs):
            lo, hi, idx = rngs[pid]
            with open(path, "rb") as fp:
                fp.seek(lo)
                blob = fp.read(hi - lo)
            results = fn(PafReader(io.BytesIO(blob)), io.BytesIO(), idx, extra)

    with stdout_parked():
        payloads = _allgather_bytes(pickle.dumps(results, protocol=4))
    if pid != 0:
        return []
    rows = []
    for blob in payloads:
        part = pickle.loads(blob)
        if format == "maf":
            # same flatten rule as parallel_dotplot_rows: overview rows
            # and PlotSegs bundles append; fallback dict lists extend
            for r in part:
                if overview or not isinstance(r, list):
                    rows.append(r)
                else:
                    rows.extend(r)
        else:
            rows.extend(part)
    return rows
