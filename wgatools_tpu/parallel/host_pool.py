"""Host-side record parallelism over byte-offset work units.

The reference parallelizes with a rayon thread pool over a record iterator
(reference: src/main.rs:30-32, converter.rs:43, stat.rs:69).  The analog
here is process parallelism over the MAF byte-offset manifest: a cheap raw
line scan finds record start offsets, workers fork and seek to their
assigned ranges, and the parent merges ordered results -- the same
shard-manifest shape used for distributed work claims (SURVEY.md §5).

Only seekable plain files qualify; compressed/stdin inputs fall back to
single-process operation.
"""

import io

import os


def is_plain_seekable(path) -> bool:
    if path is None or path == "-":
        return False
    try:
        with open(path, "rb") as fp:
            magic = fp.read(3)
        return magic[:2] not in (b"\x1f\x8b", b"BZ") and magic != b"\xfd7z"
    except OSError:
        return False


def maf_record_offsets(path):
    """Byte offsets of each record's first s-line (raw scan, no parsing)."""
    offsets = []
    with open(path, "rb", buffering=1 << 20) as fp:
        fp.readline()  # header line is always consumed (maf.rs:25-36)
        in_record = False
        while True:
            off = fp.tell()
            line = fp.readline()
            if not line:
                break
            if line.startswith(b"s"):
                if not in_record:
                    offsets.append(off)
                    in_record = True
            else:
                in_record = False
    return offsets


def _ranges(n_items, n_workers):
    """Split [0, n_items) into at most n_workers contiguous ranges."""
    n_workers = max(1, min(n_workers, n_items))
    base = n_items // n_workers
    rem = n_items % n_workers
    out = []
    start = 0
    for w in range(n_workers):
        size = base + (1 if w < rem else 0)
        out.append((start, start + size))
        start += size
    return out


_WORK = {}


def _worker(args):
    path, offsets, lo, hi, fn_key, extra = args
    from ..io.maf import MafReader

    reader = MafReader.from_path(path)
    records = []
    fn = _WORK[fn_key]
    out = io.BytesIO()
    results = []
    for i in range(lo, hi):
        reader.seek(offsets[i])
        rec = reader.next_record()
        if rec is None:
            break
        results.append(fn(rec, out, i, extra))
    return out.getvalue(), results


def forked_map(fn, args_list, limit=None):
    """Run fn over args_list in forked children, one per item.

    Children exit via os._exit: the axon PJRT client registered at
    interpreter start has multi-second atexit teardown per process, which a
    multiprocessing.Pool pays N x on shutdown; _exit skips atexit entirely.
    Results travel via per-item temp files (no pipe size limits).
    Returns results in args_list order.

    limit=N keeps at most N children alive as a SLIDING window (a new
    child forks as soon as any exits -- no inter-batch barrier, the
    rayon-pool behavior): fan-outs proportional to data (one child per
    target sequence) must not fork unboundedly (round-5 review finding).
    """
    import pickle
    import tempfile
    import warnings

    if len(args_list) == 1:
        return [fn(args_list[0])]

    tmpdir = tempfile.mkdtemp(prefix="wgatpu-pool-")

    def spawn(k, a):
        with warnings.catch_warnings():
            # JAX (RuntimeWarning) and CPython 3.12 (DeprecationWarning)
            # warn about fork in a threaded process; safe here: the
            # parent's threads are idle JAX/runtime housekeeping and
            # children never touch JAX
            warnings.simplefilter("ignore", RuntimeWarning)
            warnings.simplefilter("ignore", DeprecationWarning)
            pid = os.fork()
        if pid == 0:
            status = 1
            try:
                result = fn(a)
                with open(os.path.join(tmpdir, f"{k}.pkl"), "wb") as fp:
                    pickle.dump(result, fp, protocol=4)
                status = 0
            except BaseException:
                # surface the worker's traceback on stderr before
                # _exit(1) -- a bare exit made every parallel-path
                # failure undiagnosable vs the precise -t1 error
                # (round-5 review finding)
                import traceback

                traceback.print_exc()
            finally:
                os._exit(status)
        return pid

    try:
        failed = False
        if limit is None or limit >= len(args_list):
            pids = [spawn(k, a) for k, a in enumerate(args_list)]
            for pid in pids:
                _, status = os.waitpid(pid, 0)
                failed |= os.waitstatus_to_exitcode(status) != 0
        else:
            active = set()
            k_next = 0
            while active or k_next < len(args_list):
                while k_next < len(args_list) and len(active) < limit:
                    active.add(spawn(k_next, args_list[k_next]))
                    k_next += 1
                pid, status = os.wait()
                if pid in active:
                    active.discard(pid)
                    failed |= os.waitstatus_to_exitcode(status) != 0
        if failed:
            raise RuntimeError(
                "parallel worker failed (its traceback is on stderr; "
                "re-run with -t 1 for the serial error)"
            )
        out = []
        for k in range(len(args_list)):
            with open(os.path.join(tmpdir, f"{k}.pkl"), "rb") as fp:
                out.append(pickle.load(fp))
        return out
    finally:
        for k in range(len(args_list)):
            p = os.path.join(tmpdir, f"{k}.pkl")
            if os.path.exists(p):
                os.unlink(p)
        os.rmdir(tmpdir)


def map_maf_records(path, n_workers, fn_key, extra=None):
    """Run _WORK[fn_key](record, out_stream, record_index, extra) over all
    records with n_workers forked processes.  Returns the ordered list of
    (bytes, results) per range."""
    offsets = maf_record_offsets(path)
    if not offsets:
        return []
    ranges = _ranges(len(offsets), n_workers)
    args = [(path, offsets, lo, hi, fn_key, extra) for lo, hi in ranges]
    return forked_map(_worker, args)


# -- registered work functions (must be importable in workers) --


def _work_maf2paf(rec, out, i, extra):
    query_name = extra
    out.write(rec.convert2paf(query_name).to_row())
    return None


def _work_stat(rec, out, i, extra):
    from ..tools.stat import _stat_from_rec

    query_name = extra
    if query_name is not None:
        rec.set_query_idx_byname(query_name)
    return _stat_from_rec(rec)


def _work_call(rec, out, i, extra):
    from ..tools.caller import call_one_record

    if_snp, if_inv, svlen, chunk_size, query_name, query_regex = extra
    call_one_record(
        rec, out, if_snp, if_inv, svlen, chunk_size, query_name, query_regex
    )
    return None


def _work_maf2chain(rec, out, i, extra):
    from ..tools.convert import _emit_chain, _maf_ext_runs

    query_name = extra
    if query_name is not None:
        rec.set_query_idx_byname(query_name)
    vals, lens = _maf_ext_runs(rec)
    # record index as chain_id preserves the serial numbering
    _emit_chain(out, rec, i, vals, lens)
    return None


_WORK["maf2paf"] = _work_maf2paf
_WORK["stat"] = _work_stat
_WORK["call"] = _work_call
_WORK["maf2chain"] = _work_maf2chain


def parallel_maf2paf(path, writer, n_workers, query_name=None):
    for chunk, _ in map_maf_records(path, n_workers, "maf2paf", query_name):
        writer.write(chunk)
    writer.flush()


def paf_line_ranges(path, n_workers):
    """Split a PAF file into line-aligned byte ranges, with the record
    index at each range start (comments/blanks don't count as records)."""
    size = os.path.getsize(path)
    bounds = [0]
    with open(path, "rb", buffering=1 << 20) as fp:
        for w in range(1, n_workers):
            target = size * w // n_workers
            if target <= bounds[-1]:
                continue
            fp.seek(target)
            fp.readline()
            pos = fp.tell()
            if bounds[-1] < pos < size:
                bounds.append(pos)
        bounds.append(size)

        # one pass counting records before each interior boundary
        start_indices = [0]
        fp.seek(0)
        rec_idx = 0
        pos = 0
        b = 1
        while b < len(bounds) - 1:
            line = fp.readline()
            if not line:
                break
            stripped = line.strip()
            if stripped and not stripped.startswith(b"#"):
                rec_idx += 1
            pos += len(line)
            while b < len(bounds) - 1 and pos >= bounds[b]:
                start_indices.append(rec_idx)
                b += 1
    return [
        (bounds[k], bounds[k + 1], start_indices[k])
        for k in range(len(bounds) - 1)
    ]


def _paf2chain_worker(args):
    path, lo, hi, start_index = args
    import io as iolib

    from .. import native
    from ..io.paf import PafReader
    from ..tools.convert import _write_chain_from_ops

    with open(path, "rb") as fp:
        fp.seek(lo)
        blob = fp.read(hi - lo)
    out = iolib.BytesIO()
    for k, record in enumerate(PafReader(iolib.BytesIO(blob)).records()):
        ops, lens = record.get_cigar_ops()
        _write_chain_from_ops(out, native, record, start_index + k, ops, lens)
    return out.getvalue()


def parallel_paf2chain(path, writer, n_workers):
    """PAF -> chain with forked workers over line-aligned byte ranges;
    chain ids continue the serial numbering via per-range record counts."""
    ranges = paf_line_ranges(path, n_workers)
    args = [(path, lo, hi, idx) for lo, hi, idx in ranges if lo < hi]
    for chunk in forked_map(_paf2chain_worker, args):
        writer.write(chunk)
    writer.flush()


def parallel_maf2chain(path, writer, n_workers, query_name=None):
    for chunk, _ in map_maf_records(path, n_workers, "maf2chain", query_name):
        writer.write(chunk)
    writer.flush()


def parallel_stat_maf(path, writer, n_workers, each=False, query_name=None):
    from ..tools.stat import write_style_result

    pair_stats = []
    for _, results in map_maf_records(path, n_workers, "stat", query_name):
        pair_stats.extend(r for r in results if r is not None)
    write_style_result(pair_stats, writer, each)


# records larger than this (bytes) split across workers by chunk-plan
# slices -- the genome-axis sharding rule (SURVEY.md §5): every worker
# derives the same SV-safe plan and claims a contiguous part
SPLIT_BYTES = 32 << 20


def _call_units_worker(args):
    path, offsets, units, params = args
    from ..io.maf import MafReader
    from ..tools.caller import call_record_part

    if_snp, if_inv, svlen, chunk_size, query_name, query_regex = params
    reader = MafReader.from_path(path)
    out = io.BytesIO()
    last_idx = None
    rec = None
    for rec_idx, part, n_parts in units:
        if rec_idx != last_idx:
            reader.seek(offsets[rec_idx])
            rec = reader.next_record()
            last_idx = rec_idx
        if rec is None:
            continue
        call_record_part(
            rec, out, if_snp, if_inv, svlen, chunk_size,
            query_name, query_regex, part, n_parts,
        )
    return out.getvalue()


def _call_split_record(record, n_parts, params):
    """Process one huge parsed record in n_parts forked children.

    The record is parsed ONCE in the parent and inherited copy-on-write by
    the children -- each child claims a contiguous slice of the SV-safe
    chunk plan (call_record_part)."""
    from ..core import cigar as C
    from ..tools.caller import DEFAULT_CHUNK_SIZE, call_record_part, plan_chunks

    if_snp, if_inv, svlen, chunk_size, query_name, query_regex = params
    # select the query row FIRST, mirroring call_record_part's own
    # selection: the plan's SV-safe boundaries depend on the selected
    # pair's gap runs, and planning from the default slines[1] row
    # would split a cutoff-size gap run of the actually-selected query
    # mid-run (round-5 review finding; -tN must stay byte-equal to -t1)
    if len(record.slines) == 1:
        return [b""] * n_parts
    if query_name is not None:
        if record.get_query_idx_byname(query_name) is None:
            return [b""] * n_parts
        record.set_query_idx_byname(query_name)
    elif query_regex is not None:
        try:
            record.set_query_idx_by_regex(query_regex)
        except Exception:
            return [b""] * n_parts
    else:
        record.query_idx = 1
    # the plan is deterministic; compute it once in the parent so the
    # children (which inherit it copy-on-write) skip the full-record scan
    plan = plan_chunks(
        C.seq_bytes(record.target_seq),
        C.seq_bytes(record.query_seq),
        chunk_size or DEFAULT_CHUNK_SIZE,
        svlen,
    )

    def work(part):
        out = io.BytesIO()
        call_record_part(
            record, out, if_snp, if_inv, svlen, chunk_size,
            query_name, query_regex, part, n_parts,
            precomputed_plan=plan,
        )
        return out.getvalue()

    return forked_map(work, list(range(n_parts)))


def parallel_call_maf(
    path,
    writer,
    n_workers,
    mafindex,
    if_snp,
    if_inv,
    svlen,
    sample=None,
    query_name=None,
    query_regex=None,
    chunk_size=None,
):
    """Record- AND genome-axis parallel variant calling: small records map
    whole to workers; records above SPLIT_BYTES shard into chunk-plan
    parts, preserving exact sequential output order."""
    from ..io.vcf import VcfWriter

    vcf = VcfWriter(writer, sample or "sample")
    contigs = None
    if mafindex:
        contigs = [
            (name, item["size"])
            for name, item in mafindex.items()
            if item["isref"]
        ]
    vcf.write_header(contigs)

    offsets = maf_record_offsets(path)
    if not offsets:
        writer.flush()
        return
    sizes = [
        (offsets[i + 1] if i + 1 < len(offsets) else os.path.getsize(path))
        - offsets[i]
        for i in range(len(offsets))
    ]
    params = (if_snp, if_inv, svlen, chunk_size, query_name, query_regex)

    # phases: consecutive small records batch into worker groups; a record
    # above SPLIT_BYTES becomes its own phase, parsed once in the parent
    # and processed COW-forked by plan parts (output order preserved)
    def flush_small(small_range):
        lo, hi = small_range
        if lo >= hi:
            return
        ranges = _ranges(hi - lo, n_workers)
        args = [
            (
                path,
                offsets,
                [(lo + k, 0, 1) for k in range(a, b)],
                params,
            )
            for a, b in ranges
            if a < b
        ]
        for chunk in forked_map(_call_units_worker, args):
            writer.write(chunk)

    from ..io.maf import MafReader

    reader = MafReader.from_path(path)
    small_lo = 0
    for i, sz in enumerate(sizes):
        if sz > SPLIT_BYTES and n_workers > 1:
            flush_small((small_lo, i))
            small_lo = i + 1
            reader.seek(offsets[i])
            record = reader.next_record()
            if record is None:
                continue
            n_parts = min(n_workers, (sz + SPLIT_BYTES - 1) // SPLIT_BYTES)
            for chunk in _call_split_record(record, n_parts, params):
                writer.write(chunk)
    flush_small((small_lo, len(sizes)))
    writer.flush()


# ---------------------------------------------------------------------------
# Generic PAF byte-range map (rayon par_bridge analog for PAF-driven tools:
# reference stat.rs:94, pafcov.rs:31, validate.rs:52, filter.rs:116,
# dotplot.rs:303-366).  Each worker parses a line-aligned byte range and
# returns (emitted bytes, python result); the parent merges in range order,
# which equals serial file order.
# ---------------------------------------------------------------------------

_PAF_RANGE_WORK = {}


def _paf_range_worker(args):
    path, lo, hi, start_index, fn_key, extra = args
    from ..io.paf import PafReader

    with open(path, "rb") as fp:
        fp.seek(lo)
        blob = fp.read(hi - lo)
    out = io.BytesIO()
    fn = _PAF_RANGE_WORK[fn_key]
    result = fn(PafReader(io.BytesIO(blob)), out, start_index, extra)
    return out.getvalue(), result


def map_paf_ranges(path, n_workers, fn_key, extra=None):
    ranges = paf_line_ranges(path, n_workers)
    args = [
        (path, lo, hi, idx, fn_key, extra)
        for lo, hi, idx in ranges
        if lo < hi
    ]
    if not args:
        return []
    return forked_map(_paf_range_worker, args)


def _prw_stat(reader, out, start_index, extra):
    from ..tools.stat import _stat_from_rec

    return [_stat_from_rec(rec) for rec in reader.records()]


def _prw_pafcov(reader, out, start_index, extra):
    from ..tools.pafcov import accumulate_record

    diff_map = {}
    for rec in reader.records():
        accumulate_record(rec, diff_map)
    return diff_map


def _prw_validate(reader, out, start_index, extra):
    from ..io.paf import PafWriter
    from ..tools.validate import Validations, check_record

    fix_flag = extra
    vd = Validations()
    for rec in reader.records():
        check_record(rec, rec.get_stat(), vd, fix_flag)
    if fix_flag:
        paf_writer = PafWriter(out)
        for rec in vd.fix_paf_recs:
            paf_writer.write_record(rec)
        vd.fix_paf_recs = []
    return (
        vd.total,
        vd.query_invalid,
        vd.query_inv_list,
        vd.ref_invalid,
        vd.ref_inv_list,
    )


def _prw_pair_sums(reader, out, start_index, extra):
    sums = {}
    for rec in reader.records():
        key = (rec.query_name, rec.target_name)
        sums[key] = sums.get(key, 0) + rec.target_align_size
    return sums


def _prw_filter_pairs(reader, out, start_index, extra):
    from ..io.paf import PafWriter

    keep_keys = extra
    paf_writer = PafWriter(out)
    for rec in reader.records():
        if (rec.query_name, rec.target_name) in keep_keys:
            paf_writer.write_record(rec)
    return None


def _prw_dotplot_overview(reader, out, start_index, extra):
    from ..tools.dotplot import _overview_row

    no_identity = extra
    return [_overview_row(rec, no_identity) for rec in reader.records()]


def _prw_dotplot_base(reader, out, start_index, extra):
    from .. import native
    from ..tools.dotplot import (
        _paf_runs,
        base_plotdata_from_runs,
        base_plotdata_segments,
    )

    skip_cutoff = extra
    use_native = native.available()
    rows = []
    for rec in reader.records():
        if use_native:
            ops, lens = rec.get_cigar_ops()
            rows.append(base_plotdata_segments(ops, lens, rec, skip_cutoff))
        else:
            rows.extend(
                base_plotdata_from_runs(_paf_runs(rec), rec, skip_cutoff)
            )
    return rows


_PAF_RANGE_WORK["stat"] = _prw_stat
_PAF_RANGE_WORK["pafcov"] = _prw_pafcov
_PAF_RANGE_WORK["validate"] = _prw_validate
_PAF_RANGE_WORK["pair_sums"] = _prw_pair_sums
_PAF_RANGE_WORK["filter_pairs"] = _prw_filter_pairs
_PAF_RANGE_WORK["dotplot_overview"] = _prw_dotplot_overview
_PAF_RANGE_WORK["dotplot_base"] = _prw_dotplot_base


def parallel_stat_paf(path, writer, n_workers, each=False):
    """PAF stat map-reduce (reference: stat.rs:87-105)."""
    from ..tools.stat import write_style_result

    pair_stats = []
    for _, results in map_paf_ranges(path, n_workers, "stat"):
        pair_stats.extend(results)
    write_style_result(pair_stats, writer, each)


def parallel_pafcov(path, writer, n_workers):
    """Coverage map-reduce: per-worker difference arrays summed elementwise
    in the parent (reference: pafcov.rs:29-53).  Target output order equals
    the serial path's first-appearance order because worker dicts preserve
    insertion order and ranges are merged in file order."""
    import numpy as np

    from ..tools.pafcov import write_per_base_bed

    merged = {}
    for _, diff_map in map_paf_ranges(path, n_workers, "pafcov"):
        for target, diff in diff_map.items():
            acc = merged.get(target)
            if acc is None:
                merged[target] = diff
            elif acc.shape[0] >= diff.shape[0]:
                acc[: diff.shape[0]] += diff
            else:
                diff[: acc.shape[0]] += acc
                merged[target] = diff
    for target, diff in merged.items():
        counts = np.cumsum(diff[:-1])
        write_per_base_bed(writer, target, counts)
    writer.flush()


def parallel_validate_paf(path, writer, n_workers, fix_writer=None,
                          fix_flag=False):
    """Validation map-reduce (reference: validate.rs:44-66): counters sum,
    lists and fixed rows concatenate in range (= file) order."""
    from ..tools.validate import Validations

    vd = Validations()
    for chunk, res in map_paf_ranges(path, n_workers, "validate", fix_flag):
        total, q_inv, q_list, r_inv, r_list = res
        vd.total += total
        vd.query_invalid += q_inv
        vd.query_inv_list.extend(q_list)
        vd.ref_invalid += r_inv
        vd.ref_inv_list.extend(r_list)
        if fix_writer is not None:
            fix_writer.write(chunk)
    writer.write((vd.format() + "\n").encode("ascii"))
    if fix_writer is not None:
        fix_writer.flush()
    writer.flush()
    return vd


def parallel_filter_paf_align_pair(path, writer, n_workers,
                                   min_align_size: int):
    """All-to-all filter in two parallel passes (reference: filter.rs:108-160):
    pass 1 sums target_align_size per (query, target) pair, pass 2 re-emits
    records of pairs above the threshold."""
    sums = {}
    for _, partial in map_paf_ranges(path, n_workers, "pair_sums"):
        for key, v in partial.items():
            sums[key] = sums.get(key, 0) + v
    keep = {k for k, v in sums.items() if v >= min_align_size}
    for chunk, _ in map_paf_ranges(path, n_workers, "filter_pairs", keep):
        writer.write(chunk)
    writer.flush()


# -- dotplot: MAF-record work functions for map_maf_records --


def _work_dotplot_overview(rec, out, i, extra):
    from ..tools.dotplot import _overview_row

    no_identity, query_name = extra
    if query_name is not None:
        rec.set_query_idx_byname(query_name)
    return _overview_row(rec, no_identity)


def _work_dotplot_base(rec, out, i, extra):
    from .. import native
    from ..tools.dotplot import (
        _maf_op_arrays,
        _maf_runs,
        base_plotdata_from_runs,
        base_plotdata_segments,
    )

    skip_cutoff, query_name = extra
    if query_name is not None:
        rec.set_query_idx_byname(query_name)
    if native.available():
        ops, lens = _maf_op_arrays(rec)
        return base_plotdata_segments(ops, lens, rec, skip_cutoff)
    return base_plotdata_from_runs(_maf_runs(rec), rec, skip_cutoff)


_WORK["dotplot_overview"] = _work_dotplot_overview
_WORK["dotplot_base"] = _work_dotplot_base


def parallel_dotplot_rows(path, n_workers, format, mode, no_identity,
                          skip_cutoff, query_name):
    """Collect dotplot rows in parallel (reference: dotplot.rs:236,303-366).
    Returns the row list in serial order; rendering stays in the parent."""
    rows = []
    if format == "maf":
        key = "dotplot_overview" if mode == "overview" else "dotplot_base"
        extra = (
            (no_identity, query_name)
            if mode == "overview"
            else (skip_cutoff, query_name)
        )
        for _, results in map_maf_records(path, n_workers, key, extra):
            for r in results:
                if mode == "overview" or not isinstance(r, list):
                    rows.append(r)  # overview row dict or PlotSegs bundle
                else:
                    rows.extend(r)
    else:
        key = "dotplot_overview" if mode == "overview" else "dotplot_base"
        extra = no_identity if mode == "overview" else skip_cutoff
        for _, results in map_paf_ranges(path, n_workers, key, extra):
            rows.extend(results)
    return rows


# -- chain2paf: record-offset parallelism over chain blocks --


def chain_record_offsets(path):
    """Byte offsets of each `chain` header line (raw scan, no parsing)."""
    offsets = []
    with open(path, "rb", buffering=1 << 20) as fp:
        while True:
            off = fp.tell()
            line = fp.readline()
            if not line:
                break
            if line.startswith(b"chain"):
                offsets.append(off)
    return offsets


def _chain2paf_worker(args):
    path, lo_off, hi_off = args
    from ..io.chain import ChainReader
    from ..io.paf import PafWriter

    with open(path, "rb") as fp:
        fp.seek(lo_off)
        blob = fp.read((hi_off - lo_off) if hi_off >= 0 else -1)
    out = io.BytesIO()
    paf_writer = PafWriter(out)
    for record in ChainReader(io.BytesIO(blob)).records():
        paf_writer.write_record(record.convert2paf())
    return out.getvalue()


def parallel_chain2paf(path, writer, n_workers):
    """chain -> PAF with forked workers over whole-record byte ranges
    (reference: converter.rs:391-416, rayon par_bridge)."""
    offsets = chain_record_offsets(path)
    if not offsets:
        writer.flush()
        return
    ranges = _ranges(len(offsets), n_workers)
    size = os.path.getsize(path)
    args = [
        (path, offsets[lo], offsets[hi] if hi < len(offsets) else size)
        for lo, hi in ranges
        if lo < hi
    ]
    for chunk in forked_map(_chain2paf_worker, args):
        writer.write(chunk)
    writer.flush()
