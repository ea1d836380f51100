"""Format converters (reference: src/converter.rs).

Each direction streams records through the columnar CIGAR engine; the
classify/RLE work runs on packed uint8 arrays (and on the device for batch
paths, see wgatools_tpu.ops) instead of the reference's per-char Rust loops.
"""

import numpy as np

from ..core import cigar as C
from ..core.strand import Strand
from ..errors import WGAError
from ..io.chain import (
    ChainReader,
    chain_header_from_record,
    write_chain_record,
)
from ..io.fasta import FastaReader
from ..io.maf import MafReader, MafRecord, MafSLine, MafWriter
from ..io.paf import PafReader, PafWriter


def maf2paf(mafreader: MafReader, writer, query_name=None, device=None):
    """MAF -> PAF (reference: converter.rs:29-54).

    device=None auto-selects the device pipeline on TPU backends: column
    batches classify + run-length-encode on device, only the run table
    returns, and the host formats PAF rows (SURVEY.md §3.1).  Host and
    device paths are byte-identical (tested).
    """
    from ..tools.stat import _device_requested

    if not _device_requested(device):
        paf_writer = PafWriter(writer)
        for record in mafreader.records():
            paf_writer.write_record(record.convert2paf(query_name))
        writer.flush()
        return
    _maf2paf_device(mafreader, writer, query_name)


def _maf2paf_device(mafreader: MafReader, writer, query_name=None):
    paf_writer = PafWriter(writer)

    def emit(rec, _idx, vals, lens):
        cigar = C.cigar_from_runs(vals, lens, rec.is_negative)
        paf_writer.write_record(_paf_from_cigar(rec, cigar))

    _batched_ext_runs(mafreader, query_name, emit)
    writer.flush()


def _paf_from_cigar(record: MafRecord, cigar):
    """PafRecord fields from a Cigar (maf.rs:484-520 body)."""
    from ..io.paf import PafRecord

    matches = cigar.match_count
    block_length = (
        cigar.match_count
        + cigar.mismatch_count
        + cigar.ins_count
        + cigar.inv_ins_count
        + cigar.del_count
        + cigar.inv_del_count
    )
    edit_dist = block_length - matches
    return PafRecord(
        query_name=record.query_name,
        query_length=record.query_length,
        query_start=record.query_start,
        query_end=record.query_end,
        strand=record.query_strand,
        target_name=record.target_name,
        target_length=record.target_length,
        target_start=record.target_start,
        target_end=record.target_end,
        matches=matches,
        block_length=block_length,
        mapq=255,
        tags=[f"NM:i:{edit_dist}", "cg:Z:" + cigar.cigar_string],
    )


def _maf_ext_runs(record: MafRecord):
    return C.ext_runs(
        C.seq_bytes(record.target_seq), C.seq_bytes(record.query_seq)
    )


_EXT2OP = np.zeros(5, dtype=np.uint8)
_EXT2OP[C.EQ] = C.OP_EQ
_EXT2OP[C.X] = C.OP_X
_EXT2OP[C.I] = C.OP_I
_EXT2OP[C.D] = C.OP_D


def maf2chain(mafreader: MafReader, writer, query_name=None, device=None):
    """MAF -> chain (reference: converter.rs:57-92): header via the ext-mode
    trim rule, data lines via M-merged runs, auto-increment chain ids.

    The device path classifies + run-length-encodes column batches on the
    TPU (same pipeline as maf2paf); trims/merging/chain emission work on
    the small run tables host-side."""
    from ..core.device import device_requested

    if not device_requested(device):
        for chain_id, record in enumerate(mafreader.records()):
            if query_name is not None:
                record.set_query_idx_byname(query_name)
            vals, lens = _maf_ext_runs(record)
            _emit_chain(writer, record, chain_id, vals, lens)
        writer.flush()
        return
    _batched_ext_runs(
        mafreader,
        query_name,
        lambda record, chain_id, vals, lens: _emit_chain(
            writer, record, chain_id, vals, lens
        ),
    )
    writer.flush()


def _emit_chain(writer, record, chain_id, vals, lens):
    from .. import native

    _write_chain_from_ops(writer, native, record, chain_id, _EXT2OP[vals],
                          lens)


def _batched_ext_runs(mafreader, query_name, emit, batch_columns=64 << 20):
    """Stream records through the device run-extraction pipeline, calling
    emit(record, index, run_vals, run_lens) in input order."""
    from ..core.device import DEVICE_MIN_COLUMNS
    from ..core.metrics import METRICS
    from ..ops.classify import pack_pairs
    from ..ops.rle_device import batch_runs

    pending = []
    max_len = 0
    next_index = 0

    def flush():
        nonlocal max_len, next_index
        if not pending:
            return
        total_cols = sum(len(r.target_seq) for r in pending)
        if total_cols < DEVICE_MIN_COLUMNS:
            # too small to amortize device dispatch
            for rec in pending:
                vals, lens = _maf_ext_runs(rec)
                emit(rec, next_index, vals, lens)
                next_index += 1
            pending.clear()
            max_len = 0
            return
        with METRICS.stage("pack", total_cols * 2):
            t, q, lens = pack_pairs(
                [(r.target_seq, r.query_seq) for r in pending]
            )
        with METRICS.stage("device_rle", t.nbytes * 2):
            row_ids, cats, run_lens = batch_runs(t, q, lens)
        splits = np.searchsorted(row_ids, np.arange(1, len(pending)))
        for rec, vals, lens_k in zip(
            pending,
            np.split(cats.astype(np.uint8), splits),
            np.split(run_lens.astype(np.int64), splits),
        ):
            emit(rec, next_index, vals, lens_k)
            next_index += 1
        pending.clear()
        max_len = 0

    for record in mafreader.records():
        if query_name is not None:
            record.set_query_idx_byname(query_name)
        n = len(record.target_seq)
        new_max = max(max_len, n)
        if pending and new_max * (len(pending) + 1) > batch_columns:
            flush()
            new_max = n
        max_len = new_max
        pending.append(record)
    flush()


def paf2chain(pafreader: PafReader, writer):
    """PAF -> chain (reference: converter.rs:148-173).

    The per-record body (trims + cigar_unit_chain state machine + data-line
    emission) runs as ONE fused native pass when available."""
    from .. import native

    use_native = native.available()
    for chain_id, record in enumerate(pafreader.records()):
        if use_native:
            raw = C.strip_cg_prefix(record.get_cigar_string()).encode("ascii")
            try:
                blk = native.cigar_text_to_chain_block(raw)
            except ValueError as e:
                kind, val = e.args[0]
                if kind == "op":
                    raise C.CigarOpInvalid(val) from None
                C.raise_tokenize_error(raw, val)
            if blk is not None:
                _emit_chain_block(writer, record, chain_id, blk)
                continue
        ops, lens = record.get_cigar_ops()
        _write_chain_from_ops(writer, native, record, chain_id, ops, lens)
    writer.flush()


def _emit_chain_block(writer, record, chain_id, blk):
    text, head_ins, head_del, tail_ins, tail_del, final_size = blk
    header = chain_header_from_record(
        record, head_ins, head_del, tail_ins, tail_del
    )
    header.chain_id = chain_id
    writer.write(header.format().encode("ascii"))
    writer.write(text)
    writer.write(f"\n{final_size}\n\n".encode("ascii"))


def _write_chain_from_ops(writer, native, record, chain_id, ops, lens):
    """Emit one chain record from CIGAR op arrays: fused native path with
    a vectorized-numpy fallback."""
    try:
        blk = native.ops_to_chain_block(ops, lens)
    except ValueError as e:
        raise C.CigarOpInvalid(e.args[0]) from None
    if blk is not None:
        _emit_chain_block(writer, record, chain_id, blk)
        return
    trims = C.trims_from_ops(ops, lens)
    header = chain_header_from_record(record, *trims)
    header.chain_id = chain_id
    sizes, dqs, dts, final_size = C.chain_line_arrays_from_ops(ops, lens)
    write_chain_record(writer, header, (sizes, dqs, dts), final_size)


def chain2paf(chainreader: ChainReader, writer):
    """chain -> PAF (reference: converter.rs:391-416)."""
    paf_writer = PafWriter(writer)
    for record in chainreader.records():
        paf_writer.write_record(record.convert2paf())
    writer.flush()


def _seq_record_to_maf(
    rec, score, t_reader: FastaReader, q_reader: FastaReader, gap_insert
):
    """Shared paf2maf / chain2maf body (reference: converter.rs:176-357)."""
    t_name = rec.target_name
    t_start = rec.target_start
    t_size = rec.target_length
    t_alilen = rec.target_end - t_start
    q_name = rec.query_name
    q_strand = rec.query_strand
    q_size = rec.query_length
    q_alilen = rec.query_end - rec.query_start
    # negative strand: MAF start is counted from the reverse end
    if q_strand == Strand.NEGATIVE:
        q_start_field = q_size - rec.query_end
    else:
        q_start_field = rec.query_start

    whole_t = t_reader.fetch(t_name, t_start, rec.target_end - 1)
    whole_q = q_reader.fetch(q_name, rec.query_start, rec.query_end - 1)
    if q_strand == Strand.NEGATIVE:
        whole_q = C.reverse_complement(whole_q)
    t_gapped, q_gapped = gap_insert(whole_t, whole_q)

    t_sline = MafSLine(
        mode="s",
        name=t_name,
        start=t_start,
        align_size=t_alilen,
        strand=rec.target_strand,
        size=t_size,
        seq=t_gapped,
    )
    q_sline = MafSLine(
        mode="s",
        name=q_name,
        start=q_start_field,
        align_size=q_alilen,
        strand=q_strand,
        size=q_size,
        seq=q_gapped,
    )
    return MafRecord(score=score, slines=[t_sline, q_sline], query_idx=1)


def paf2maf(pafreader: PafReader, writer, t_fa_path: str, q_fa_path: str):
    """PAF -> MAF with sequences from indexed FASTA
    (reference: converter.rs:176-265)."""
    t_reader = FastaReader(t_fa_path)
    q_reader = FastaReader(q_fa_path)
    maf_writer = MafWriter(writer)
    maf_writer.write_header(
        f"#maf version=1.6 convert_from=paf t_seq_path={t_fa_path} "
        f"q_seq_path={q_fa_path}"
    )
    for rec in pafreader.records():
        ops, lens = rec.get_cigar_ops()

        def gap_insert(t_raw, q_raw, _ops=ops, _lens=lens):
            return C.insert_gaps_by_ops(_ops, _lens, t_raw, q_raw)

        maf_writer.write_record(
            _seq_record_to_maf(rec, rec.mapq, t_reader, q_reader, gap_insert)
        )
    writer.flush()


def chain2maf(chainreader: ChainReader, writer, t_fa_path: str, q_fa_path: str):
    """chain -> MAF (reference: converter.rs:268-357)."""
    t_reader = FastaReader(t_fa_path)
    q_reader = FastaReader(q_fa_path)
    maf_writer = MafWriter(writer)
    maf_writer.write_header(
        f"#maf version=1.6 convert_from=chain t_seq_path={t_fa_path} "
        f"q_seq_path={q_fa_path}"
    )
    from .. import native

    use_native = native.available()
    for rec in chainreader.records():
        if rec.sizes.shape[0] == 0:
            raise WGAError("chain record has no data lines")

        # per line: copy `size`, then target gaps (dt), then query gaps
        # (dq) -- exactly the interleaved op order of op_arrays().  Hot
        # path feeds the data-line arrays straight to C++ (no op array
        # materialization); differential-tested vs the ops formulation.
        def gap_insert(t_raw, q_raw, _rec=rec):
            if use_native:
                res = native.chain_insert_gaps(
                    _rec.sizes, _rec.dqs, _rec.dts, t_raw, q_raw
                )
                if res is not None:
                    return res
            ops, lens = _rec.op_arrays()
            return C.insert_gaps_by_ops(ops, lens, t_raw, q_raw)

        maf_writer.write_record(
            _seq_record_to_maf(rec, 255, t_reader, q_reader, gap_insert)
        )
    writer.flush()


def maf2sam(mafreader: MafReader, writer):
    """DEV stub, surface parity only: the reference writes a hard-coded
    noodles example header and one unmapped record, ignoring the input
    (reference: converter.rs:94-125)."""
    writer.write(
        b"@HD\tVN:1.6\tSO:unsorted\n"
        b"@SQ\tSN:sq0\tLN:8\n"
        b"@SQ\tSN:sq1\tLN:13\n"
        b"@SQ\tSN:sq2\tLN:21\n"
        b"@PG\tID:noodles-sam\n"
        b"@CO\tan example SAM written by noodles-sam\n"
        b"sq2\t4\t*\t0\t255\t*\t*\t0\t0\t*\t*\n"
    )
    writer.flush()
