"""PAF-path variant caller: differential against the MAF path.

For positive-strand records, `call -f paf` (CIGAR-driven, FASTA-backed REF/
ALT) must produce exactly the rows of `call -f maf` on the equivalent MAF
(reference: caller.rs:610-822 mirrors caller.rs:388-608).
"""

import io

import pytest

from synth import make_paf_case

from wgatools_tpu.io.maf import MafReader
from wgatools_tpu.io.paf import PafReader
from wgatools_tpu.tools.caller import call_var_maf, call_var_paf
from wgatools_tpu.tools.convert import paf2maf


def _body(vcf_bytes):
    return [
        l
        for l in vcf_bytes.decode().splitlines()
        if l and not l.startswith("#")
    ]


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("svlen", [0, 5])
def test_paf_caller_matches_maf_caller(tmp_path, seed, svlen):
    paf_line, t_fa, q_fa = make_paf_case(seed, negative=False)
    t_path = tmp_path / "t.fa"
    q_path = tmp_path / "q.fa"
    t_path.write_text(t_fa)
    q_path.write_text(q_fa)

    paf_out = io.BytesIO()
    call_var_paf(
        PafReader(io.BytesIO(paf_line.encode())),
        str(t_path),
        str(q_path),
        paf_out,
        if_snp=True,
        svlen_cutoff=svlen,
    )

    maf_bytes = io.BytesIO()
    paf2maf(
        PafReader(io.BytesIO(paf_line.encode())),
        maf_bytes,
        str(t_path),
        str(q_path),
    )
    maf_out = io.BytesIO()
    call_var_maf(
        MafReader(io.BytesIO(maf_bytes.getvalue())),
        None,
        maf_out,
        if_snp=True,
        if_inv=False,
        svlen_cutoff=svlen,
    )
    assert _body(paf_out.getvalue()) == _body(maf_out.getvalue())


def test_paf_caller_negative_emits_inv(tmp_path):
    paf_line, t_fa, q_fa = make_paf_case(11, negative=True)
    t_path = tmp_path / "t.fa"
    q_path = tmp_path / "q.fa"
    t_path.write_text(t_fa)
    q_path.write_text(q_fa)
    out = io.BytesIO()
    call_var_paf(
        PafReader(io.BytesIO(paf_line.encode())),
        str(t_path),
        str(q_path),
        out,
        if_snp=False,
        svlen_cutoff=0,
    )
    body = _body(out.getvalue())
    # the PAF path always emits the INV record for negative strands
    # (caller.rs:641-657 has no if_inv gate)
    assert body[0].split("\t")[4] == "<INV>"
    assert "SVTYPE=INV" in body[0]
    # nested variants are flagged
    for row in body[1:]:
        if "SVTYPE" in row:
            assert "INV_NEST=TRUE" in row


def test_maf_caller_negative_strand_inv_per_chunk():
    """Negative-strand records emit one INV row per chunk with -i, and
    nested variants carry INV_NEST=TRUE (caller.rs:423-451)."""
    import io as iolib

    t_aln = "ACGT" * 50 + "AAAA" + "ACGT" * 50
    q_aln = "ACGT" * 50 + "----" + "ACGT" * 50
    n_q = sum(1 for c in q_aln if c != "-")
    maf = (
        "#maf version=1.6\n"
        "a score=0\n"
        f"s\tref.chr1\t100\t{len(t_aln)}\t+\t10000\t{t_aln}\n"
        f"s\tqry.chr1\t20\t{n_q}\t-\t5000\t{q_aln}\n\n"
    )
    # chunk_size chosen so no boundary lands exactly on the SV start: the
    # reference's boundary rule would silently drop such an SV via the
    # leading-indel skip (caller.rs:178-199 + 531-535) -- reproduced
    out = iolib.BytesIO()
    call_var_maf(
        MafReader(iolib.BytesIO(maf.encode())),
        None,
        out,
        if_snp=False,
        if_inv=True,
        svlen_cutoff=0,
        chunk_size=150,
    )
    body = [
        l
        for l in out.getvalue().decode().splitlines()
        if l and not l.startswith("#")
    ]
    inv_rows = [r for r in body if "<INV>" in r]
    # 404 columns -> chunks [0,150),[150,204),[204,354),[354,404)
    assert len(inv_rows) == 4
    for r in inv_rows:
        assert r.split("\t")[9].endswith("@N")
    del_rows = [r for r in body if "SVTYPE=DEL" in r]
    assert len(del_rows) == 1
    assert "INV_NEST=TRUE" in del_rows[0]
    # default window: the boundary rule still cuts after the last gap run
    # in each window (caller.rs:188-195), so two chunks -> two INV rows
    out2 = iolib.BytesIO()
    call_var_maf(
        MafReader(iolib.BytesIO(maf.encode())),
        None,
        out2,
        if_snp=False,
        if_inv=True,
        svlen_cutoff=0,
    )
    body2 = [
        l
        for l in out2.getvalue().decode().splitlines()
        if l and not l.startswith("#")
    ]
    assert len([r for r in body2 if "<INV>" in r]) == 2
    # negative-strand QI query offsets derive from per-chunk coordinates
    # (create_chunk_record semantics), so only the decomposition-invariant
    # fields are compared across chunkings
    del2 = [r for r in body2 if "SVTYPE=DEL" in r]
    assert [r.split("\t")[:8] for r in del2] == [
        r.split("\t")[:8] for r in del_rows
    ]


def _naive_paf_rows(paf_line, t_fa_path, q_fa_path, if_snp, svlen_cutoff):
    """Spec oracle: the reference's sequential CIGAR fold
    (caller.rs:640-818), transcribed as plain per-op/per-base loops."""
    import io as iolib

    from wgatools_tpu.io.fasta import FastaReader

    rows = []
    for rec in PafReader(iolib.BytesIO(paf_line.encode())).records():
        t_seq = FastaReader(t_fa_path).fetch(
            rec.target_name, rec.target_start, rec.target_end
        )
        q_seq = FastaReader(q_fa_path).fetch(
            rec.query_name, rec.query_start, rec.query_end
        )
        negative = rec.is_negative
        sfx = "N" if negative else "P"
        init_info = "INV_NEST=TRUE;" if negative else ""
        if negative:
            rows.append(
                f"{rec.target_name}\t{rec.target_start + 1}\t"
                f"{t_seq[0:1].decode().upper()}\t<INV>\t"
                f"SVTYPE=INV;END={rec.target_end}\t"
                f"1|1:{rec.query_name}@{rec.query_start}@{rec.query_end}@{sfx}"
            )
        ops, lens = rec.get_cigar_ops()
        t_pos, q_pos = rec.target_start, rec.query_start
        after_m = False
        for op, ln in zip(ops.tolist(), lens.tolist()):
            ch = chr(op)
            if ch in ("M", "="):
                t_pos += ln
                q_pos += ln
                after_m = True
            elif ch == "X":
                for _ in range(ln):
                    if if_snp:
                        ts = t_pos - rec.target_start
                        qs = q_pos - rec.query_start
                        rows.append(
                            f"{rec.target_name}\t{t_pos + 1}\t"
                            f"{t_seq[ts:ts + 1].decode().upper()}\t"
                            f"{q_seq[qs:qs + 1].decode().upper()}\t.\t"
                            f"1|1:{rec.query_name}@{q_pos}@{sfx}"
                        )
                    t_pos += 1
                    q_pos += 1
                after_m = True
            elif ch == "I":
                if ln > svlen_cutoff and after_m:
                    ts = t_pos - rec.target_start - 1
                    qs = q_pos - rec.query_start - 1
                    rows.append(
                        f"{rec.target_name}\t{t_pos}\t"
                        f"{t_seq[ts:ts + 1].decode().upper()}\t"
                        f"{q_seq[qs:qs + ln + 1].decode().upper()}\t"
                        f"{init_info}SVTYPE=INS;SVLEN={ln};END={t_pos}\t"
                        f"1|1:{rec.query_name}@{q_pos}@{q_pos + ln}@{sfx}"
                    )
                q_pos += ln
                after_m = False
            elif ch == "D":
                if ln > svlen_cutoff and after_m:
                    ts = t_pos - rec.target_start - 1
                    qs = q_pos - rec.query_start - 1
                    rows.append(
                        f"{rec.target_name}\t{t_pos}\t"
                        f"{t_seq[ts:ts + ln + 1].decode().upper()}\t"
                        f"{q_seq[qs:qs + 1].decode().upper()}\t"
                        f"{init_info}SVTYPE=DEL;SVLEN={ln};END={t_pos + ln}\t"
                        f"1|1:{rec.query_name}@{q_pos}@{q_pos}@{sfx}"
                    )
                t_pos += ln
                after_m = False
    return rows


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("negative", [False, True])
@pytest.mark.parametrize("svlen", [0, 4])
def test_paf_caller_matches_naive_oracle(tmp_path, seed, negative, svlen):
    """The vectorized run-table PAF caller must reproduce the sequential
    per-op/per-base oracle field-for-field (r2 rewrite of the interpreted
    loop, VERDICT #5)."""
    paf_line, t_fa, q_fa = make_paf_case(seed, negative=negative)
    t_path = tmp_path / "t.fa"
    q_path = tmp_path / "q.fa"
    t_path.write_text(t_fa)
    q_path.write_text(q_fa)

    out = io.BytesIO()
    call_var_paf(
        PafReader(io.BytesIO(paf_line.encode())),
        str(t_path),
        str(q_path),
        out,
        if_snp=True,
        svlen_cutoff=svlen,
    )
    got = []
    for line in _body(out.getvalue()):
        f = line.split("\t")
        got.append("\t".join([f[0], f[1], f[3], f[4], f[7], f[9]]))
    want = _naive_paf_rows(paf_line, str(t_path), str(q_path), True, svlen)
    assert got == want
    if not negative:
        assert any("\t" in r for r in want)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("if_snp", [True, False])
def test_emit_variant_rows_scalar_vs_vectorized(seed, if_snp):
    """The small-chunk sequential walk and the vectorized run-table scan
    must produce identical row sequences (same interleaving, same bytes
    once flattened) on random run tables, including leading/trailing
    indels, W runs, sub-cutoff events, and zero-length runs (which drive
    after_m without advancing, caller.rs:682-684, 762-766)."""
    import numpy as np

    from wgatools_tpu.core import cigar as C
    from wgatools_tpu.tools.caller import (
        _emit_variant_rows_scalar,
        _emit_variant_rows_vec,
    )

    rng = np.random.default_rng(seed)
    nruns = int(rng.integers(1, 40))
    vals = rng.choice(
        np.array([C.EQ, C.X, C.I, C.D, C.W]), size=nruns,
        p=[0.4, 0.2, 0.15, 0.15, 0.1],
    ).astype(np.uint8)
    lens = rng.integers(0, 12, size=nruns).astype(np.int64)
    svlen = int(rng.integers(0, 4))
    t_len = int(lens[(vals == C.EQ) | (vals == C.X) | (vals == C.D)].sum())
    q_len = int(lens[(vals == C.EQ) | (vals == C.X) | (vals == C.I)].sum())
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    t_str = bases[rng.integers(0, 4, t_len + 2)].tobytes().decode()
    q_str = bases[rng.integers(0, 4, q_len + 2)].tobytes().decode()
    args = (100, 200, t_str, q_str, "chrT", "chrQ", "P", "", if_snp, svlen)

    def flatten(rows):
        # rows are raw bytes (bulk-formatted) or write_record tuples --
        # compare at the OUTPUT-byte level, exactly what VcfWriter emits
        blob = b""
        for r in rows:
            if isinstance(r, (bytes, memoryview)):
                blob += r
            else:
                chrom, pos, ref, alt, info, fmt, sv = r
                info_str = info if info else "."
                blob += (
                    f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t.\t.\t{info_str}\t"
                    f"{fmt}\t{sv}\n"
                ).encode("ascii")
        return blob

    got = _emit_variant_rows_scalar(vals.tolist(), lens.tolist(), *args)
    want = _emit_variant_rows_vec(vals, lens, *args)
    assert flatten(got) == flatten(want)


def test_format_indel_rows_native_vs_python(monkeypatch):
    """The C++ bulk indel formatter and the per-event Python fallback in
    _emit_variant_rows_vec must produce identical output bytes (the
    fallback is forced by patching the native entry to None)."""
    import numpy as np

    from wgatools_tpu import native
    from wgatools_tpu.core import cigar as C
    from wgatools_tpu.tools.caller import _emit_variant_rows_vec

    if native.load() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    nruns = 64
    vals = rng.choice(
        np.array([C.EQ, C.X, C.I, C.D, C.W]), size=nruns,
        p=[0.4, 0.1, 0.2, 0.2, 0.1],
    ).astype(np.uint8)
    lens = rng.integers(1, 30, size=nruns).astype(np.int64)
    t_len = int(lens[(vals == C.EQ) | (vals == C.X) | (vals == C.D)].sum())
    q_len = int(lens[(vals == C.EQ) | (vals == C.X) | (vals == C.I)].sum())
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    t_str = bases[rng.integers(0, 4, t_len + 2)].tobytes().decode()
    q_str = bases[rng.integers(0, 4, q_len + 2)].tobytes().decode()
    for init_info in ("", "INV_NEST=TRUE;"):
        args = (
            100, 200, t_str, q_str, "chrT", "chrQ", "N", init_info,
            True, 2,
        )

        def fmt(rows):
            out = b""
            for r in rows:
                if isinstance(r, (bytes, memoryview)):
                    out += r
                else:
                    chrom, pos, ref, alt, info, f, sv = r
                    out += (
                        f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t.\t.\t"
                        f"{info if info else '.'}\t{f}\t{sv}\n"
                    ).encode("ascii")
            return out

        native_out = fmt(_emit_variant_rows_vec(vals, lens, *args))
        monkeypatch.setattr(
            "wgatools_tpu.native.format_indel_rows",
            lambda *a, **k: None,
        )
        python_out = fmt(_emit_variant_rows_vec(vals, lens, *args))
        monkeypatch.undo()
        assert native_out == python_out
        assert b"SVTYPE=INS" in native_out and b"SVTYPE=DEL" in native_out


def test_format_indel_rows_rejects_out_of_bounds_offsets():
    """Round-4 advisor: a malformed t_off/q_off past the sequence end
    must make the C++ formatter return None (Python fallback takes over)
    -- never memcpy-read out of bounds.  Same for negative anchors."""
    import numpy as np

    from wgatools_tpu import native

    if native.load() is None:
        pytest.skip("native library unavailable")
    tseq = np.frombuffer(b"ACGTACGT", np.uint8)
    qseq = np.frombuffer(b"ACGTACGTACGT", np.uint8)

    def run(t_off, q_off, ln, is_del):
        return native.format_indel_rows(
            b"t", b"q", b"P", b"", tseq, qseq, 0, 0,
            np.array([t_off], np.int64), np.array([q_off], np.int64),
            np.array([ln], np.int64), np.array([is_del], np.uint8),
        )

    # in-bounds sanity
    assert run(4, 4, 3, 1) is not None  # DEL reads tseq[3:7]
    assert run(4, 4, 3, 0) is not None  # INS reads qseq[3:7]
    # DEL whose REF slice runs past tseq end
    assert run(6, 4, 3, 1) is None  # tseq[5:9] > len 8
    # INS whose ALT slice runs past qseq end
    assert run(4, 10, 3, 0) is None  # qseq[9:13] > len 12
    # negative anchors
    assert run(0, 4, 3, 1) is None
    assert run(4, 0, 3, 0) is None


@pytest.mark.parametrize("seed", range(10))
def test_safe_chunk_boundary_native_vs_numpy(seed):
    """The C++ boundary scan must equal the numpy RLE formulation for all
    window/cutoff combinations, including windows ending inside gap runs
    and gap runs reaching EOF."""
    import numpy as np

    from wgatools_tpu import native
    from wgatools_tpu.tools.caller import find_safe_chunk_boundary

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 300))
    alpha = np.frombuffer(b"A-", dtype=np.uint8)
    t = alpha[(rng.random(n) < 0.3).astype(int)]
    q = alpha[(rng.random(n) < 0.3).astype(int)]
    if seed == 0:
        # gap run reaching EOF
        t = np.frombuffer(b"AAAA" + b"-" * 20, dtype=np.uint8).copy()
        q = t.copy()
        n = t.shape[0]
    for cutoff in (0, 1, 3, 10):
        for chunk_size in (1, 5, n // 2 + 1, n, n + 50):
            start = 0
            while start < n:
                got = find_safe_chunk_boundary(
                    t, q, start, chunk_size, cutoff, n
                )
                # numpy reference formulation: non-contiguous views force
                # the fallback branch
                t_nc = np.repeat(t, 2)[::2]
                q_nc = np.repeat(q, 2)[::2]
                assert not t_nc.flags.c_contiguous
                want = find_safe_chunk_boundary(
                    t_nc, q_nc, start, chunk_size, cutoff, n
                )
                nat = native.safe_chunk_boundary(
                    t, q, start, min(start + chunk_size, n), cutoff
                )
                assert got == want == (nat, nat), (
                    seed, cutoff, chunk_size, start,
                )
                if got[1] <= start:
                    break
                start = got[1]


def test_paf_caller_zero_length_leading_op(tmp_path):
    """A degenerate '0=' leading op must not crash or emit an
    invalid-anchor indel row: the zero-length match sets after_m (as the
    reference's fold does, caller.rs:682-684) but the following indel's
    anchor would sit at index -1, where the reference panics on the
    slice underflow (caller.rs:531-535) -- we skip that one event
    (divergence noted in PARITY.md.  Round-4 fuzz/review finding: the
    C++ bulk formatter read tseq[-1] out of bounds here.)"""
    import io as iolib

    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.caller import call_var_paf

    t_seq = "ACGTACGTACGTACGTACGT"
    q_seq = "ACGTACGTACGTAAAAACGTACGTACGTACGT"  # 12 match, 12I? see cg
    # 0= leading (degenerate), then I (would anchor at ts=-1), then real
    cg = "0=12I20="
    q_plain = "GGGGGGGGGGGG" + t_seq
    t_path = tmp_path / "t.fa"
    q_path = tmp_path / "q.fa"
    t_path.write_text(f">t\n{t_seq}\n")
    q_path.write_text(f">q\n{q_plain}\n")
    paf = (
        f"q\t{len(q_plain)}\t0\t{len(q_plain)}\t+\t"
        f"t\t{len(t_seq)}\t0\t{len(t_seq)}\t20\t32\t60\tcg:Z:{cg}\n"
    )
    out = iolib.BytesIO()
    call_var_paf(
        PafReader(iolib.BytesIO(paf.encode())), str(t_path), str(q_path),
        out, if_snp=True, svlen_cutoff=0,
    )
    body = [
        l for l in out.getvalue().decode().splitlines()
        if l and not l.startswith("#")
    ]
    # the leading indel is dropped (no match ran before it); no crash,
    # no negative-anchor garbage row
    assert all("SVTYPE=INS" not in l for l in body), body


def _call_paf_body(tmp_path, cg, t_seq, q_seq, svlen_cutoff=0):
    """Run call_var_paf on one synthetic +strand record; return VCF body
    lines."""
    import io as iolib

    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.caller import call_var_paf

    # unique names per call: FastaReader caches a .fai next to the file,
    # so reusing a path across scenarios would serve stale offsets
    tag = cg.replace("=", "e").replace("I", "i").replace("D", "d")
    t_path = tmp_path / f"t_{tag}.fa"
    q_path = tmp_path / f"q_{tag}.fa"
    t_path.write_text(f">t\n{t_seq}\n")
    q_path.write_text(f">q\n{q_seq}\n")
    paf = (
        f"q\t{len(q_seq)}\t0\t{len(q_seq)}\t+\t"
        f"t\t{len(t_seq)}\t0\t{len(t_seq)}\t1\t1\t60\tcg:Z:{cg}\n"
    )
    out = iolib.BytesIO()
    call_var_paf(
        PafReader(iolib.BytesIO(paf.encode())), str(t_path), str(q_path),
        out, if_snp=False, svlen_cutoff=svlen_cutoff,
    )
    return [
        l for l in out.getvalue().decode().splitlines()
        if l and not l.startswith("#")
    ]


def test_paf_caller_zero_length_ops_drive_after_m(tmp_path):
    """Zero-length ops participate in the after_m state machine exactly
    as the reference's fold does: '0I' clears after_m so '5=0I4D'
    suppresses the DEL (caller.rs:762-766), while '0=' sets it so
    '10=3I0=5D' emits the DEL (caller.rs:682-684).  Round-4 advisor
    finding: dropping all zero-length ops inverted both cases."""
    # 5=0I4D: reference sets after_m=false on the 0I, so the DEL is
    # suppressed
    body = _call_paf_body(
        tmp_path, "5=0I4D", t_seq="ACGTACGTA", q_seq="ACGTA"
    )
    assert all("SVTYPE=DEL" not in l for l in body), body

    # 10=3I0=5D: reference sets after_m=true on the 0=, so the DEL IS
    # emitted (anchor at t index 9 / q index 12)
    t_seq = "ACGTACGTAC" + "TTTTT"
    q_seq = "ACGTACGTAC" + "GGG"
    body = _call_paf_body(tmp_path, "10=3I0=5D", t_seq=t_seq, q_seq=q_seq)
    dels = [l for l in body if "SVTYPE=DEL" in l]
    assert len(dels) == 1, body
    f = dels[0].split("\t")
    # POS = t_start + 10 (1-based anchor at col 10), REF spans anchor+DEL
    assert f[1] == "10"
    assert f[3] == t_seq[9:15]
    assert f[4] == q_seq[12:13]


def test_tokenize_cigar_unicode_fallback_path(monkeypatch):
    """tokenize_cigar must reject U+FFFD as a clean WGAError on BOTH the
    native and the numpy fallback paths (round-4 review: the first fix
    only covered the native call site)."""
    import pytest

    from wgatools_tpu import native
    from wgatools_tpu.core.cigar import tokenize_cigar
    from wgatools_tpu.errors import WGAError

    for force_fallback in (False, True):
        if force_fallback:
            monkeypatch.setattr(native, "available", lambda: False)
        with pytest.raises(WGAError):
            tokenize_cigar("10M�5I")
        monkeypatch.undo()
