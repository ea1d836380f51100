"""Long-running differential fuzz campaign over the host engines.

Property tests in tests/ cover a handful of seeds each; this campaign
drives the same invariants over thousands of random cases, biased toward
the edges that have historically broken ports of the reference (single
columns, all-indel records, runs crossing every packing boundary,
lowercase/N bases, negative strands, multi-query blocks):

  1. stat pipeline: cigar_from_seqs + RecStat vs the naive spec oracle
     (tests/reference_impl.py) -- C++ SWAR engine vs per-char loops.
  2. maf2paf -> paf2maf(FASTA) -> maf round trip: recovered s-lines must
     equal the originals byte-for-byte (both strands).
  3. call chunked (tiny chunk_size, random) vs unchunked: byte-identical
     VCF bodies for positive strands.
  4. op packings: pack_ops_words16 / pack_ops_adv16 / pack_ops_sums(g)
     reconstructions must equal the 32-bit liftover scan exactly.

Usage: python scripts/fuzz_campaign.py [--iters N] [--seed S]
Prints one PASS/FAIL line per property with case counts; nonzero exit on
any failure.  Results recorded in docs/SCALING.md (round 4).
"""

import argparse
import io
import sys
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import reference_impl as oracle  # noqa: E402

from wgatools_tpu.core import cigar as C  # noqa: E402


def rand_alignment(rng, max_runs=40, alphabet="ACGTNacgtn"):
    """Random gapped alignment pair with edge-case bias."""
    style = rng.integers(0, 6)
    if style == 0:  # single run, possibly single column
        ops = [(str(rng.choice(list("=XID"))), int(rng.integers(1, 4)))]
    elif style == 1:  # long homogeneous '=' with rare X (realistic)
        ops = []
        for _ in range(int(rng.integers(1, 8))):
            ops.append(("=", int(rng.integers(1, 300))))
            ops.append((str(rng.choice(list("XID"))), int(rng.integers(1, 4))))
        ops.append(("=", 1))
    elif style == 2:  # indel storm
        ops = [
            (str(rng.choice(list("ID"))), int(rng.integers(1, 20)))
            for _ in range(int(rng.integers(1, max_runs)))
        ]
        ops.insert(0, ("=", 1))
        ops.append(("=", 1))
    else:
        # synth.random_ops expects a random.Random-style rng; inline a
        # default_rng-compatible equivalent
        ops = []
        prev = None
        for _ in range(int(rng.integers(1, max_runs))):
            op = str(rng.choice(list("=XID")))
            while op == prev:
                op = str(rng.choice(list("=XID")))
            ops.append((op, int(rng.integers(1, 30))))
            prev = op
        ops.insert(0, ("=", int(rng.integers(1, 20))))
        ops.append(("=", int(rng.integers(1, 20))))
    t, q = [], []
    bases = list(alphabet)
    for op, ln in ops:
        for _ in range(ln):
            if op in ("=",):
                b = str(rng.choice(bases))
                t.append(b)
                q.append(b)
            elif op == "X":
                b1 = str(rng.choice(list("ACGT")))
                b2 = str(rng.choice([c for c in "ACGT" if c != b1]))
                t.append(b1)
                q.append(b2)
            elif op == "I":
                t.append("-")
                q.append(str(rng.choice(bases)))
            else:
                t.append(str(rng.choice(bases)))
                q.append("-")
    return "".join(t), "".join(q)


def prop_stat_vs_oracle(rng):
    t, q = rand_alignment(rng)
    # oracle: per-char loops on the uppercased strings (case-insensitive
    # match semantics live in the classify table, so uppercase both)
    want = oracle.cigar_counts(t.upper(), q.upper(), False)
    vals, lens = C.ext_runs(
        np.frombuffer(t.upper().encode(), np.uint8).copy(),
        np.frombuffer(q.upper().encode(), np.uint8).copy(),
    )
    got = dict(match=0, mismatch=0, ins_event=0, ins=0, del_event=0, dele=0)
    for v, ln in zip(vals.tolist(), lens.tolist()):
        if v == C.EQ:
            got["match"] += ln
        elif v == C.X:
            got["mismatch"] += ln
        elif v == C.I:
            got["ins_event"] += 1
            got["ins"] += ln
        elif v == C.D:
            got["del_event"] += 1
            got["dele"] += ln
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k], t, q)


def prop_maf_paf_roundtrip(rng, tmpdir):
    import os

    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.convert import maf2paf, paf2maf

    t_aln, q_aln = rand_alignment(rng, alphabet="ACGT")
    if not t_aln or t_aln[0] == "-" or q_aln[0] == "-" or \
            t_aln[-1] == "-" or q_aln[-1] == "-":
        return  # PAF cannot carry lead/trail indels losslessly here
    negative = bool(rng.integers(0, 2))
    t_plain = t_aln.replace("-", "")
    q_plain = q_aln.replace("-", "")
    t_start = int(rng.integers(0, 50))
    q_start = int(rng.integers(0, 50))
    t_size = t_start + len(t_plain) + int(rng.integers(0, 50))
    q_size = q_start + len(q_plain) + int(rng.integers(0, 50))
    strand = "-" if negative else "+"
    maf = (
        "#maf version=1.6\n"
        "a score=0\n"
        f"s\tref.c\t{t_start}\t{len(t_plain)}\t+\t{t_size}\t{t_aln}\n"
        f"s\tqry.c\t{q_start}\t{len(q_plain)}\t{strand}\t{q_size}\t{q_aln}\n"
        "\n"
    )
    paf_out = io.BytesIO()
    maf2paf(MafReader(io.BytesIO(maf.encode())), paf_out)

    # FASTA backing for paf2maf: plain coordinates
    from synth import revcomp

    t_full = (
        "A" * t_start + t_plain + "A" * (t_size - t_start - len(t_plain))
    )
    if negative:
        # query sequence in the MAF is on the '-' strand: query_start is
        # a reverse-strand offset, the forward FASTA holds the revcomp
        q_fwd_off = q_size - q_start - len(q_plain)
        q_full = (
            "A" * q_fwd_off + revcomp(q_plain)
            + "A" * (q_size - q_fwd_off - len(q_plain))
        )
    else:
        q_full = (
            "A" * q_start + q_plain + "A" * (q_size - q_start - len(q_plain))
        )
    tfa = os.path.join(tmpdir, "t.fa")
    qfa = os.path.join(tmpdir, "q.fa")
    with open(tfa, "w") as f:
        f.write(f">ref.c\n{t_full}\n")
    with open(qfa, "w") as f:
        f.write(f">qry.c\n{q_full}\n")
    for p in (tfa, qfa):
        fai = p + ".fai"
        if os.path.exists(fai):
            os.unlink(fai)

    maf_back = io.BytesIO()
    paf2maf(
        PafReader(io.BytesIO(paf_out.getvalue())), maf_back, tfa, qfa
    )
    want_s = [
        line for line in maf.upper().splitlines() if line.startswith("S\t")
    ]
    got_s = [
        line
        for line in maf_back.getvalue().decode().upper().splitlines()
        if line.startswith("S\t")
    ]
    assert got_s == want_s, (maf, maf_back.getvalue().decode())


def prop_call_chunked(rng):
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.tools.caller import call_var_maf

    t_aln, q_aln = rand_alignment(rng, alphabet="ACGT")
    if not t_aln:
        return
    t_plain = t_aln.replace("-", "")
    q_plain = q_aln.replace("-", "")
    maf = (
        "#maf version=1.6\n"
        "a score=0\n"
        f"s\tref.c\t100\t{len(t_plain)}\t+\t100000\t{t_aln}\n"
        f"s\tqry.c\t200\t{len(q_plain)}\t+\t100000\t{q_aln}\n\n"
    )

    cutoff = int(rng.integers(0, 4))
    cs = int(rng.integers(8, 64))

    def run(chunk_size):
        out = io.BytesIO()
        call_var_maf(
            MafReader(io.BytesIO(maf.encode())), None, out,
            if_snp=True, if_inv=True, svlen_cutoff=cutoff,
            chunk_size=chunk_size,
        )
        return out.getvalue()

    whole = run(None)
    tiny = run(cs)
    # Reference quirk, reproduced on purpose: a chunk boundary landing
    # exactly on a gap-run start silently drops that SV via the
    # leading-indel skip (caller.rs:178-199 + 531-535; see
    # test_maf_caller_negative_strand_inv_per_chunk).  Equality only
    # holds when no planned boundary starts on a gap column.
    from wgatools_tpu.tools.caller import plan_chunks

    t_arr = np.frombuffer(t_aln.encode(), np.uint8)
    q_arr = np.frombuffer(q_aln.encode(), np.uint8)
    gap = ord("-")
    plan = plan_chunks(t_arr, q_arr, cs, cutoff)
    boundary_on_sv = any(
        s > 0 and (t_arr[s] == gap or q_arr[s] == gap) for s, _ in plan
    )
    if boundary_on_sv:
        # weaker invariant: chunking only ever DROPS whole indel rows
        wl = set(whole.splitlines())
        for line in tiny.splitlines():
            assert line in wl, (maf, line)
    else:
        assert whole == tiny, (maf, whole[:400], tiny[:400])


def prop_op_packings(rng):
    import jax.numpy as jnp

    from wgatools_tpu.ops.liftover import (
        _liftover_scan_impl,
        adv16_odd_offsets,
        expand_group_prefix,
        interleave_halves,
        pack_ops_adv16,
        pack_ops_batch,
        pack_ops_sums,
    )

    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    B = int(rng.integers(1, 5))
    op_arrays, len_arrays = [], []
    for _ in range(B):
        n = int(rng.integers(1, 300))
        op_arrays.append(op_chars[rng.integers(0, 6, n)])
        ls = rng.integers(0, 8192, n).astype(np.int32)
        k = min(n, 4)
        ls[rng.integers(0, n, k)] = 8191  # boundary lengths
        len_arrays.append(ls)
    ops, lens = pack_ops_batch(op_arrays, len_arrays)
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(lens), False, False
        )
    )
    wt, wq = pack_ops_adv16(ops, lens)
    te = np.cumsum(np.concatenate(
        [np.zeros((wt.shape[0], 1), np.int64), wt & 0x3FFF], axis=1
    ), axis=1)[:, :-1].astype(np.int32)
    qe = np.cumsum(np.concatenate(
        [np.zeros((wq.shape[0], 1), np.int64), wq & 0x3FFF], axis=1
    ), axis=1)[:, :-1].astype(np.int32)
    got_t = interleave_halves(te, adv16_odd_offsets(te, wt))[:, : ops.shape[1]]
    got_q = interleave_halves(qe, adv16_odd_offsets(qe, wq))[:, : ops.shape[1]]
    assert np.array_equal(got_t, want_t)
    assert np.array_equal(got_q, want_q)
    for g in (2, 4, 8):
        st, sq = pack_ops_sums(ops, lens, group=g)
        assert st.max(initial=0) < (1 << 16)
        at = np.cumsum(np.concatenate(
            [np.zeros((st.shape[0], 1), np.int64), st], axis=1
        ), axis=1)[:, :-1].astype(np.int32)
        aq = np.cumsum(np.concatenate(
            [np.zeros((sq.shape[0], 1), np.int64), sq], axis=1
        ), axis=1)[:, :-1].astype(np.int32)
        ge = expand_group_prefix(at, wt, group=g)
        gq = expand_group_prefix(aq, wq, group=g)
        gt = interleave_halves(ge, adv16_odd_offsets(ge, wt))[:, : ops.shape[1]]
        gqf = interleave_halves(gq, adv16_odd_offsets(gq, wq))[:, : ops.shape[1]]
        assert np.array_equal(gt, want_t), g
        assert np.array_equal(gqf, want_q), g


def prop_cat_plane(rng):
    """Round 5: the host 64K-LUT category packing + cat kernel must
    match the jnp oracle on ARBITRARY byte pairs (the LUT is total --
    IUPAC codes, junk bytes, anything), both category tables, through
    the interpret-mode kernel."""
    import jax.numpy as jnp

    from wgatools_tpu.ops.classify import (
        classify_stat_jnp,
        classify_stat_pallas_cat,
        pack_cat_nibbles,
        pack_pairs,
    )

    B = int(rng.integers(1, 5))
    pairs = []
    for _ in range(B):
        n = int(rng.integers(1, 500))
        profile = rng.integers(0, 3)
        if profile == 0:
            alpha = np.frombuffer(b"ACGT-", np.uint8)
            t = alpha[rng.integers(0, 5, n)]
            q = alpha[rng.integers(0, 5, n)]
        elif profile == 1:
            # arbitrary bytes (no dictionary!) -- '-' sprinkled in
            t = rng.integers(1, 256, n).astype(np.uint8)
            q = rng.integers(1, 256, n).astype(np.uint8)
            t[rng.random(n) < 0.2] = ord("-")
            q[rng.random(n) < 0.2] = ord("-")
        else:
            alpha = np.frombuffer(b"A-", np.uint8)
            t = alpha[(rng.random(n) < 0.5).astype(int)]
            q = alpha[(rng.random(n) < 0.5).astype(int)]
        pairs.append((t.tobytes(), q.tobytes()))
    t, q, lens = pack_pairs(pairs)
    cw = pack_cat_nibbles(t, q)
    assert cw is not None
    for caller in (False, True):
        want = np.asarray(
            classify_stat_jnp(
                jnp.asarray(t), jnp.asarray(q), jnp.asarray(lens),
                caller=caller,
            )
        )
        got = np.asarray(
            classify_stat_pallas_cat(
                jnp.asarray(cw), jnp.asarray(lens),
                tile_b=2, tile_lw=32, interpret=True, caller=caller,
            )
        )
        assert np.array_equal(got, want), caller


def _corrupt(rng, blob: bytes) -> bytes:
    """Random byte-level corruption: truncation, splice, byte flips,
    field deletion, junk insertion."""
    b = bytearray(blob)
    for _ in range(int(rng.integers(1, 4))):
        style = int(rng.integers(0, 5))
        if not b:
            break
        if style == 0:  # truncate
            b = b[: int(rng.integers(0, len(b)))]
        elif style == 1:  # flip bytes
            for _ in range(int(rng.integers(1, 8))):
                i = int(rng.integers(0, len(b)))
                b[i] = int(rng.integers(0, 256))
        elif style == 2:  # delete a span
            i = int(rng.integers(0, len(b)))
            j = min(len(b), i + int(rng.integers(1, 40)))
            del b[i:j]
        elif style == 3:  # insert junk
            i = int(rng.integers(0, len(b)))
            b[i:i] = bytes(rng.integers(0, 256, int(rng.integers(1, 20))))
        else:  # duplicate a span
            i = int(rng.integers(0, len(b)))
            j = min(len(b), i + int(rng.integers(1, 40)))
            b[i:i] = b[i:j]
    return bytes(b)


def prop_parser_robustness(rng):
    """Corrupted MAF/PAF/chain inputs must either parse or raise a clean
    WGAError -- never an unhandled IndexError/ValueError/KeyError/etc.
    (the CLI maps WGAError to exit 1 with a message; anything else would
    be a traceback in a user's face)."""
    from wgatools_tpu.errors import WGAError
    from wgatools_tpu.io.chain import ChainReader
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.io.paf import PafReader

    t_aln, q_aln = rand_alignment(rng, alphabet="ACGT")
    if not t_aln:
        return
    maf = (
        "#maf version=1.6\na score=0\n"
        f"s\tref.c\t10\t{len(t_aln.replace('-', ''))}\t+\t100000\t{t_aln}\n"
        f"s\tqry.c\t20\t{len(q_aln.replace('-', ''))}\t+\t100000\t{q_aln}\n\n"
    ).encode()
    paf = (
        "q\t500\t0\t400\t+\tt\t600\t0\t450\t380\t460\t60\t"
        "cg:Z:100=5I200=10D100=\n"
    ).encode()
    chain = (
        "chain 4900 t 600 + 0 450 q 500 + 0 400 1\n100\t10\t5\n300\n\n"
    ).encode()
    for reader_cls, blob in (
        (MafReader, maf), (PafReader, paf), (ChainReader, chain),
    ):
        bad = _corrupt(rng, blob)
        try:
            for rec in reader_cls(io.BytesIO(bad)).records():
                # drive the record's compute accessors too: corrupt cg
                # strings flow through the C++ CIGAR tokenizer, corrupt
                # seqs through classify+RLE
                for attr in ("get_stat", "get_cigar_ops", "get_cigar"):
                    fn = getattr(rec, attr, None)
                    if fn is not None:
                        try:
                            fn()
                        except WGAError:
                            pass
        except WGAError:
            pass  # clean, user-facing failure
        # silent acceptance of a mutated-but-well-formed file is fine


def prop_extras(rng):
    """Differential: vectorized paf2blocks vs the naive per-unit fold
    oracle (blocks_rows); trimovp invariants: output is a subset of the
    input rows, per-(target, query) group sorted by target_start and
    pairwise non-overlapping, and the sweep is idempotent."""
    from wgatools_tpu.io.paf import PafReader
    from wgatools_tpu.tools.convert import paf2blocks
    from wgatools_tpu.tools.trimovp import trim_ovp

    lines = []
    per_rec_oracle = []
    for _ in range(int(rng.integers(1, 8))):
        t, q = rand_alignment(rng, max_runs=12)
        cg = oracle.cigar_string(t, q)
        runs = oracle.tokenize(cg)
        qadv = sum(n for op, n in runs if op in "M=XI")
        tadv = sum(n for op, n in runs if op in "M=XD")
        qs = int(rng.integers(0, 1000))
        ts = int(rng.integers(0, 1000))
        qn = f"q{int(rng.integers(1, 4))}"
        tn = f"t{int(rng.integers(1, 3))}"
        strand = str(rng.choice(["+", "-"]))
        lines.append(
            f"{qn}\t{qs + qadv + 10}\t{qs}\t{qs + qadv}\t{strand}\t"
            f"{tn}\t{ts + tadv + 10}\t{ts}\t{ts + tadv}\t"
            f"{qadv}\t{max(qadv, tadv)}\t60\tcg:Z:{cg}\n"
        )
        per_rec_oracle.append(
            (qn, tn, strand, oracle.blocks_rows(runs, qs, ts))
        )

    text = "".join(lines).encode()
    out = io.BytesIO()
    paf2blocks(PafReader(io.BytesIO(text)), out)
    got = out.getvalue().decode().splitlines()[1:]  # drop header
    want = []
    for qn, tn, strand, rows in per_rec_oracle:
        for qs_, qe_, ts_, te_ in rows:
            want.append(f"{qn}\t{qs_}\t{qe_}\t{tn}\t{ts_}\t{te_}\t{strand}")
    assert got == want, f"paf2blocks mismatch:\n{got}\nvs\n{want}"

    out = io.BytesIO()
    trim_ovp(PafReader(io.BytesIO(text)), out)
    kept = out.getvalue().decode().splitlines()
    inputs = [ln.rstrip("\n") for ln in lines]
    assert all(k in inputs for k in kept), "trimovp minted a record"
    groups = {}
    for k in kept:
        f = k.split("\t")
        groups.setdefault((f[5], f[0]), []).append(
            (int(f[7]), int(f[8]))
        )
    for spans in groups.values():
        assert spans == sorted(spans), "group not sorted by target_start"
        for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
            assert s1 >= e0, f"overlap survived: {(s0, e0)} {(s1, e1)}"
    out2 = io.BytesIO()
    trim_ovp(PafReader(io.BytesIO(out.getvalue())), out2)
    assert out2.getvalue() == out.getvalue(), "trimovp not idempotent"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import tempfile

    props = {
        "stat_vs_oracle": prop_stat_vs_oracle,
        "maf_paf_roundtrip": None,  # needs tmpdir, bound below
        "call_chunked": prop_call_chunked,
        "op_packings": prop_op_packings,
        "cat_plane": prop_cat_plane,
        "parser_robustness": prop_parser_robustness,
        "extras": prop_extras,
    }
    failures = 0
    with tempfile.TemporaryDirectory() as td:
        props["maf_paf_roundtrip"] = lambda r: prop_maf_paf_roundtrip(r, td)
        for name, prop in props.items():
            rng = np.random.default_rng(args.seed)
            n_iters = (
                args.iters // 10
                if name in ("op_packings", "cat_plane")
                else args.iters
            )
            ok = 0
            try:
                for _ in range(n_iters):
                    prop(rng)
                    ok += 1
                print(f"PASS {name}: {ok} cases")
            except AssertionError:
                failures += 1
                print(f"FAIL {name} after {ok} cases:")
                traceback.print_exc(limit=3)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
