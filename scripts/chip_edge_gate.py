"""On-silicon edge-shape gate for every Pallas wrapper.

Interpret-mode CI cannot catch Mosaic lowering failures (CLAUDE.md), and
round 4 found a compile-breaking class there: a clamped NON-8-ALIGNED row
tile (`tile_b = min(tile_b, B)` with B=9) failed remote compile on the
liftover kernel while the classify kernels happened to tolerate it.  This
gate sweeps the shape edges on the real chip:

  * odd / prime / sub-8 row counts (1, 3, 9, 12) on every kernel family
  * tiny column counts (8..512) and tiny op tables (4..64)
  * the production fused-adv16-g8 path at odd B

Run after any wrapper/tile change: `python scripts/chip_edge_gate.py`.
Exit 0 = all parities hold on silicon.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from wgatools_tpu.ops.classify import (  # noqa: E402
    classify_stat_jnp,
    classify_stat_pallas,
    classify_stat_pallas_cat,
    classify_stat_pallas_nibbles,
    classify_stat_pallas_words,
    pack_cat_nibbles,
    pack_nibble_words,
)
from wgatools_tpu.ops.fused import classify_liftover_fused_adv16  # noqa: E402
from wgatools_tpu.ops.liftover import (  # noqa: E402
    OP_D,
    OP_I,
    _liftover_scan_impl,
    adv16_odd_offsets,
    chain_scan,
    expand_group_prefix,
    interleave_halves,
    liftover_scan_pallas,
    pack_ops_adv16,
    pack_ops_batch,
    pack_ops_sums,
)

ALPHA = np.frombuffer(b"ACGT-", np.uint8)
OPS5 = np.frombuffer(b"M=XID", np.uint8)
OPS6 = np.frombuffer(b"M=XIDS", np.uint8)


def gate_classify(rng):
    for B in (1, 3, 9, 12):
        for L in (8, 128, 4096):
            t = ALPHA[rng.integers(0, 5, (B, L))]
            q = ALPHA[rng.integers(0, 5, (B, L))]
            lens = jnp.asarray(rng.integers(1, L + 1, B).astype(np.int32))
            tn = np.asarray(t)
            qn = np.asarray(q)
            for b in range(B):
                tn[b, int(lens[b]):] = ord("-")
                qn[b, int(lens[b]):] = ord("-")
            want = np.asarray(
                classify_stat_jnp(jnp.asarray(tn), jnp.asarray(qn), lens)
            )
            got = np.asarray(
                classify_stat_pallas(jnp.asarray(tn), jnp.asarray(qn), lens)
            )
            assert np.array_equal(got, want), ("byte", B, L)
            got = np.asarray(classify_stat_pallas_words(
                jnp.asarray(tn.view("<i4")), jnp.asarray(qn.view("<i4")),
                lens,
            ))
            assert np.array_equal(got, want), ("words", B, L)
            packed = pack_nibble_words(tn, qn)
            got = np.asarray(classify_stat_pallas_nibbles(
                jnp.asarray(packed[0]), jnp.asarray(packed[1]), lens
            ))
            assert np.array_equal(got, want), ("nibble", B, L)
            cw = pack_cat_nibbles(tn, qn)
            for caller in (False, True):
                wantc = want if not caller else np.asarray(
                    classify_stat_jnp(
                        jnp.asarray(tn), jnp.asarray(qn), lens,
                        caller=True,
                    )
                )
                got = np.asarray(classify_stat_pallas_cat(
                    jnp.asarray(cw), lens, caller=caller
                ))
                assert np.array_equal(got, wantc), ("cat", B, L, caller)
    print("classify edge shapes: OK", file=sys.stderr)


def gate_liftover(rng):
    for B in (1, 3, 9, 12):
        for N in (4, 64, 500):
            op_arrays = [OPS6[rng.integers(0, 6, N)] for _ in range(B)]
            len_arrays = [
                rng.integers(0, 50000, N).astype(np.int32) for _ in range(B)
            ]
            ops, lens = pack_ops_batch(op_arrays, len_arrays)
            for sm in ("vpu", "mm"):
                t_p, q_p = liftover_scan_pallas(
                    jnp.asarray(ops), jnp.asarray(lens), scan_mode=sm
                )
                w_t, w_q = _liftover_scan_impl(
                    jnp.asarray(ops), jnp.asarray(lens), True, False
                )
                assert np.array_equal(np.asarray(t_p), np.asarray(w_t)), (
                    B, N, sm, "t")
                assert np.array_equal(np.asarray(q_p), np.asarray(w_q)), (
                    B, N, sm, "q")
            ci, cd = chain_scan(jnp.asarray(ops), jnp.asarray(lens))
            li = np.where(ops == OP_I, lens, 0)
            ld = np.where(ops == OP_D, lens, 0)
            assert np.array_equal(
                np.asarray(ci), (np.cumsum(li, 1) - li).astype(np.int32)
            ), (B, N, "chain i")
            assert np.array_equal(
                np.asarray(cd), (np.cumsum(ld, 1) - ld).astype(np.int32)
            ), (B, N, "chain d")
    print("liftover/chain edge shapes: OK", file=sys.stderr)


def gate_fused_g8(rng):
    for B in (3, 9):
        L = 1 << 15
        t = ALPHA[rng.integers(0, 5, (B, L))]
        q = ALPHA[rng.integers(0, 5, (B, L))]
        lens = jnp.full(B, L, jnp.int32)
        tn, qn = pack_nibble_words(t, q)
        op_arrays = [OPS6[rng.integers(0, 6, 300)] for _ in range(B)]
        len_arrays = [
            rng.integers(0, 8192, 300).astype(np.int32) for _ in range(B)
        ]
        ops, olens = pack_ops_batch(op_arrays, len_arrays)
        wt, wq = pack_ops_adv16(ops, olens)
        st, sq = pack_ops_sums(ops, olens, group=8)
        want = np.asarray(
            classify_stat_jnp(jnp.asarray(t), jnp.asarray(q), lens)
        )
        w_t, w_q = _liftover_scan_impl(
            jnp.asarray(ops), jnp.asarray(olens), False, False
        )
        cw = pack_cat_nibbles(np.asarray(t), np.asarray(q))
        # nibble+mm (r4 production), cat+mm and cat+scan-once (r5
        # production incl. the resident-block layout)
        for label, args, kw in (
            ("nib-mm", (jnp.asarray(tn), jnp.asarray(qn)),
             dict(nibble=True, scan_mode="mm")),
            ("cat-mm", (jnp.asarray(cw), None),
             dict(catmode=True, scan_mode="mm")),
            ("cat-once", (jnp.asarray(cw), None),
             dict(catmode=True, scan_mode="once")),
        ):
            stats, ta, qa = classify_liftover_fused_adv16(
                args[0], args[1], lens,
                jnp.asarray(st), jnp.asarray(sq),
                raw_sums=True, **kw,
            )
            assert np.array_equal(np.asarray(stats), want), (B, label)
            te = expand_group_prefix(np.asarray(ta), wt, group=8)
            qe = expand_group_prefix(np.asarray(qa), wq, group=8)
            gt = interleave_halves(te, adv16_odd_offsets(te, wt))
            gq = interleave_halves(qe, adv16_odd_offsets(qe, wq))
            assert np.array_equal(
                gt[:, : ops.shape[1]], np.asarray(w_t)
            ), (B, label)
            assert np.array_equal(
                gq[:, : ops.shape[1]], np.asarray(w_q)
            ), (B, label)
    print("fused-adv16-g8 edge shapes (nib-mm/cat-mm/cat-once): OK",
          file=sys.stderr)


def main():
    assert jax.default_backend() == "tpu", "edge gate needs the chip"
    rng = np.random.default_rng(0)
    gate_classify(rng)
    gate_liftover(rng)
    gate_fused_g8(rng)
    print("chip edge gate: ALL OK")


if __name__ == "__main__":
    main()
