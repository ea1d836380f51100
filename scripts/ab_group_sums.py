"""On-chip gate + A/B: adv16 even-only (g=2) vs raw group-sum anchors
(pack_ops_sums g=4 / g=8) in the fused kernel.

The combined kernel is nearing the HBM streaming roofline; group sums
cut BOTH the op-input and offset-output streams by group/2 x (g=4:
0.0625 B/col each; g=8: 0.03125) and shrink the scan width the same
factor.  Consumers reconstruct per-op offsets with <= group-1 adds from
the pair words they already hold (liftover.expand_group_prefix /
adv16_odd_offsets), which is free inside sequential op walks.

Gate on silicon first, then same-process alternating marginal rates at
the bench production shape.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from wgatools_tpu.ops.classify import (  # noqa: E402
    classify_stat_jnp,
    pack_nibble_words,
)
from wgatools_tpu.ops.fused import classify_liftover_fused_adv16  # noqa: E402
from wgatools_tpu.ops.liftover import (  # noqa: E402
    _liftover_scan_impl,
    adv16_odd_offsets,
    expand_group_prefix,
    interleave_halves,
    pack_ops_adv16,
    pack_ops_sums,
)


def main():
    assert jax.default_backend() == "tpu", "on-chip gate needs the TPU"
    B, L = 128, 1 << 20
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    lens_np = np.full(B, L, np.int32)
    lens_d = jax.device_put(jnp.asarray(lens_np))
    tn, qn = pack_nibble_words(t0, q0)
    tn_d = jax.device_put(jnp.asarray(tn))
    qn_d = jax.device_put(jnp.asarray(qn))

    N_OPS = L // 32
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    ops_np = op_chars[rng.integers(0, 5, size=(B, N_OPS))]
    lens_ops = np.full((B, N_OPS), 32, np.int32)
    wt2, wq2 = pack_ops_adv16(ops_np, lens_ops)
    packs = {"eo": (wt2, wq2)}
    for g in (4, 8):
        packs[f"g{g}"] = pack_ops_sums(ops_np, lens_ops, group=g)
    dev = {
        n: (jax.device_put(jnp.asarray(a)), jax.device_put(jnp.asarray(b)))
        for n, (a, b) in packs.items()
    }

    # ------------------------------------------------------------------
    # ON-CHIP PARITY GATE, ragged lengths at the 8191 bound.
    # ------------------------------------------------------------------
    Ls = 1 << 16
    ts, qs = t0[:, :Ls], q0[:, :Ls]
    tns, qns = pack_nibble_words(ts, qs)
    lens_s = jnp.asarray(np.minimum(lens_np, Ls))
    n_small = 512
    ops_s = op_chars[rng.integers(0, 5, size=(B, n_small))]
    lens_os = rng.integers(0, 8192, size=(B, n_small)).astype(np.int32)
    lens_os[:, :8] = 8191
    wt16s, wq16s = pack_ops_adv16(ops_s, lens_os)
    want_stats = np.asarray(
        classify_stat_jnp(jnp.asarray(ts), jnp.asarray(qs), lens_s)
    )
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops_s), jnp.asarray(lens_os), False, False
        )
    )
    for g in (4, 8):
        st_s, sq_s = pack_ops_sums(ops_s, lens_os, group=g)
        stats, ta, qa = classify_liftover_fused_adv16(
            jnp.asarray(tns), jnp.asarray(qns), lens_s,
            jnp.asarray(st_s), jnp.asarray(sq_s),
            tile_b=64, tile_lw=4096, nibble=True, scan_mode="mm",
            raw_sums=True,
        )
        assert np.array_equal(np.asarray(stats), want_stats), g
        te = expand_group_prefix(np.asarray(ta), wt16s, group=g)
        qe = expand_group_prefix(np.asarray(qa), wq16s, group=g)
        to = adv16_odd_offsets(te, wt16s)
        qo = adv16_odd_offsets(qe, wq16s)
        assert np.array_equal(
            interleave_halves(te, to)[:, :n_small], want_t
        ), g
        assert np.array_equal(
            interleave_halves(qe, qo)[:, :n_small], want_q
        ), g
    print("on-chip group-sum anchors parity gate: OK (g=4, g=8)",
          file=sys.stderr)

    # ------------------------------------------------------------------
    # Same-process alternating A/B at the bench production shape.
    # ------------------------------------------------------------------
    def make_call(raw):
        def call(t, q, wt, wq):
            return classify_liftover_fused_adv16(
                t, q, lens_d, wt, wq, tile_b=64, tile_lw=4096,
                nibble=True, scan_mode="mm", emit_odd=False,
                raw_sums=raw,
            )

        return call

    variants = {
        "eo": make_call(False),
        "g4": make_call(True),
        "g8": make_call(True),
    }

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, wt, wq, iters):
            def body(_, carry):
                t, wt, wq, acc = carry
                outs = call(t, q, wt, wq)
                acc = acc + jnp.sum(outs[0])
                for o in outs[1:]:
                    acc = acc + jnp.sum(o[:, ::512])
                t = t.at[0, 0].set(jnp.int32(0x11111111) + (acc & 3))
                e1 = jnp.int32(1) + (acc & 7)
                wt = wt.at[0, 0].set(e1)
                e2 = jnp.int32(1) + ((acc >> 3) & 7)
                wq = wq.at[0, 0].set(e2)
                return (t, wt, wq, acc)

            _, _, _, acc = lax.fori_loop(
                0, iters, body, (t, wt, wq, jnp.int32(0))
            )
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in variants.items()}
    LO, HI = 4, 44

    def run_batch(n, r, iters):
        wt, wq = dev[n]
        start = time.perf_counter()
        cs = int(np.asarray(r(tn_d, qn_d, wt, wq, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for n, r in runners.items():
        print(f"warm {n}", file=sys.stderr)
        run_batch(n, r, LO)
        run_batch(n, r, HI)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(7):
        for n, r in runners.items():
            lo_t[n].append(run_batch(n, r, LO))
            hi_t[n].append(run_batch(n, r, HI))
        print(f"round {rd} done", file=sys.stderr)

    for n in runners:
        tl, th = min(lo_t[n]), min(hi_t[n])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{n:4s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
