"""On-chip gate + A/B: adv16+mm production kernel option sweep.

Round-4 state: advmm (advance-packed ops, MXU triangle scan) runs the
bench at ~446 Gbp/s vs a ~534 Gcol/s classify-only control -- the
remaining op-scan cost is op-input DMA (2 words/pair), the 4 limb
converts, and the 4 offset-output stores.  Candidates:

  base     advmm as shipped (emit_odd, full-triangle scan, tb=64, lw=4096)
  eo       emit_odd=False: skip the to/qo stores (consumers derive
           odd = even + (w >> 14) inline -- liftover.adv16_odd_offsets);
           halves offset-output DMA and drops 2 adds + 2 stores
  c128     chunk=128 two-level triangle: 4x fewer MACs, 16x smaller
           resident triangle (32 KB vs 512 KB VMEM)
  eoc128   both
  tb128    tile_b=128 (one row block; halves per-column grid overhead)
  lw2048   tile_lw=2048 (16 grid steps; smaller tiles, more pipelining)

Gate first on silicon (CLAUDE.md rule), then same-process alternating
marginal rates at the bench production shape.
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
    interleave_halves,
    pack_ops_adv16,
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
    wt_np, wq_np = pack_ops_adv16(ops_np, lens_ops)
    wt_d = jax.device_put(jnp.asarray(wt_np))
    wq_d = jax.device_put(jnp.asarray(wq_np))

    # ------------------------------------------------------------------
    # ON-CHIP PARITY GATE on a smaller ragged volume, all option combos.
    # ------------------------------------------------------------------
    Ls = 1 << 16
    ts, qs = t0[:, :Ls], q0[:, :Ls]
    tns, qns = pack_nibble_words(ts, qs)
    lens_s = jnp.asarray(np.minimum(lens_np, Ls))
    n_small = 512
    ops_s = op_chars[rng.integers(0, 5, size=(B, n_small))]
    lens_os = rng.integers(0, 8192, size=(B, n_small)).astype(np.int32)
    lens_os[:, 0] = 8191
    wt_s, wq_s = pack_ops_adv16(ops_s, lens_os)
    want_stats = np.asarray(
        classify_stat_jnp(jnp.asarray(ts), jnp.asarray(qs), lens_s)
    )
    want_t, want_q = (
        np.asarray(a)
        for a in _liftover_scan_impl(
            jnp.asarray(ops_s), jnp.asarray(lens_os), False, False
        )
    )
    for chunk in (None, 128):
        for emit_odd in (True, False):
            outs = classify_liftover_fused_adv16(
                jnp.asarray(tns), jnp.asarray(qns), lens_s,
                jnp.asarray(wt_s), jnp.asarray(wq_s),
                tile_b=64, tile_lw=4096, nibble=True, scan_mode="mm",
                chunk=chunk, emit_odd=emit_odd,
            )
            tag = f"chunk={chunk} eo={emit_odd}"
            assert np.array_equal(np.asarray(outs[0]), want_stats), tag
            if emit_odd:
                _, te, to, qe, qo = outs
                te, to, qe, qo = (np.asarray(a) for a in (te, to, qe, qo))
            else:
                _, te, qe = outs
                te, qe = np.asarray(te), np.asarray(qe)
                to = adv16_odd_offsets(te, wt_s)
                qo = adv16_odd_offsets(qe, wq_s)
            got_t = interleave_halves(te, to)[:, :n_small]
            got_q = interleave_halves(qe, qo)[:, :n_small]
            assert np.array_equal(got_t, want_t), tag
            assert np.array_equal(got_q, want_q), tag
    print("on-chip adv16 chunk/emit_odd parity gate: OK (4 combos)",
          file=sys.stderr)

    # ------------------------------------------------------------------
    # Same-process alternating A/B at the bench production shape.
    # ------------------------------------------------------------------
    def adv(tb=64, lw=4096, chunk=None, emit_odd=True):
        def call(t, q, wt, wq):
            return classify_liftover_fused_adv16(
                t, q, lens_d, wt, wq, tile_b=tb, tile_lw=lw,
                nibble=True, scan_mode="mm", chunk=chunk,
                emit_odd=emit_odd,
            )

        return call

    variants = {
        "base": adv(),
        "eo": adv(emit_odd=False),
        "c128": adv(chunk=128),
        "eoc128": adv(chunk=128, emit_odd=False),
        "tb128": adv(tb=128),
        "lw2048": adv(lw=2048),
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
                wt = wt.at[0, 0].set((e1 << 14) | e1)
                e2 = jnp.int32(1) + ((acc >> 3) & 7)
                wq = wq.at[0, 0].set((e2 << 14) | e2)
                return (t, wt, wq, acc)

            _, _, _, acc = lax.fori_loop(
                0, iters, body, (t, wt, wq, jnp.int32(0))
            )
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in variants.items()}
    LO, HI = 4, 44

    def run_batch(r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(tn_d, qn_d, wt_d, wq_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for n, r in runners.items():
        print(f"warm {n}", file=sys.stderr)
        run_batch(r, LO)
        run_batch(r, HI)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(7):
        for n, r in runners.items():
            lo_t[n].append(run_batch(r, LO))
            hi_t[n].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr)

    for n in runners:
        tl, th = min(lo_t[n]), min(hi_t[n])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{n:7s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
