"""On-chip gate + A/B: fused16-nibble op-scan on the VPU ladder vs the
MXU triangle matmul (scan_mode="mm").

Motivation: at the round-4 bench shape the combined kernel runs 399
Gbp/s while the standalone nibble classify runs 565 -- the op-scan adds
~1.5 us/grid-step of pure VPU time that serializes behind the classify
stage's VPU work (the VPU is the kernel's only busy unit).  Moving the
pair-sum scan onto the otherwise-idle MXU (2-limb bf16 triangle, exact
for packed16 pair sums < 2^14) leaves the VPU only decode/select/convert
work, so most of the scan should hide under the classify.

Gate first (CLAUDE.md rule: every new formulation proves itself on
silicon), then same-process alternating marginal rates at the bench
production shape.  A classify-only control bounds the scan overhead in
the same ambient-load window.

  ctrl   classify_stat_pallas_nibbles only            (the no-scan bound)
  vpu    fused16 nibble, Hillis ladder                 [round-4 default]
  mm     fused16 nibble, MXU triangle scan
  adv    advance-packed ops (host decode), VPU ladder
  advmm  advance-packed ops (host decode), MXU triangle scan

First result (this machine, v5e, 128x1M, run-32 ops): vpu 389 / mm 380 /
ctrl 534 Gcol/s -- the MXU scan alone is a wash because the op-scan cost
is the per-word class decode + advance SELECTS, not the ladder.  The adv
variants move the decode to the host packer (pack_ops_adv16).
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
    classify_stat_pallas_nibbles,
    pack_nibble_words,
)
from wgatools_tpu.ops.fused import (  # noqa: E402
    classify_liftover_fused16,
    classify_liftover_fused_adv16,
)
from wgatools_tpu.ops.liftover import (  # noqa: E402
    _liftover_scan_impl,
    interleave_halves,
    pack_ops_adv16,
    pack_ops_words16,
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
    op_chars = np.frombuffer(b"M=XID", dtype=np.uint8)
    ops_np = op_chars[rng.integers(0, 5, size=(B, N_OPS))]
    lens_ops = np.full((B, N_OPS), 32, np.int32)
    opw_d = jax.device_put(jnp.asarray(pack_ops_words16(ops_np, lens_ops)))
    wt_np, wq_np = pack_ops_adv16(ops_np, lens_ops)
    wt_d = jax.device_put(jnp.asarray(wt_np))
    wq_d = jax.device_put(jnp.asarray(wq_np))

    # ------------------------------------------------------------------
    # ON-CHIP PARITY GATE: mm scan == jnp oracle bit-for-bit on silicon,
    # on a smaller volume with ragged lengths hitting the 8191 bound.
    # ------------------------------------------------------------------
    Ls = 1 << 16
    ts, qs = t0[:, :Ls], q0[:, :Ls]
    tns, qns = pack_nibble_words(ts, qs)
    lens_s = jnp.asarray(np.minimum(lens_np, Ls))
    n_small = 512
    ops_s = op_chars[rng.integers(0, 5, size=(B, n_small))]
    lens_os = rng.integers(0, 8192, size=(B, n_small)).astype(np.int32)
    lens_os[:, 0] = 8191
    opw_s = jnp.asarray(pack_ops_words16(ops_s, lens_os))
    want_stats = np.asarray(
        classify_stat_jnp(jnp.asarray(ts), jnp.asarray(qs), lens_s)
    )
    want_t, want_q = _liftover_scan_impl(
        jnp.asarray(ops_s), jnp.asarray(lens_os), False, False
    )
    for tloh in (None, 128):
        stats, te, to, qe, qo = classify_liftover_fused16(
            jnp.asarray(tns), jnp.asarray(qns), lens_s, opw_s,
            tile_b=64, tile_lw=4096, tile_loh=tloh, nibble=True,
            scan_mode="mm",
        )
        assert np.array_equal(np.asarray(stats), want_stats), "mm stats"
        got_t = interleave_halves(te, to)[:, :n_small]
        got_q = interleave_halves(qe, qo)[:, :n_small]
        assert np.array_equal(got_t, np.asarray(want_t)), "mm t_off"
        assert np.array_equal(got_q, np.asarray(want_q)), "mm q_off"
    print("on-chip fused16-nibble-mm parity gate: OK (2 tile_loh)",
          file=sys.stderr)

    wt_s, wq_s = pack_ops_adv16(ops_s, lens_os)
    for mode in ("vpu", "mm"):
        stats, te, to, qe, qo = classify_liftover_fused_adv16(
            jnp.asarray(tns), jnp.asarray(qns), lens_s,
            jnp.asarray(wt_s), jnp.asarray(wq_s),
            tile_b=64, tile_lw=4096, nibble=True, scan_mode=mode,
        )
        assert np.array_equal(np.asarray(stats), want_stats), "adv stats"
        got_t = interleave_halves(te, to)[:, :n_small]
        got_q = interleave_halves(qe, qo)[:, :n_small]
        assert np.array_equal(got_t, np.asarray(want_t)), f"adv-{mode} t"
        assert np.array_equal(got_q, np.asarray(want_q)), f"adv-{mode} q"
    print("on-chip adv16 parity gate: OK (vpu + mm)", file=sys.stderr)

    # ------------------------------------------------------------------
    # Same-process alternating A/B at the bench production shape.
    # ------------------------------------------------------------------
    def fused(mode):
        def call(t, q, opw):
            return classify_liftover_fused16(
                t, q, lens_d, opw, tile_b=64, tile_lw=4096, nibble=True,
                scan_mode=mode,
            )

        return call

    def ctrl(t, q, opw):
        return (
            classify_stat_pallas_nibbles(
                t, q, lens_d, tile_b=64, tile_lw=4096
            ),
        )

    def adv(mode):
        def call(t, q, wt):
            return classify_liftover_fused_adv16(
                t, q, lens_d, wt, wq_d, tile_b=64, tile_lw=4096,
                nibble=True, scan_mode=mode,
            )

        return call

    variants = {
        "ctrl": ctrl,
        "vpu": fused("vpu"),
        "mm": fused("mm"),
        "adv": adv("vpu"),
        "advmm": adv("mm"),
    }

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, opw, iters):
            def body(_, carry):
                t, opw, acc = carry
                outs = call(t, q, opw)
                acc = acc + jnp.sum(outs[0])
                for o in outs[1:]:
                    acc = acc + jnp.sum(o[:, ::512])
                t = t.at[0, 0].set(jnp.int32(0x11111111) + (acc & 3))
                opw = opw.at[0, 0].set(
                    jnp.int32(1 << 13) + jnp.int32(1) + (acc & 7)
                )
                return (t, opw, acc)

            _, _, acc = lax.fori_loop(0, iters, body, (t, opw, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in variants.items()}
    LO, HI = 4, 44

    def run_batch(n, r, iters):
        ow = wt_d if n.startswith("adv") else opw_d
        start = time.perf_counter()
        cs = int(np.asarray(r(tn_d, qn_d, ow, iters)))
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
        print(f"{n:5s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
