"""Same-process A/B: separate classify+liftover kernels vs the fused
one-grid kernel (ops/fused.py), on the real chip.

Variants (bit-identical outputs, gated before timing):
  sep          production pair: classify_stat_pallas_words +
               liftover_scan_pallas, back-to-back (the round-2 bench loop)
  fz_full1024  fused, TLW=8192 / TLO=1024, full (1024,1024) triangle
  fz_c256      fused, TLW=8192 / TLO=1024, two-level scan chunk 256
  fz_4096_512  fused, TLW=4096 / TLO=512, full (512,512) triangle
  fz_c128      fused, TLW=8192 / TLO=1024, two-level scan chunk 128

Same marginal-rate methodology as bench.py: single-dispatch fori_loop,
checksum feedback into the next iteration's inputs, min-of-rounds,
alternating variants within each round (ambient load isolation).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    # the axon sitecustomize force-selects the remote TPU and overrides
    # JAX_PLATFORMS; this must run before backends initialize
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

from wgatools_tpu.ops.classify import (
    classify_stat_jnp,
    classify_stat_pallas_words,
)
from wgatools_tpu.ops.fused import classify_liftover_fused
from wgatools_tpu.ops.liftover import _liftover_scan_impl, liftover_scan_pallas


def main():
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    B, L = (32, 1 << 22) if on_tpu else (4, 1 << 16)
    LW = L // 4
    N_OPS = L // 32
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    tw_d = jax.device_put(jnp.asarray(t0.view("<i4")))
    qw_d = jax.device_put(jnp.asarray(q0.view("<i4")))
    lens_d = jax.device_put(jnp.full(B, L, dtype=jnp.int32))
    op_chars = np.frombuffer(b"M=XID", dtype=np.uint8)
    o_d = jax.device_put(
        jnp.asarray(op_chars[rng.integers(0, 5, size=(B, N_OPS))])
    )
    ln_d = jax.device_put(jnp.asarray(np.full((B, N_OPS), 32, np.int32)))

    def make_sep():
        def call(tw, qw, o, ln):
            stats = classify_stat_pallas_words(tw, qw, lens_d)
            t_off, q_off = liftover_scan_pallas(o, ln, interpret=interpret)
            return stats, t_off, q_off

        return call

    def make_fused(tlw, tlo, chunk):
        def call(tw, qw, o, ln):
            return classify_liftover_fused(
                tw, qw, lens_d, o, ln,
                tile_lw=tlw, tile_lo=tlo, scan_chunk=chunk,
                interpret=interpret,
            )

        return call

    def make_cls_only():
        # control: classify alone, zero liftover -- the fused loop's
        # upper bound (offsets summed as zeros to keep the checksum shape)
        def call(tw, qw, o, ln):
            stats = classify_stat_pallas_words(tw, qw, lens_d)
            z = jnp.zeros(o.shape, jnp.int32)
            return stats, z, z

        return call

    calls = {}
    if on_tpu:
        calls["sep"] = make_sep()
        calls["cls_only"] = make_cls_only()
    calls["fz_full1024"] = make_fused(8192, 1024, None)
    calls["fz_c256"] = make_fused(8192, 1024, 256)
    calls["fz_c512"] = make_fused(8192, 1024, 512)
    calls["fz_c128"] = make_fused(8192, 1024, 128)

    # correctness gates vs the jnp references
    want_stats = np.asarray(classify_stat_jnp(
        jnp.asarray(t0), jnp.asarray(q0), lens_d))
    want_t, want_q = _liftover_scan_impl(o_d, ln_d, False, False)
    want_t, want_q = np.asarray(want_t), np.asarray(want_q)
    for name, call in calls.items():
        stats, t_off, q_off = call(tw_d, qw_d, o_d, ln_d)
        assert np.array_equal(np.asarray(stats), want_stats), f"{name} stats"
        if name != "cls_only":  # the control returns zero offsets
            assert np.array_equal(np.asarray(t_off), want_t), f"{name} t_off"
            assert np.array_equal(np.asarray(q_off), want_q), f"{name} q_off"
        print(f"{name}: parity OK", file=sys.stderr, flush=True)
    if interpret:
        print("CPU interpret mode: correctness only")
        return

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(tw, o, ln, iters):
            def body(_, carry):
                tw, ln, acc = carry
                stats, t_off, q_off = call(tw, qw_d, o, ln)
                acc = (
                    acc
                    + jnp.sum(stats)
                    + jnp.sum(t_off[:, ::1024])
                    + jnp.sum(q_off[:, ::1024])
                )
                tw = tw.at[0, 0].set(jnp.int32(0x41414141) + (acc & 3))
                ln = ln.at[0, 0].set(jnp.int32(1) + (acc & 7))
                return (tw, ln, acc)

            _, _, acc = lax.fori_loop(0, iters, body, (tw, ln, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in calls.items()}
    LO, HI = 4, 36

    def run_batch(r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(tw_d, o_d, ln_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for name, r in runners.items():
        print(f"warm {name}", file=sys.stderr, flush=True)
        run_batch(r, LO)
        run_batch(r, HI)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(6):
        for name, r in runners.items():
            lo_t[name].append(run_batch(r, LO))
            hi_t[name].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr, flush=True)

    for name in runners:
        tl, th = min(lo_t[name]), min(hi_t[name])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(
            f"{name:12s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}"
        )


if __name__ == "__main__":
    main()
