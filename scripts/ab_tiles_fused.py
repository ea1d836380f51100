"""On-chip A/B: fused-kernel tile shapes at the production batch aspect
(B=128 rows x 1M columns, scripts/ab_shapes.py round 3)."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

from wgatools_tpu.ops.fused import classify_liftover_fused
from wgatools_tpu.ops.liftover import pack_ops_words


def main():
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    B, L = (128, 1 << 20) if on_tpu else (8, 1 << 15)
    N_OPS = L // 32
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT-", np.uint8)
    t0 = alpha[rng.integers(0, 5, size=(B, L))]
    q0 = alpha[rng.integers(0, 5, size=(B, L))]
    tw = jax.device_put(jnp.asarray(t0.view("<i4")))
    qw = jax.device_put(jnp.asarray(q0.view("<i4")))
    lens_d = jax.device_put(jnp.full(B, L, jnp.int32))
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    ops = op_chars[rng.integers(0, 5, size=(B, N_OPS))]
    lens = np.full((B, N_OPS), 32, np.int32)
    opw = jax.device_put(jnp.asarray(pack_ops_words(ops, lens)))

    variants = {
        "tb32_lw8192": dict(tile_b=32, tile_lw=8192),
        "tb64_lw8192": dict(tile_b=64, tile_lw=8192),
        "tb32_lw4096": dict(tile_b=32, tile_lw=4096),
        "tb64_lw4096": dict(tile_b=64, tile_lw=4096),
        "tb128_lw2048": dict(tile_b=128, tile_lw=2048),
    }

    def make_runner(kw):
        def combined(tw_, qw_, opw_):
            return classify_liftover_fused(
                tw_, qw_, lens_d, opw_, None,
                interpret=interpret, **kw,
            )

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(tw_, opw_, iters):
            def body(_, carry):
                tw_, opw_, acc = carry
                stats, t_off, q_off = combined(tw_, qw, opw_)
                acc = (
                    acc
                    + jnp.sum(stats)
                    + jnp.sum(t_off[:, ::1024])
                    + jnp.sum(q_off[:, ::1024])
                )
                tw_ = tw_.at[0, 0].set(jnp.int32(0x41414141) + (acc & 3))
                opw_ = opw_.at[0, 0].set(
                    jnp.int32(ord("M") << 24) + jnp.int32(1) + (acc & 7)
                )
                return (tw_, opw_, acc)

            _, _, acc = lax.fori_loop(0, iters, body, (tw_, opw_, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(kw) for n, kw in variants.items()}
    if interpret:
        for n, r in runners.items():
            assert int(np.asarray(r(tw, opw, 2)))
        print("CPU check OK")
        return

    LO, HI = 4, 36

    def run_batch(name, iters):
        start = time.perf_counter()
        cs = int(np.asarray(runners[name](tw, opw, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for name in runners:
        print(f"warm {name}", file=sys.stderr, flush=True)
        run_batch(name, LO)
        run_batch(name, HI)
    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(6):
        for name in runners:
            lo_t[name].append(run_batch(name, LO))
            hi_t[name].append(run_batch(name, HI))
        print(f"round {rd} done", file=sys.stderr, flush=True)
    for name in runners:
        tl, th = min(lo_t[name]), min(hi_t[name])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{name:13s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
