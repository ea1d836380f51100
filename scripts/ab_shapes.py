"""On-chip A/B: batch aspect ratio of the fused combined loop.

The bench's column volume (134M columns/iteration) can be laid out as
any [B, L]; tile shapes follow tile_b=min(32, B).  Round-2's
scaling_bench measured its best rates at B=8 rows/device, so this
sweeps aspect ratios at constant volume with the bench methodology.
"""

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


def main():
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    TOTAL = (1 << 27) if on_tpu else (1 << 18)  # columns per iteration
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT-", np.uint8)
    op_chars = np.frombuffer(b"M=XID", np.uint8)

    shapes = [(128, TOTAL // 128)]
    if on_tpu:
        shapes.append((256, TOTAL // 256))
        shapes.append((512, TOTAL // 512))

    cases = {}
    for B, L in shapes:
        t = alpha[rng.integers(0, 5, size=(B, L))]
        q = alpha[rng.integers(0, 5, size=(B, L))]
        n_ops = L // 32
        ops = op_chars[rng.integers(0, 5, size=(B, n_ops))]
        lens = np.full((B, n_ops), 32, np.int32)
        cases[f"B{B}"] = dict(
            B=B,
            L=L,
            tw=jax.device_put(jnp.asarray(t.view("<i4"))),
            qw=jax.device_put(jnp.asarray(q.view("<i4"))),
            o=jax.device_put(jnp.asarray(ops)),
            ln=jax.device_put(jnp.asarray(lens)),
            lens=jax.device_put(jnp.full(B, L, jnp.int32)),
        )

    def make_runner(c):
        tile_b = min(64, c["B"])

        def combined(tw, qw, o, ln):
            return classify_liftover_fused(
                tw, qw, c["lens"], o, ln,
                tile_b=tile_b, tile_lw=8192, tile_lo=1024, scan_chunk=128,
                interpret=interpret,
            )

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(tw, qw, o, ln, iters):
            def body(_, carry):
                tw, ln, acc = carry
                stats, t_off, q_off = combined(tw, qw, o, ln)
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

    runners = {n: make_runner(c) for n, c in cases.items()}

    if interpret:
        for n, c in cases.items():
            r = runners[n]
            assert int(np.asarray(r(c["tw"], c["qw"], c["o"], c["ln"], 2)))
        print("CPU shape check OK")
        return

    LO, HI = 4, 36

    def run_batch(name, iters):
        c = cases[name]
        start = time.perf_counter()
        cs = int(
            np.asarray(runners[name](c["tw"], c["qw"], c["o"], c["ln"], iters))
        )
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
        rate = TOTAL * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{name:6s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
