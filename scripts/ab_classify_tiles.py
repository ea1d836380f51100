"""Tile-shape sweep for the production classify kernel (post-v3).

Same-process alternating marginal rates (bench.py methodology); this sweep
picked the production default (32, 32768).
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from wgatools_tpu.ops.classify import classify_stat_pallas  # noqa: E402

SHAPES = [(8, 32768), (16, 32768), (32, 32768), (8, 16384)]


def main():
    B, L = 32, 1 << 22
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    t_d = jax.device_put(jnp.asarray(t0))
    q_d = jax.device_put(jnp.asarray(q0))
    lens_d = jax.device_put(jnp.full(B, L, dtype=jnp.int32))

    ref = None
    runners = {}
    for tb, tl in SHAPES:

        def make(tb=tb, tl=tl):
            @functools.partial(jax.jit, static_argnames=("iters",))
            def run_iters(t, q, iters):
                def body(_, carry):
                    t, acc = carry
                    stats = classify_stat_pallas(
                        t, q, lens_d, tile_b=tb, tile_l=tl
                    )
                    acc = acc + jnp.sum(stats)
                    t = t.at[0, 0].set(
                        (acc & 3).astype(jnp.uint8) + jnp.uint8(65)
                    )
                    return (t, acc)

                _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
                return acc

            return run_iters

        got = np.asarray(
            classify_stat_pallas(t_d, q_d, lens_d, tile_b=tb, tile_l=tl)
        )
        if ref is None:
            ref = got
        else:
            assert np.array_equal(got, ref), (tb, tl)
        runners[(tb, tl)] = make()
    print("all shapes bit-identical", file=sys.stderr)

    LO, HI = 4, 36

    def run_batch(r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(t_d, q_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for k, r in runners.items():
        print(f"warm {k}", file=sys.stderr)
        run_batch(r, LO)
        run_batch(r, HI)

    lo_t = {k: [] for k in runners}
    hi_t = {k: [] for k in runners}
    for rd in range(7):
        for k, r in runners.items():
            lo_t[k].append(run_batch(r, LO))
            hi_t[k].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr)

    for k in runners:
        tl_, th = min(lo_t[k]), min(hi_t[k])
        rate = B * L * (HI - LO) / (th - tl_) / 1e9 if th > tl_ else float("nan")
        print(f"{str(k):12s} marginal {rate:8.1f} Gcol/s  lo={tl_:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
