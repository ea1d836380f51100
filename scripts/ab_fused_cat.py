"""On-chip sweep of the round-5 fused cat flagship's remaining knobs.

With classify at ~41 vreg-ops/word the g8 scan stage is a bigger share
of the fused step than in r4 (standalone cat classify 1139 vs fused
803 Gcol/s, ab_cat.py).  Sweep: scan_mode mm vs vpu at the new
balance, row tile 32/64/128, and a classify-only control.
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
    classify_stat_pallas_cat,
    pack_cat_nibbles,
)
from wgatools_tpu.ops.fused import classify_liftover_fused_adv16  # noqa: E402
from wgatools_tpu.ops.liftover import pack_ops_sums  # noqa: E402


def main():
    assert jax.default_backend() == "tpu"
    B, L = 128, 1 << 20
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    lens_d = jax.device_put(jnp.full(B, L, jnp.int32))
    cw_d = jax.device_put(jnp.asarray(pack_cat_nibbles(t0, q0)))
    n_ops = (L // 32) & ~15
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    ops_np = op_chars[rng.integers(0, 6, (B, n_ops))]
    oplens_np = rng.integers(0, 64, (B, n_ops)).astype(np.int32)
    st, sq = pack_ops_sums(ops_np, oplens_np, group=8)
    st_d = jax.device_put(jnp.asarray(st))
    sq_d = jax.device_put(jnp.asarray(sq))

    def fused(tile_b, scan_mode):
        def f(c):
            s, ta, qa = classify_liftover_fused_adv16(
                c, None, lens_d, st_d, sq_d, tile_b=tile_b,
                tile_lw=4096, catmode=True, scan_mode=scan_mode,
                raw_sums=True,
            )
            return jnp.sum(s) + jnp.sum(ta) + jnp.sum(qa)

        return f

    variants = {
        "mm64": fused(64, "mm"),
        "mm128": fused(128, "mm"),
        "mm32": fused(32, "mm"),
        "vpu64": fused(64, "vpu"),
        "c64": lambda c: jnp.sum(
            classify_stat_pallas_cat(c, lens_d, tile_b=64, tile_lw=4096)
        ),
    }

    def make_runner(call):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(c, iters):
            def body(_, carry):
                c, acc = carry
                acc = acc + call(c)
                c = c.at[0, 0].set(jnp.int32(0x11111111) + (acc & 1))
                return (c, acc)

            _, acc = lax.fori_loop(0, iters, body, (c, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(c) for n, c in variants.items()}
    LO, HI = 4, 44

    def run_batch(r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(cw_d, iters)))
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
        print(f"{n:6s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
