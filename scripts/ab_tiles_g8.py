"""Tile sweep of the PRODUCTION g8 fused kernel (raw group-8 sums, mm
scan): (64,4096) current vs (32,4096) vs (64,2048) vs (128,4096).
Same-process alternating marginal rates at the bench shape."""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from wgatools_tpu.ops.classify import pack_nibble_words  # noqa: E402
from wgatools_tpu.ops.fused import classify_liftover_fused_adv16  # noqa: E402
from wgatools_tpu.ops.liftover import pack_ops_sums  # noqa: E402


def main():
    assert jax.default_backend() == "tpu"
    B, L = 128, 1 << 20
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    lens_d = jax.device_put(jnp.full(B, L, dtype=jnp.int32))
    tn, qn = pack_nibble_words(t0, q0)
    tn_d = jax.device_put(jnp.asarray(tn))
    qn_d = jax.device_put(jnp.asarray(qn))
    N_OPS = L // 32
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    ops_np = op_chars[rng.integers(0, 5, size=(B, N_OPS))]
    lens_np = np.full((B, N_OPS), 32, np.int32)
    st, sq = pack_ops_sums(ops_np, lens_np, group=8)
    st_d = jax.device_put(jnp.asarray(st))
    sq_d = jax.device_put(jnp.asarray(sq))

    shapes = {
        "64x4096": (64, 4096),
        "32x4096": (32, 4096),
        "64x2048": (64, 2048),
        "128x4096": (128, 4096),
    }

    def make_runner(tb, tlw):
        def call(t, q, wt, wq):
            return classify_liftover_fused_adv16(
                t, q, lens_d, wt, wq, tile_b=tb, tile_lw=tlw,
                nibble=True, scan_mode="mm", raw_sums=True,
            )

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, wt, wq, iters):
            def body(_, carry):
                t, wt, wq, acc = carry
                outs = call(t, q, wt, wq)
                acc = acc + jnp.sum(outs[0])
                for o in outs[1:]:
                    acc = acc + jnp.sum(o[:, ::512])
                t = t.at[0, 0].set(jnp.int32(0x11111111) + (acc & 3))
                wt = wt.at[0, 0].set(jnp.int32(1) + (acc & 7))
                wq = wq.at[0, 0].set(jnp.int32(1) + ((acc >> 3) & 7))
                return (t, wt, wq, acc)

            _, _, _, acc = lax.fori_loop(
                0, iters, body, (t, wt, wq, jnp.int32(0))
            )
            return acc

        return run_iters

    runners = {n: make_runner(*s) for n, s in shapes.items()}
    LO, HI = 4, 44

    def run_batch(n, r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(tn_d, qn_d, st_d, sq_d, iters)))
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
        print(f"{n:9s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
