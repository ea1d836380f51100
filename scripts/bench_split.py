"""Split-stage timing of bench.py's combined loop: classify-only,
liftover-only, and combined, same methodology, one process."""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from wgatools_tpu.ops.classify import classify_stat_pallas  # noqa: E402
from wgatools_tpu.ops.liftover import liftover_scan  # noqa: E402


def main():
    B, L = 32, 1 << 22
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t_d = jax.device_put(jnp.asarray(alphabet[rng.integers(0, 5, (B, L))]))
    q_d = jax.device_put(jnp.asarray(alphabet[rng.integers(0, 5, (B, L))]))
    lens_d = jax.device_put(jnp.full(B, L, dtype=jnp.int32))
    N_OPS = L // 32
    op_chars = np.frombuffer(b"M=XID", dtype=np.uint8)
    o_d = jax.device_put(jnp.asarray(op_chars[rng.integers(0, 5, (B, N_OPS))]))
    ln_d = jax.device_put(jnp.asarray(np.full((B, N_OPS), 32, np.int32)))

    def make(mode):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, o, ln, iters):
            def body(_, carry):
                t, ln, acc = carry
                if mode in ("classify", "both"):
                    stats = classify_stat_pallas(t, q, lens_d)
                    acc = acc + jnp.sum(stats)
                if mode in ("liftover", "both"):
                    t_off, q_off = liftover_scan(o, ln)
                    acc = (
                        acc
                        + jnp.sum(t_off[:, ::1024])
                        + jnp.sum(q_off[:, ::1024])
                    )
                t = t.at[0, 0].set((acc & 3).astype(jnp.uint8) + jnp.uint8(65))
                ln = ln.at[0, 0].set(jnp.int32(1) + (acc & 7))
                return (t, ln, acc)

            _, _, acc = lax.fori_loop(0, iters, body, (t, ln, jnp.int32(0)))
            return acc

        return run_iters

    runners = {m: make(m) for m in ("classify", "liftover", "both")}
    LO, HI = 4, 36

    def run_batch(r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(t_d, q_d, o_d, ln_d, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for m, r in runners.items():
        print(f"warm {m}", file=sys.stderr)
        run_batch(r, LO)
        run_batch(r, HI)

    lo_t = {m: [] for m in runners}
    hi_t = {m: [] for m in runners}
    for rd in range(6):
        for m, r in runners.items():
            lo_t[m].append(run_batch(r, LO))
            hi_t[m].append(run_batch(r, HI))
        print(f"round {rd} done", file=sys.stderr)

    for m in runners:
        tl, th = min(lo_t[m]), min(hi_t[m])
        dt = (th - tl) / (HI - LO)
        col_rate = B * L / dt / 1e9 if dt > 0 else float("nan")
        print(f"{m:9s} per-iter {dt*1e3:7.3f} ms  -> {col_rate:7.1f} Gcol/s-equiv")


if __name__ == "__main__":
    main()
