"""Multi-device scaling benchmark for the sharded column-stats pipeline.

Measures aligned columns/s of `sharded_column_stats` (record-axis
shard_map) at 1, 2, 4, ... devices and reports parallel efficiency
(BASELINE.md target: >= 85% at 2+ hosts).

On a real pod slice, run one process per host with
JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID set
(wgatools_tpu.parallel.distributed.maybe_initialize_distributed is called
first) and the mesh spans all hosts' chips.  On a single host it scales
over the local chips.  With JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=N it exercises the same code path
on virtual devices (functional check; virtual devices share host cores,
so efficiency numbers are only meaningful on real chips).

Usage: python scripts/scaling_bench.py [--cols 1048576] [--rows-per-dev 8]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=1 << 20)
    ap.add_argument("--rows-per-dev", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from wgatools_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wgatools_tpu.parallel.mesh import (
        RECORDS_AXIS,
        make_mesh,
        sharded_column_stats,
    )

    n_total = len(jax.devices())
    sizes = []
    n = 1
    while n <= n_total:
        sizes.append(n)
        n *= 2
    if sizes[-1] != n_total:
        sizes.append(n_total)

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    results = {}
    for n_dev in sizes:
        B = args.rows_per_dev * n_dev
        t = alphabet[rng.integers(0, 5, (B, args.cols))]
        q = alphabet[rng.integers(0, 5, (B, args.cols))]
        lens = np.full(B, args.cols, dtype=np.int32)
        mesh = make_mesh(n_dev)
        sh = NamedSharding(mesh, P(RECORDS_AXIS, None))
        sh1 = NamedSharding(mesh, P(RECORDS_AXIS))
        # word-packed host views: the fast SWAR kernel path (ops.classify)
        t_d = jax.device_put(jnp.asarray(t.view("<i4")), sh)
        q_d = jax.device_put(jnp.asarray(q.view("<i4")), sh)
        l_d = jax.device_put(jnp.asarray(lens), sh1)

        # the WHOLE iteration batch is ONE dispatch: a jitted lax.fori_loop
        # runs the sharded step per iteration on device, feeding each
        # checksum into the next iteration's input (nothing is
        # loop-invariant, nothing can be elided) and ends with one host
        # fetch.  Python-dispatched per-call loops measure the remote
        # tunnel's ~2-3 ms enqueue cost instead of the kernel once the
        # kernel is fast (observed 10 vs 270+ Gcol/s on the same config).
        import functools

        from jax import lax

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, l, iters):
            def body(_, carry):
                t, acc = carry
                acc = acc + jnp.sum(sharded_column_stats(mesh, t, q, l))
                t = t.at[0, 0].set(jnp.int32(0x41414141) + (acc & 3))
                return (t, acc)

            _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
            return acc

        def run(iters):
            t0 = time.perf_counter()
            assert int(np.asarray(run_iters(t_d, q_d, l_d, iters))) != 0
            return time.perf_counter() - t0

        run(1)
        run(args.iters)
        lo = min(run(1) for _ in range(3))
        hi = min(run(args.iters) for _ in range(3))
        # marginal rate with a physical-bound fallback (bench.py): ambient
        # load on the shared chip can make hi-lo collapse to noise
        marginal = (
            B * args.cols * (args.iters - 1) / (hi - lo) if hi > lo else 0.0
        )
        lower_bound = B * args.cols * args.iters / hi
        phys_bound = 420e9 * n_dev
        rate = marginal if 0 < marginal <= phys_bound else lower_bound
        results[n_dev] = rate
        base = results[sizes[0]] * n_dev / sizes[0]
        eff = rate / base if base else 0.0
        print(
            json.dumps(
                {
                    "devices": n_dev,
                    "gcols_per_s": round(rate / 1e9, 2),
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
