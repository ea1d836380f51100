"""Streaming-roofline probe: a near-no-op two-input Pallas kernel at the
production tile shapes, to measure the ACHIEVABLE HBM read rate through
the Mosaic block pipeline (not the paper 819 GB/s).

scripts/ab_count_defer.py showed the nibble classify kernel is NOT
VPU-bound (cutting ~25 vreg-ops/word was a wash at ~565 Gcol/s), so the
question is whether 565 Gcol/s == 565 GB/s of reads is the pipeline's
ceiling or there is DMA headroom (deeper buffering, other tile aspects).
The probe body touches only 128 lanes per tile; the BlockSpec still
streams the full tile HBM->VMEM, so the timed rate is pure DMA.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def _probe_kernel(t_ref, q_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += t_ref[:, :128] ^ q_ref[:, :128]


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_lw"))
def probe(tw, qw, tile_b=64, tile_lw=4096):
    B, LW = tw.shape
    nb = pl.cdiv(B, tile_b)
    nl = pl.cdiv(LW, tile_lw)
    return pl.pallas_call(
        _probe_kernel,
        grid=(nb, nl),
        in_specs=[
            pl.BlockSpec(
                (tile_b, tile_lw), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, tile_lw), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(tw, qw)


def main():
    assert jax.default_backend() == "tpu"
    B, LW = 128, 1 << 17  # nibble-word planes of (128, 1M cols)
    rng = np.random.default_rng(0)
    tw = jax.device_put(
        jnp.asarray(rng.integers(0, 2**31, (B, LW), dtype=np.int64)
                    .astype(np.int32))
    )
    qw = jax.device_put(
        jnp.asarray(rng.integers(0, 2**31, (B, LW), dtype=np.int64)
                    .astype(np.int32))
    )

    shapes = {
        "64x4096": (64, 4096),
        "64x8192": (64, 8192),
        "32x16384": (32, 16384),
        "128x4096": (128, 4096),
        "64x2048": (64, 2048),
    }

    def make_runner(tb, tlw):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, iters):
            def body(_, carry):
                t, acc = carry
                out = probe(t, q, tile_b=tb, tile_lw=tlw)
                acc = acc + jnp.sum(out[:, ::64])
                t = t.at[0, 0].set(acc & 0x7FFFFFF)
                return (t, acc)

            _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
            return acc

        return run_iters

    runners = {n: make_runner(*s) for n, s in shapes.items()}
    LO_I, HI_I = 4, 44

    def run_batch(n, r, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(tw, qw, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for n, r in runners.items():
        print(f"warm {n}", file=sys.stderr)
        run_batch(n, r, LO_I)
        run_batch(n, r, HI_I)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(7):
        for n, r in runners.items():
            lo_t[n].append(run_batch(n, r, LO_I))
            hi_t[n].append(run_batch(n, r, HI_I))
        print(f"round {rd} done", file=sys.stderr)

    cols = B * LW * 8  # 8 columns per int32 lane
    for n in runners:
        tl, th = min(lo_t[n]), min(hi_t[n])
        rate = (
            cols * (HI_I - LO_I) / (th - tl) / 1e9
            if th > tl
            else float("nan")
        )
        gbs = rate * 1.0  # 1 B of reads per 8-col pair of nibbles
        print(
            f"{n:9s} marginal {rate:8.1f} Gcol/s-eq = {gbs:6.1f} GB/s reads"
        )


if __name__ == "__main__":
    main()
