"""A/B: per-step op-scan slices vs ONE whole-table scan at j == 0.

The fused cat kernel trails the standalone cat classify ~13%
same-window (ab_fused_cat.py: mm128 808.6 vs control 925.8 Gcol/s)
even though the g8 op tile per step is 1/32 of the column tile -- the
cost is per-step FIXED overhead (extra DMA streams, MXU spin-up, carry
serialization), not scan work.  Variant: keep the op tables and anchor
outputs RESIDENT across the column steps (constant block index) and run
the whole scan once at j == 0 -- 31 of 32 steps are then pure classify.

Scan formulations at full width (TLOH = 4096; the resident (4096,4096)
bf16 triangle would be 32 MB, so):
  so-mm128   two-level mm against a (128,128) triangle, 32 chunks
  so-vpu     int32 Hillis ladder, 12 steps
Baselines: fused per-step mm (tile_b=128) and the classify-only control.
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

from wgatools_tpu.ops.classify import (  # noqa: E402
    N_STATS,
    _kernel_cat,
    classify_stat_pallas_cat,
    pack_cat_nibbles,
)
from wgatools_tpu.ops.fused import (  # noqa: E402
    classify_liftover_fused_adv16,
)
from wgatools_tpu.ops.liftover import (  # noqa: E402
    _hillis_scan_pair,
    pack_ops_sums,
)


def _kernel_scan_once(
    cw_ref, wt_ref, wq_ref, tri_ref, out_ref, edge_ref, ta_ref, qa_ref,
    *, chunk=128, scan_mode="mm",
):
    _kernel_cat(cw_ref, out_ref, edge_ref, caller=False)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ct = wt_ref[:]
        cq = wq_ref[:]
        TB, TLOH = ct.shape
        i32 = jnp.int32
        if scan_mode == "vpu":
            carry = jnp.zeros((TB, 2), i32)
            p_t, p_q = _hillis_scan_pair(ct, cq, carry)
        else:

            def lsr(x, k):
                return jax.lax.shift_right_logical(x, jnp.int32(k))

            c = chunk
            ns2 = TLOH // c
            at = ct.reshape(TB * ns2, c)
            aq = cq.reshape(TB * ns2, c)
            stacked = jnp.concatenate(
                [
                    (at & 0xFF).astype(jnp.bfloat16),
                    lsr(at, 8).astype(jnp.bfloat16),
                    (aq & 0xFF).astype(jnp.bfloat16),
                    lsr(aq, 8).astype(jnp.bfloat16),
                ],
                axis=0,
            )
            s = jax.lax.dot_general(
                stacked,
                tri_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(i32)
            R = TB * ns2
            p_t = s[:R] + (s[R : 2 * R] << 8)
            p_q = s[2 * R : 3 * R] + (s[3 * R :] << 8)
            tot_t = (p_t[:, c - 1 : c] + at[:, c - 1 : c]).reshape(TB, ns2)
            tot_q = (p_q[:, c - 1 : c] + aq[:, c - 1 : c]).reshape(TB, ns2)
            offs_t = [jnp.zeros((TB, 1), i32)]
            offs_q = [jnp.zeros((TB, 1), i32)]
            for k in range(1, ns2):
                offs_t.append(offs_t[-1] + tot_t[:, k - 1 : k])
                offs_q.append(offs_q[-1] + tot_q[:, k - 1 : k])
            off_t = jnp.concatenate(offs_t, axis=1)
            off_q = jnp.concatenate(offs_q, axis=1)
            p_t = (
                p_t.reshape(TB, ns2, c) + off_t[:, :, None]
            ).reshape(TB, TLOH)
            p_q = (
                p_q.reshape(TB, ns2, c) + off_q[:, :, None]
            ).reshape(TB, TLOH)
        ta_ref[:] = p_t
        qa_ref[:] = p_q


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_lw", "chunk", "scan_mode")
)
def fused_scan_once(
    cw, lengths, wt, wq, tile_b=128, tile_lw=4096, chunk=128,
    scan_mode="mm",
):
    B, LW = cw.shape
    B2, NOH = wt.shape
    assert B % tile_b == 0 and LW % tile_lw == 0 and B2 == B
    nb, ns = B // tile_b, LW // tile_lw
    tri_n = chunk
    ir = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 1)
    tri = jnp.clip(ir - ic, 0, 1).astype(jnp.bfloat16)
    word_spec = pl.BlockSpec(
        (tile_b, tile_lw), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    op_spec = pl.BlockSpec(
        (tile_b, NOH), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    out, edges, ta, qa = pl.pallas_call(
        functools.partial(
            _kernel_scan_once, chunk=chunk, scan_mode=scan_mode
        ),
        grid=(nb, ns),
        in_specs=[
            word_spec,
            op_spec,
            op_spec,
            pl.BlockSpec(
                (tri_n, tri_n), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_b, N_STATS), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, 128), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            op_spec,
            op_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
            jax.ShapeDtypeStruct((B, 128 * ns), jnp.int32),
            jax.ShapeDtypeStruct((B, NOH), jnp.int32),
            jax.ShapeDtypeStruct((B, NOH), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(cw, wt, wq, tri)
    return out, edges, ta, qa


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

    # on-chip parity gate vs the production fused path
    want = classify_liftover_fused_adv16(
        cw_d, None, lens_d, st_d, sq_d, tile_b=128, tile_lw=4096,
        catmode=True, scan_mode="mm", raw_sums=True,
    )
    for name, kw in (
        ("so-mm128", dict(scan_mode="mm", chunk=128, tile_b=64)),
        ("so-vpu", dict(scan_mode="vpu", tile_b=64)),
    ):
        out, edges, ta, qa = fused_scan_once(cw_d, lens_d, st_d, sq_d, **kw)
        assert np.array_equal(np.asarray(ta), np.asarray(want[1])), name
        assert np.array_equal(np.asarray(qa), np.asarray(want[2])), name
    print("on-chip scan-once anchors parity gate: OK", file=sys.stderr)

    def so(kw):
        def f(c):
            out, edges, ta, qa = fused_scan_once(c, lens_d, st_d, sq_d, **kw)
            return jnp.sum(out) + jnp.sum(ta) + jnp.sum(qa)

        return f

    def prod(c):
        s, ta, qa = classify_liftover_fused_adv16(
            c, None, lens_d, st_d, sq_d, tile_b=128, tile_lw=4096,
            catmode=True, scan_mode="mm", raw_sums=True,
        )
        return jnp.sum(s) + jnp.sum(ta) + jnp.sum(qa)

    variants = {
        "prod": prod,
        "so-mm128": so(dict(scan_mode="mm", chunk=128, tile_b=64)),
        "so-vpu": so(dict(scan_mode="vpu", tile_b=64)),
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
        print(f"{n:9s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
