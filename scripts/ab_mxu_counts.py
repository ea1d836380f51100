"""VERDICT r4 #1: A/B of MXU-offloaded classify counting.

Hypothesis under test: the classify kernel's per-class count reductions
(seven 0x11111111 SWAR multiplies + four packed 16-bit-field sum passes)
keep the VPU busy while the MXU idles; forming per-class count planes in
bf16 and reducing them as ONE stacked (7*TB, TLW) x (TLW, 128) matmul
against ones (the stacked-operand trick that won 1.5x in
ab_liftover.py) could convert idle MXU cycles into rate.

What the instruction budget says up front (docs/SCALING.md "Roofline,
quantified"): the SWAR bit-counting itself CANNOT move to the MXU --
matmuls sum planes, they cannot popcount packed nibble fields, and the
mask bit patterns (values up to 0x11111111) are not representable in
bf16 limbs without more VPU ops than they save.  So the offload can
only replace the field-packing (6 ops/word) and sum passes (~4
ops/word), while paying 7 int32->bf16 converts (~7 ops/word) plus a
7-plane stacking relayout plus the matmul itself -- the same
"reshapes/converts, not MACs" cost structure that killed the bf16-limb
scan in ab_fused_diag.py.  This A/B measures that prediction on chip.

Variants (standalone classify, cat plane input, production tile):
  base   production _kernel_cat          (7 cnt muls, 4 packed sums)
  mxu    cnt muls kept, counts -> bf16, ONE stacked matmul vs ones
  mxu7   cnt muls kept, 7 SEPARATE (TB,TLW)x(TLW,128) matmuls (no concat)

Parity gate on-chip first (both MXU variants must equal jnp exactly:
counts <= 8 are bf16-exact, per-tile sums <= 32768 are f32-exact).
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
    _cat_last_real,
    _finish_stats,
    _HI4,
    _M1_4,
    _M7_4,
    _cat_to_std,
    classify_stat_jnp,
    classify_stat_pallas_cat,
    pack_cat_nibbles,
    N_STATS,
)


def _mxu_cat_kernel(c_ref, ones_ref, out_ref, edge_ref, *, separate=False):
    """Cat classify with count reductions on the MXU (ext mode only --
    the A/B question is the reduction path, not the category table)."""
    j = pl.program_id(1)
    cw = c_ref[:]
    HI = jnp.int32(_HI4)
    M7 = jnp.int32(_M7_4)
    M1 = jnp.int32(_M1_4)

    def lsr(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    carried = lsr(pltpu.roll(cw, 1, axis=1), 28)
    prevw = (cw << 4) | carried
    diff = cw ^ prevw
    dm = diff & M7
    rs_hi = (dm + M7) & HI
    r0 = lsr(rs_hi, 3)
    m1 = cw & M1
    m2 = lsr(cw, 1) & M1
    m4 = lsr(cw, 2) & M1
    m8 = lsr(cw, 3) & M1

    def cnt(m):
        return lsr(m * M1, 28)

    # per-word counts (<= 8: bf16-exact) for the 7 counters
    planes = [
        cnt(m1), cnt(m8), cnt(m2), cnt(m4),
        cnt(m2 & r0), cnt(m4 & r0), cnt(r0),
    ]
    TB, LW = cw.shape
    i32 = jnp.int32
    if separate:
        sums = []
        for p in planes:
            s = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                ones_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sums.append(s[:, 0].astype(i32))
        s_eqg, s_gg, s_i, s_d, s_ie, s_de, s_rs = sums
    else:
        stackp = jnp.concatenate(
            [p.astype(jnp.bfloat16) for p in planes], axis=0
        )
        s = jax.lax.dot_general(
            stackp,
            ones_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, 0].astype(i32)
        s_eqg = s[:TB]
        s_gg = s[TB : 2 * TB]
        s_i = s[2 * TB : 3 * TB]
        s_d = s[3 * TB : 4 * TB]
        s_ie = s[4 * TB : 5 * TB]
        s_de = s[5 * TB : 6 * TB]
        s_rs = s[6 * TB :]
    s_x = jnp.int32(8 * LW) - s_eqg - s_i - s_d
    stats = jnp.stack(
        [s_eqg, s_x, s_i, s_d, s_ie, s_de, s_gg, s_rs], axis=1
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += stats
    first_c = cw[:, 0:1] & jnp.int32(0xF)
    last_c = lsr(cw[:, LW - 1 : LW], 28)
    pad_lanes = jnp.zeros((TB, 126), jnp.int32)
    edge_ref[:] = jnp.concatenate(
        [
            _cat_to_std(first_c, False),
            _cat_to_std(last_c, False),
            pad_lanes,
        ],
        axis=1,
    )


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_lw", "separate")
)
def classify_cat_mxu(cw, lengths, tile_b=64, tile_lw=4096, separate=False):
    B, LW = cw.shape
    assert B % tile_b == 0 and LW % tile_lw == 0
    nb, nl = B // tile_b, LW // tile_lw
    ones = jnp.ones((tile_lw, 128), jnp.bfloat16)
    out, edges = pl.pallas_call(
        functools.partial(_mxu_cat_kernel, separate=separate),
        grid=(nb, nl),
        in_specs=[
            pl.BlockSpec(
                (tile_b, tile_lw), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_lw, 128), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_b, N_STATS), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
            jax.ShapeDtypeStruct((B, 128 * nl), jnp.int32),
        ],
    )(cw, ones)
    last_real_cat = _cat_last_real(cw, lengths, False)
    return _finish_stats(
        out, edges, nl, 8 * LW, lengths, last_real_cat, False, 0
    )


def main():
    assert jax.default_backend() == "tpu", "on-chip A/B needs the TPU"
    B, L = 128, 1 << 20
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    lens_np = np.full(B, L, np.int32)
    lens_d = jax.device_put(jnp.asarray(lens_np))
    cw = pack_cat_nibbles(t0, q0)
    cw_d = jax.device_put(jnp.asarray(cw))

    # parity gate on a small slice first
    t_s, q_s = t0[:, : 1 << 16], q0[:, : 1 << 16]
    lens_s = np.full(B, 1 << 16, np.int32)
    cws = jnp.asarray(pack_cat_nibbles(t_s, q_s))
    want = np.asarray(
        classify_stat_jnp(jnp.asarray(t_s), jnp.asarray(q_s),
                          jnp.asarray(lens_s))
    )
    for sep in (False, True):
        got = np.asarray(
            classify_cat_mxu(cws, jnp.asarray(lens_s), separate=sep)
        )
        assert np.array_equal(got, want), f"MXU variant separate={sep}"
    print("on-chip mxu-counts parity gate: OK (stacked + separate)",
          file=sys.stderr)

    variants = {
        "base": lambda c: jnp.sum(classify_stat_pallas_cat(
            c, lens_d, tile_b=64, tile_lw=4096
        )),
        "mxu": lambda c: jnp.sum(classify_cat_mxu(
            c, lens_d, separate=False
        )),
        "mxu7": lambda c: jnp.sum(classify_cat_mxu(
            c, lens_d, separate=True
        )),
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
        print(f"{n:5s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
