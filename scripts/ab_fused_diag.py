"""Diagnostic A/B: WHERE do the fused kernel's liftover ~2us/step go?

Same grid/classify body as production; liftover stage variants:
  full      production c256 two-level scan, full offset outputs
  noout     same compute, outputs decimated to 1/8 of the lanes
            (isolates the 256 KB/step offset writes)
  noselect  advances precomputed on host as i32 inputs
            (isolates the in-kernel compare/select + u8 widen)
  nomm      no matmul: offsets = advances + carry only (WRONG values,
            never used in production -- isolates the scan matmul +
            reshape/convert chain)
All variants keep the carry dependence so nothing dead-code-eliminates.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgatools_tpu.ops.classify import N_STATS, _kernel_words
from wgatools_tpu.ops.fused import _liftover_block

OP_I, OP_D, OP_S = ord("I"), ord("D"), ord("S")


def _lift_variant(ops_or_advs, lens_or_advq, tri, toff_ref, qoff_ref,
                  carry_ref, j, mode, chunk):
    i32 = jnp.int32
    if mode == "noselect":
        adv_t = ops_or_advs
        adv_q = lens_or_advq
    else:
        o32 = ops_or_advs.astype(i32)
        lens = lens_or_advq
        pad = o32 == 0
        is_i = o32 == OP_I
        is_s = o32 == OP_S
        is_d = o32 == OP_D
        adv_t = jnp.where(pad | is_i | is_s, 0, lens)
        adv_q = jnp.where(pad | is_d, 0, lens)
    TB, TLO = adv_t.shape

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    if mode == "nomm":
        ex_t = adv_t + carry[:, 0:1]
        ex_q = adv_q + carry[:, 1:2]
    elif mode in ("hillis", "roll"):
        # pure-VPU Hillis-Steele scan: log2(TLO) shift+add steps on int32
        # (exact, no limbs / reshapes / bf16 converts / MXU at all)
        both = jnp.concatenate([adv_t, adv_q], axis=0)
        x = both
        k = 1
        if mode == "roll":
            iota = jax.lax.broadcasted_iota(i32, both.shape, 1)
        while k < TLO:
            if mode == "roll":
                rolled = pltpu.roll(x, k, axis=1)
                x = x + jnp.where(iota >= k, rolled, 0)
            else:
                shifted = jnp.concatenate(
                    [jnp.zeros((both.shape[0], k), i32), x[:, :-k]], axis=1
                )
                x = x + shifted
            k *= 2
        ex = x - both
        ex_t = ex[:TB] + carry[:, 0:1]
        ex_q = ex[TB:] + carry[:, 1:2]
    else:
        c = chunk or TLO
        ns = TLO // c
        at = adv_t.reshape(TB * ns, c)
        aq = adv_q.reshape(TB * ns, c)
        stacked = jnp.concatenate(
            [
                (at & 0xFF).astype(jnp.bfloat16),
                (at >> 8).astype(jnp.bfloat16),
                (aq & 0xFF).astype(jnp.bfloat16),
                (aq >> 8).astype(jnp.bfloat16),
            ],
            axis=0,
        )
        s = jax.lax.dot_general(
            stacked, tri, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(i32)
        R = TB * ns
        ex_t = s[:R] + (s[R : 2 * R] << 8)
        ex_q = s[2 * R : 3 * R] + (s[3 * R :] << 8)
        if ns > 1:
            tot_t = (ex_t[:, c - 1 : c] + at[:, c - 1 : c]).reshape(TB, ns)
            tot_q = (ex_q[:, c - 1 : c] + aq[:, c - 1 : c]).reshape(TB, ns)
            offs_t = [jnp.zeros((TB, 1), i32)]
            offs_q = [jnp.zeros((TB, 1), i32)]
            for k in range(1, ns):
                offs_t.append(offs_t[-1] + tot_t[:, k - 1 : k])
                offs_q.append(offs_q[-1] + tot_q[:, k - 1 : k])
            off_t = jnp.concatenate(offs_t, axis=1)
            off_q = jnp.concatenate(offs_q, axis=1)
            ex_t = (ex_t.reshape(TB, ns, c) + off_t[:, :, None]).reshape(
                TB, TLO
            )
            ex_q = (ex_q.reshape(TB, ns, c) + off_q[:, :, None]).reshape(
                TB, TLO
            )
        else:
            ex_t = ex_t.reshape(TB, TLO)
            ex_q = ex_q.reshape(TB, TLO)
        ex_t = ex_t + carry[:, 0:1]
        ex_q = ex_q + carry[:, 1:2]
    if mode == "noout":
        # contiguous 1/8 slice (strided writes lower as gathers, which
        # Mosaic rejects); the carry keeps the full scan live
        toff_ref[:] = ex_t[:, : ex_t.shape[1] // 8]
        qoff_ref[:] = ex_q[:, : ex_q.shape[1] // 8]
    else:
        toff_ref[:] = ex_t
        qoff_ref[:] = ex_q
    carry_ref[:] = jnp.concatenate(
        [
            ex_t[:, TLO - 1 : TLO] + adv_t[:, TLO - 1 : TLO],
            ex_q[:, TLO - 1 : TLO] + adv_q[:, TLO - 1 : TLO],
        ],
        axis=1,
    )


def make_fused_diag(B, LW, NO, mode, chunk=256, tile_b=64, tile_lw=8192,
                    tile_lo=1024):
    ns = LW // tile_lw
    assert NO == ns * tile_lo
    out_lo = tile_lo // 8 if mode == "noout" else tile_lo
    tri_n = chunk if mode not in ("nomm", "hillis", "roll") else 8

    def kernel(a_ref, b_ref, o_ref, l_ref, tri_ref, out_ref, edge_ref,
               t_ref, q_ref, carry_ref):
        _kernel_words(a_ref, b_ref, out_ref, edge_ref, caller=False)
        _lift_variant(
            o_ref[:], l_ref[:], tri_ref[:], t_ref, q_ref, carry_ref,
            pl.program_id(1), mode, chunk,
        )

    word_spec = pl.BlockSpec(
        (tile_b, tile_lw), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    op_spec = pl.BlockSpec(
        (tile_b, tile_lo), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (tile_b, out_lo), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    ir = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (tri_n, tri_n), 1)
    tri = jnp.clip(ir - ic, 0, 1).astype(jnp.bfloat16)

    @jax.jit
    def call(tw, qw, o, ln):
        out, edges, t_off, q_off = pl.pallas_call(
            kernel,
            grid=(B // tile_b, ns),
            in_specs=[
                word_spec, word_spec, op_spec, op_spec,
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
                out_spec,
                out_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, N_STATS), jnp.int32),
                jax.ShapeDtypeStruct((B, 128 * ns), jnp.int32),
                jax.ShapeDtypeStruct((B, ns * out_lo), jnp.int32),
                jax.ShapeDtypeStruct((B, ns * out_lo), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.int32)],
        )(tw, qw, o, ln, tri)
        return out, t_off, q_off

    return call


def make_noselect_inputs(ops, lens):
    o32 = ops.astype(np.int32)
    pad = o32 == 0
    is_i = o32 == OP_I
    is_s = o32 == OP_S
    is_d = o32 == OP_D
    adv_t = np.where(pad | is_i | is_s, 0, lens).astype(np.int32)
    adv_q = np.where(pad | is_d, 0, lens).astype(np.int32)
    return adv_t, adv_q


def main():
    if jax.default_backend() != "tpu":
        print("diagnostic is TPU-only")
        return
    B, L = 128, 1 << 20
    LW, NO = L // 4, L // 32
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT-", np.uint8)
    t0 = alpha[rng.integers(0, 5, size=(B, L))]
    q0 = alpha[rng.integers(0, 5, size=(B, L))]
    tw = jax.device_put(jnp.asarray(t0.view("<i4")))
    qw = jax.device_put(jnp.asarray(q0.view("<i4")))
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    ops = op_chars[rng.integers(0, 5, size=(B, NO))]
    lens = np.full((B, NO), 32, np.int32)
    o_d = jax.device_put(jnp.asarray(ops))
    ln_d = jax.device_put(jnp.asarray(lens))
    at, aq = make_noselect_inputs(ops, lens)
    at_d = jax.device_put(jnp.asarray(at))
    aq_d = jax.device_put(jnp.asarray(aq))

    calls = {
        "full": (make_fused_diag(B, LW, NO, "full"), o_d, ln_d),
        "noout": (make_fused_diag(B, LW, NO, "noout"), o_d, ln_d),
        "noselect": (make_fused_diag(B, LW, NO, "noselect"), at_d, aq_d),
        "nomm": (make_fused_diag(B, LW, NO, "nomm"), o_d, ln_d),
        "hillis": (make_fused_diag(B, LW, NO, "hillis"), o_d, ln_d),
        "roll": (make_fused_diag(B, LW, NO, "roll"), o_d, ln_d),
    }

    # correctness gate for the scan variants vs the jnp reference
    from wgatools_tpu.ops.liftover import _liftover_scan_impl

    want_t, want_q = (
        np.asarray(a) for a in _liftover_scan_impl(o_d, ln_d, False, False)
    )
    for name in ("full", "hillis", "roll"):
        _, t_off, q_off = calls[name][0](tw, qw, calls[name][1], calls[name][2])
        assert np.array_equal(np.asarray(t_off), want_t), name
        assert np.array_equal(np.asarray(q_off), want_q), name
        print(f"{name}: offsets parity OK", file=sys.stderr, flush=True)

    def make_runner(call, a3, a4):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(tw, iters):
            def body(_, carry):
                tw, acc = carry
                stats, t_off, q_off = call(tw, qw, a3, a4)
                acc = (
                    acc
                    + jnp.sum(stats)
                    + jnp.sum(t_off[:, ::128])
                    + jnp.sum(q_off[:, ::128])
                )
                tw = tw.at[0, 0].set(jnp.int32(0x41414141) + (acc & 3))
                return (tw, acc)

            _, acc = lax.fori_loop(0, iters, body, (tw, jnp.int32(0)))
            return acc

        return run_iters

    runners = {
        n: make_runner(c, a3, a4) for n, (c, a3, a4) in calls.items()
    }
    LO, HI = 4, 36

    def run_batch(name, iters):
        start = time.perf_counter()
        cs = int(np.asarray(runners[name](tw, iters)))
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
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{name:9s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
