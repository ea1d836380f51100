"""On-chip A/B: uniform-random columns vs make_corpus-realistic data
(round-2 VERDICT #8).

bench.py times uniform ACGT- columns with fixed 32-length runs.  Real
whole-genome alignments are ~97% '=' with geometric run lengths and SV
spikes (the C++ host path exploits exactly that).  The SWAR words kernel
and the fused combined loop are branchless -- rates should not depend on
content -- but tile-boundary corrections and the liftover limb values
differ, so this measures both workloads on both distributions with the
bench methodology (single-dispatch fori_loop, checksum feedback,
marginal rate, alternating variants).
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

from wgatools_tpu.ops.fused import classify_liftover_fused


def uniform_case(rng, B, L):
    alpha = np.frombuffer(b"ACGT-", np.uint8)
    t = alpha[rng.integers(0, 5, size=(B, L))]
    q = alpha[rng.integers(0, 5, size=(B, L))]
    n_ops = L // 32
    op_chars = np.frombuffer(b"M=XID", np.uint8)
    ops = op_chars[rng.integers(0, 5, size=(B, n_ops))]
    lens = np.full((B, n_ops), 32, np.int32)
    return t, q, ops, lens


def realistic_case(rng, B, L, n_ops):
    """make_corpus-style rows: geometric runs (mean 18), ~97% '=', SV
    spikes every ~200 runs; op tables with the same distribution."""
    sys.path.insert(0, "/root/repo/scripts")
    from make_corpus import realize, run_table

    t = np.empty((B, L), np.uint8)
    q = np.empty((B, L), np.uint8)
    for b in range(B):
        # enough runs to cover L columns, then crop
        vals, lens = run_table(rng, L // 12, mean_len=18, sv_every=200)
        tb, qb = realize(rng, vals, lens)
        if tb.size < L:
            reps = -(-L // tb.size)
            tb = np.tile(tb, reps)
            qb = np.tile(qb, reps)
        t[b] = tb[:L]
        q[b] = qb[:L]
    op_chars = np.frombuffer(b"=XID", np.uint8)
    # 97% '=' ops, geometric lens, SV spikes
    kind = rng.choice(4, size=(B, n_ops), p=[0.97, 0.01, 0.01, 0.01])
    ops = op_chars[kind]
    lens = rng.geometric(1 / 30.0, size=(B, n_ops)).astype(np.int32)
    big = rng.random((B, n_ops)) < 1 / 400.0
    lens[big] += rng.integers(60, 4000, size=int(big.sum())).astype(np.int32)
    lens = np.minimum(lens, 60000)
    return t, q, ops, lens


def main():
    on_tpu = jax.default_backend() == "tpu"
    B, L = (32, 1 << 22) if on_tpu else (4, 1 << 16)
    N_OPS = L // 32
    rng = np.random.default_rng(0)

    cases = {}
    for name, builder in (
        ("uniform", lambda: uniform_case(rng, B, L)),
        ("realistic", lambda: realistic_case(rng, B, L, N_OPS)),
    ):
        t, q, ops, lens = builder()
        cases[name] = dict(
            tw=jax.device_put(jnp.asarray(t.view("<i4"))),
            qw=jax.device_put(jnp.asarray(q.view("<i4"))),
            o=jax.device_put(jnp.asarray(ops)),
            ln=jax.device_put(jnp.asarray(lens)),
        )
    lens_d = jax.device_put(jnp.full(B, L, jnp.int32))

    interpret = not on_tpu

    def combined(tw, qw, o, ln):
        return classify_liftover_fused(
            tw, qw, lens_d, o, ln,
            tile_lw=8192, tile_lo=1024, scan_chunk=128,
            interpret=interpret,
        )

    # parity gate on the realistic case (uniform is gated by bench.py)
    from wgatools_tpu.ops.classify import classify_stat_jnp
    from wgatools_tpu.ops.liftover import _liftover_scan_impl

    c = cases["realistic"]
    f_stats, f_t, f_q = combined(c["tw"], c["qw"], c["o"], c["ln"])
    tb = np.ascontiguousarray(np.asarray(c["tw"])).view(np.uint8).reshape(B, L)
    qb = np.ascontiguousarray(np.asarray(c["qw"])).view(np.uint8).reshape(B, L)
    want = np.asarray(
        classify_stat_jnp(jnp.asarray(tb), jnp.asarray(qb), lens_d)
    )
    want_t, want_q = _liftover_scan_impl(c["o"], c["ln"], False, False)
    assert np.array_equal(np.asarray(f_stats), want), "realistic stats"
    assert np.array_equal(np.asarray(f_t), np.asarray(want_t))
    assert np.array_equal(np.asarray(f_q), np.asarray(want_q))
    print("realistic-case parity OK", file=sys.stderr, flush=True)
    if interpret:
        print("CPU interpret mode: correctness only")
        return

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_iters(tw, qw, o, ln, iters):
        def body(_, carry):
            tw, ln, acc = carry
            stats, t_off, q_off = combined(tw, qw, o, ln)
            acc = (
                acc
                + jnp.sum(stats)
                + jnp.sum(t_off[:, ::1024])
                + jnp.sum(q_off[:, ::1024])
            )
            tw = tw.at[0, 0].set(jnp.int32(0x41414141) + (acc & 3))
            ln = ln.at[0, 0].set(jnp.int32(1) + (acc & 7))
            return (tw, ln, acc)

        _, _, acc = lax.fori_loop(0, iters, body, (tw, ln, jnp.int32(0)))
        return acc

    LO, HI = 4, 36

    def run_batch(c, iters):
        start = time.perf_counter()
        cs = int(np.asarray(run_iters(c["tw"], c["qw"], c["o"], c["ln"], iters)))
        assert cs != 0
        return time.perf_counter() - start

    for name, c in cases.items():
        print(f"warm {name}", file=sys.stderr, flush=True)
        run_batch(c, LO)
        run_batch(c, HI)
    lo_t = {n: [] for n in cases}
    hi_t = {n: [] for n in cases}
    for rd in range(6):
        for name, c in cases.items():
            lo_t[name].append(run_batch(c, LO))
            hi_t[name].append(run_batch(c, HI))
        print(f"round {rd} done", file=sys.stderr, flush=True)
    for name in cases:
        tl, th = min(lo_t[name]), min(hi_t[name])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(
            f"{name:10s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}"
        )


if __name__ == "__main__":
    main()
