"""On-chip gate + A/B for the CATEGORY-plane classify kernel (round 5:
host 64K-LUT classification, one one-hot nibble per column -- half the
input of the two nibble planes and ~40% fewer kernel vreg-ops) vs the
round-4 production nibble kernel, standalone AND fused.

Gate first (CLAUDE.md rule: every new formulation must prove itself on
silicon -- interpret mode cannot catch Mosaic lowering corruption), then
same-process alternating marginal rates at the production shape.

  n64     classify_stat_pallas_nibbles   tile (64, 4096)  [r4 production]
  c64     classify_stat_pallas_cat       tile (64, 4096)  same cols/tile
  c64w    classify_stat_pallas_cat       tile (64, 8064)  2x cols/tile
  fn      fused_adv16 nibble g8 mm raw   (64, 4096)       [r4 flagship]
  fc      fused_adv16 cat    g8 mm raw   (64, 4096)
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
    classify_stat_jnp,
    classify_stat_pallas_cat,
    classify_stat_pallas_nibbles,
    pack_cat_nibbles,
    pack_nibble_words,
)
from wgatools_tpu.ops.fused import classify_liftover_fused_adv16  # noqa: E402
from wgatools_tpu.ops.liftover import pack_ops_sums  # noqa: E402


def main():
    assert jax.default_backend() == "tpu", "on-chip gate needs the TPU"
    B, L = 128, 1 << 20
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT-", dtype=np.uint8)
    t0 = alphabet[rng.integers(0, 5, size=(B, L))]
    q0 = alphabet[rng.integers(0, 5, size=(B, L))]
    lens_np = np.full(B, L, np.int32)
    lens_np[3] = L - 5  # a padded row so the finish corrections run
    t0[3, L - 5 :] = ord("-")
    q0[3, L - 5 :] = ord("-")
    lens_d = jax.device_put(jnp.asarray(lens_np))
    tn, qn = pack_nibble_words(t0, q0)
    tn_d = jax.device_put(jnp.asarray(tn))
    qn_d = jax.device_put(jnp.asarray(qn))
    cw = pack_cat_nibbles(t0, q0)
    cw_d = jax.device_put(jnp.asarray(cw))

    # op tables at the production op density (mean run 32 over 1M cols
    # per row -> 32K ops per row, g8 words)
    n_ops = (L // 32) & ~15
    op_chars = np.frombuffer(b"M=XIDS", np.uint8)
    ops_np = op_chars[rng.integers(0, 6, (B, n_ops))]
    oplens_np = rng.integers(0, 64, (B, n_ops)).astype(np.int32)
    st, sq = pack_ops_sums(ops_np, oplens_np, group=8)
    st_d = jax.device_put(jnp.asarray(st))
    sq_d = jax.device_put(jnp.asarray(sq))

    # ------------------------------------------------------------------
    # ON-CHIP PARITY GATES (both category tables, odd-row batch incl.)
    # ------------------------------------------------------------------
    t_small = t0[:, : 1 << 16]
    q_small = q0[:, : 1 << 16]
    lens_small = np.minimum(lens_np, 1 << 16)
    cws = pack_cat_nibbles(t_small, q_small)
    for caller in (False, True):
        want = np.asarray(
            classify_stat_jnp(
                jnp.asarray(t_small), jnp.asarray(q_small),
                jnp.asarray(lens_small), caller=caller,
            )
        )
        for tb, tlw in ((32, 4096), (64, 4096), (64, 8064), (8, 128)):
            got = np.asarray(
                classify_stat_pallas_cat(
                    jnp.asarray(cws), jnp.asarray(lens_small),
                    tile_b=tb, tile_lw=tlw, caller=caller,
                )
            )
            assert np.array_equal(got, want), (
                f"ON-CHIP CAT MISMATCH caller={caller} tile=({tb},{tlw})\n"
                f"got:\n{got[:4]}\nwant:\n{want[:4]}"
            )
    # odd-row (non-multiple-of-8) edge shape: B=9
    got9 = np.asarray(
        classify_stat_pallas_cat(
            jnp.asarray(cws[:9]), jnp.asarray(lens_small[:9])
        )
    )
    want9 = np.asarray(
        classify_stat_jnp(
            jnp.asarray(t_small[:9]), jnp.asarray(q_small[:9]),
            jnp.asarray(lens_small[:9]),
        )
    )
    assert np.array_equal(got9, want9), "ON-CHIP CAT ODD-ROW MISMATCH"
    print("on-chip cat==jnp parity gate: OK (2 tables x 4 tilings + B=9)",
          file=sys.stderr)

    # fused catmode gate vs the fused nibble form (same scan config)
    f_want = classify_liftover_fused_adv16(
        jnp.asarray(pack_nibble_words(t_small, q_small)[0]),
        jnp.asarray(pack_nibble_words(t_small, q_small)[1]),
        jnp.asarray(lens_small),
        st_d[:, :128], sq_d[:, :128],
        nibble=True, scan_mode="mm", raw_sums=True,
    )
    f_got = classify_liftover_fused_adv16(
        jnp.asarray(cws), None, jnp.asarray(lens_small),
        st_d[:, :128], sq_d[:, :128],
        catmode=True, scan_mode="mm", raw_sums=True,
    )
    for g, w in zip(f_got, f_want):
        assert np.array_equal(np.asarray(g), np.asarray(w)), (
            "ON-CHIP FUSED CATMODE MISMATCH"
        )
    print("on-chip fused catmode==nibble parity gate: OK", file=sys.stderr)

    # ------------------------------------------------------------------
    # Same-process alternating A/B at production shape.
    # ------------------------------------------------------------------
    def fused_n(t, q):
        s, ta, qa = classify_liftover_fused_adv16(
            t, q, lens_d, st_d, sq_d,
            nibble=True, scan_mode="mm", raw_sums=True,
        )
        return jnp.sum(s) + jnp.sum(ta) + jnp.sum(qa)

    def fused_c(c, _):
        s, ta, qa = classify_liftover_fused_adv16(
            c, None, lens_d, st_d, sq_d,
            catmode=True, scan_mode="mm", raw_sums=True,
        )
        return jnp.sum(s) + jnp.sum(ta) + jnp.sum(qa)

    variants = {
        "n64": (
            lambda t, q: jnp.sum(classify_stat_pallas_nibbles(
                t, q, lens_d, tile_b=64, tile_lw=4096
            )),
            tn_d, qn_d, 0x11111111,
        ),
        "c64": (
            lambda c, _: jnp.sum(classify_stat_pallas_cat(
                c, lens_d, tile_b=64, tile_lw=4096
            )),
            cw_d, cw_d, 0x11111111,
        ),
        "c64w": (
            lambda c, _: jnp.sum(classify_stat_pallas_cat(
                c, lens_d, tile_b=64, tile_lw=8064
            )),
            cw_d, cw_d, 0x11111111,
        ),
        "fn": (fused_n, tn_d, qn_d, 0x11111111),
        "fc": (fused_c, cw_d, cw_d, 0x11111111),
    }

    def make_runner(call, seedw):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, iters):
            def body(_, carry):
                t, acc = carry
                acc = acc + call(t, q)
                # feed the checksum back through valid codes so the
                # compiler cannot hoist anything out of the loop
                t = t.at[0, 0].set(jnp.int32(seedw) + (acc & 3))
                return (t, acc)

            _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
            return acc

        return run_iters

    runners = {
        n: (make_runner(c, s), a, b) for n, (c, a, b, s) in variants.items()
    }
    LO, HI = 4, 44

    def run_batch(r, a, b, iters):
        start = time.perf_counter()
        cs = int(np.asarray(r(a, b, iters)))
        assert cs != 0
        return time.perf_counter() - start

    for n, (r, a, b) in runners.items():
        print(f"warm {n}", file=sys.stderr)
        run_batch(r, a, b, LO)
        run_batch(r, a, b, HI)

    lo_t = {n: [] for n in runners}
    hi_t = {n: [] for n in runners}
    for rd in range(7):
        for n, (r, a, b) in runners.items():
            lo_t[n].append(run_batch(r, a, b, LO))
            hi_t[n].append(run_batch(r, a, b, HI))
        print(f"round {rd} done", file=sys.stderr)

    for n in runners:
        tl, th = min(lo_t[n]), min(hi_t[n])
        rate = B * L * (HI - LO) / (th - tl) / 1e9 if th > tl else float("nan")
        print(f"{n:5s} marginal {rate:8.1f} Gcol/s  lo={tl:.3f} hi={th:.3f}")


if __name__ == "__main__":
    main()
