"""On-chip gate + A/B for the nibble-packed (4-bit SWAR, 8 cols/word)
classify kernel vs the production byte-word (SWAR, 4 cols/word) kernel.

Gate first (CLAUDE.md rule: every new formulation must prove itself on
silicon -- a multiply-free ladder once passed interpret mode and
corrupted on chip), then same-process alternating marginal rates at the
production shape.

  w32   classify_stat_pallas_words   tile (32, 8192)   [round-3 default]
  w64   classify_stat_pallas_words   tile (64, 8192)   [fused16 tile]
  n32   classify_stat_pallas_nibbles tile (32, 4096)   same cols/tile
  n64   classify_stat_pallas_nibbles tile (64, 4096)
  n64w  classify_stat_pallas_nibbles tile (64, 8064)   2x cols/tile
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
    classify_stat_pallas_nibbles,
    classify_stat_pallas_words,
    pack_nibble_words,
)


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
    tw_d = jax.device_put(jnp.asarray(t0.view("<i4")))
    qw_d = jax.device_put(jnp.asarray(q0.view("<i4")))
    tn, qn = pack_nibble_words(t0, q0)
    tn_d = jax.device_put(jnp.asarray(tn))
    qn_d = jax.device_put(jnp.asarray(qn))

    # ------------------------------------------------------------------
    # ON-CHIP PARITY GATE: nibble kernel (both category tables, both row
    # tiles) must equal the jnp oracle bit-for-bit on silicon.
    # ------------------------------------------------------------------
    t_small = t0[:, : 1 << 16]
    q_small = q0[:, : 1 << 16]
    lens_small = np.minimum(lens_np, 1 << 16)
    tns, qns = pack_nibble_words(t_small, q_small)
    for caller in (False, True):
        want = np.asarray(
            classify_stat_jnp(
                jnp.asarray(t_small), jnp.asarray(q_small),
                jnp.asarray(lens_small), caller=caller,
            )
        )
        for tb, tlw in ((32, 4096), (64, 4096), (64, 8064), (8, 128)):
            got = np.asarray(
                classify_stat_pallas_nibbles(
                    jnp.asarray(tns), jnp.asarray(qns),
                    jnp.asarray(lens_small), tile_b=tb, tile_lw=tlw,
                    caller=caller,
                )
            )
            assert np.array_equal(got, want), (
                f"ON-CHIP NIBBLE MISMATCH caller={caller} tile=({tb},{tlw})\n"
                f"got:\n{got[:4]}\nwant:\n{want[:4]}"
            )
    print("on-chip nibble==jnp parity gate: OK (2 tables x 4 tilings)",
          file=sys.stderr)

    # ------------------------------------------------------------------
    # Same-process alternating A/B at production shape.
    # ------------------------------------------------------------------
    variants = {
        "w32": (
            lambda t, q: classify_stat_pallas_words(
                t, q, lens_d, tile_b=32, tile_lw=8192
            ),
            tw_d, qw_d, True,
        ),
        "w64": (
            lambda t, q: classify_stat_pallas_words(
                t, q, lens_d, tile_b=64, tile_lw=8192
            ),
            tw_d, qw_d, True,
        ),
        "n32": (
            lambda t, q: classify_stat_pallas_nibbles(
                t, q, lens_d, tile_b=32, tile_lw=4096
            ),
            tn_d, qn_d, False,
        ),
        "n64": (
            lambda t, q: classify_stat_pallas_nibbles(
                t, q, lens_d, tile_b=64, tile_lw=4096
            ),
            tn_d, qn_d, False,
        ),
        "n64w": (
            lambda t, q: classify_stat_pallas_nibbles(
                t, q, lens_d, tile_b=64, tile_lw=8064
            ),
            tn_d, qn_d, False,
        ),
    }

    def make_runner(call, word):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_iters(t, q, iters):
            def body(_, carry):
                t, acc = carry
                acc = acc + jnp.sum(call(t, q))
                if word:
                    t = t.at[0, 0].set(jnp.int32(0x41414141) + (acc & 3))
                else:
                    # all-valid nibble codes (1..4 in the low nibble)
                    t = t.at[0, 0].set(jnp.int32(0x11111111) + (acc & 3))
                return (t, acc)

            _, acc = lax.fori_loop(0, iters, body, (t, jnp.int32(0)))
            return acc

        return run_iters

    runners = {
        n: (make_runner(c, w), a, b) for n, (c, a, b, w) in variants.items()
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
