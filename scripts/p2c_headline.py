"""Head-to-head on the reference's OWN headline benchmark: `wgatools p2c`
on a whole-genome PAF with ~2.18 Gbp of aligned columns (maize
Zm-CML333; mean 3.69 s on the authors' workstation,
/root/reference/README.md:458-461, benchmark.csv:2).

Builds a PAF of the same aligned-column volume and record shape
(~2000 records x ~1000 CIGAR runs, geometric run lengths, mean ~1090)
and times `wgatools-tpu paf2chain` end-to-end.

Measured 2026-08-20 (this box, single thread, subprocess wall time
including interpreter startup, best of 3):
  wall 0.42 s  (vs reference 3.69 s -> 8.8x)
  re-measured after the round-5 parity hardening (strict u64 field
  grammar + chain-machine gates): 0.49-0.52 s -> 7.1-7.6x
  ~= 5+ Gbp of aligned columns/s end-to-end through the C++ CIGAR
  tokenizer + chain-line formatter (JAX_PLATFORMS=cpu keeps the axon
  sitecustomize from paying its ~1.9 s remote-TPU registration, which a
  host-only conversion never needs).
"""

import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(path, target=2_180_000_000, seed=7):
    rng = np.random.default_rng(seed)
    total = 0
    k = 0
    lines = []
    while total < target:
        n = 1000
        ops = np.array(list("=XID"))[
            np.concatenate([[0], rng.integers(1, 4, n - 1)]).cumsum() % 4
        ]
        lens = rng.geometric(1 / 1090, n)
        tadv = int(lens[(ops == "=") | (ops == "X") | (ops == "D")].sum())
        qadv = int(lens[(ops == "=") | (ops == "X") | (ops == "I")].sum())
        cols = int(lens.sum())
        total += cols
        cg = "".join(f"{l}{o}" for o, l in zip(ops, lens))
        m = int(lens[ops == "="].sum())
        lines.append(
            f"q{k}\t{qadv}\t0\t{qadv}\t+\tt{k}\t{tadv}\t0\t{tadv}\t"
            f"{m}\t{cols}\t60\tcg:Z:{cg}\n"
        )
        k += 1
    with open(path, "w") as f:
        f.write("".join(lines))
    return k, total


def main():
    paf = "/tmp/p2c_headline.paf"
    out = "/tmp/p2c_headline.chain"
    k, total = build(paf)
    print(f"{k} records, {total / 1e9:.3f} Gbp aligned columns", flush=True)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    best = min(
        _one(paf, out, env) for _ in range(3)
    )
    print(f"paf2chain wall {best:.2f} s  (reference p2c: 3.69 s -> "
          f"{3.69 / best:.2f}x)")


def _one(paf, out, env):
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-m", "wgatools_tpu", "paf2chain", paf,
         "-o", out, "-r"],
        check=True, env=env, cwd=REPO,
    )
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
