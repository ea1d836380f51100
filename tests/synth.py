"""Synthetic alignment fixture generator for round-trip tests."""

import random

COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp(s: str) -> str:
    return s.translate(COMP)[::-1]


def random_ops(rng, n_runs, lead_trail_indel=False):
    """Run list [(op, len)] with no two adjacent same ops, starting/ending
    with '=' unless lead_trail_indel."""
    ops = []
    choices = "=XID"
    prev = None
    for _ in range(n_runs):
        op = rng.choice(choices)
        while op == prev:
            op = rng.choice(choices)
        ops.append((op, rng.randint(1, 30)))
        prev = op
    if not lead_trail_indel:
        ops.insert(0, ("=", rng.randint(5, 20)))
        ops.append(("=", rng.randint(5, 20)))
        ops = _merge_adjacent(ops)
    return ops


def _merge_adjacent(ops):
    out = []
    for op, n in ops:
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + n)
        else:
            out.append((op, n))
    return out


def build_alignment(rng, ops):
    """Returns (t_aln, q_aln) gapped alignment strings realizing ops."""
    bases = "ACGT"
    t_parts, q_parts = [], []
    for op, n in ops:
        if op == "=":
            s = "".join(rng.choice(bases) for _ in range(n))
            t_parts.append(s)
            q_parts.append(s)
        elif op == "X":
            for _ in range(n):
                a = rng.choice(bases)
                b = rng.choice(bases.replace(a, ""))
                t_parts.append(a)
                q_parts.append(b)
        elif op == "I":
            s = "".join(rng.choice(bases) for _ in range(n))
            t_parts.append("-" * n)
            q_parts.append(s)
        elif op == "D":
            s = "".join(rng.choice(bases) for _ in range(n))
            t_parts.append(s)
            q_parts.append("-" * n)
    return "".join(t_parts), "".join(q_parts)


def make_paf_case(seed, negative=False):
    """Build (paf_line, target_fasta, query_fasta) with consistent
    coordinates, =/X cigar, NM tag."""
    rng = random.Random(seed)
    ops = random_ops(rng, rng.randint(3, 12))
    t_aln, q_aln = build_alignment(rng, ops)
    t_region = t_aln.replace("-", "")
    q_region_aln = q_aln.replace("-", "")  # bases in alignment orientation

    t_flank_l = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 30)))
    t_flank_r = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 30)))
    q_flank_l = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 30)))
    q_flank_r = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 30)))

    t_genome = t_flank_l + t_region + t_flank_r
    ts = len(t_flank_l)
    te = ts + len(t_region)

    if negative:
        q_genome_region = revcomp(q_region_aln)
    else:
        q_genome_region = q_region_aln
    q_genome = q_flank_l + q_genome_region + q_flank_r
    qs = len(q_flank_l)
    qe = qs + len(q_genome_region)

    matches = sum(n for op, n in ops if op == "=")
    block = sum(n for op, n in ops)
    cg = "".join(f"{n}{op}" for op, n in ops)
    nm = block - matches
    strand = "-" if negative else "+"
    paf = (
        f"q1\t{len(q_genome)}\t{qs}\t{qe}\t{strand}\tt1\t{len(t_genome)}\t"
        f"{ts}\t{te}\t{matches}\t{block}\t255\tNM:i:{nm}\tcg:Z:{cg}"
    )
    t_fa = f">t1\n{t_genome}\n"
    q_fa = f">q1\n{q_genome}\n"
    return paf, t_fa, q_fa
