#!/usr/bin/env bash
# Worked example: the full wgatools-tpu pipeline on the bundled test data.
# Mirrors the reference README's usage (reference: README.md:200-420).
set -euo pipefail
W=${W:-wgatools-tpu}
DATA=${DATA:-/root/reference/test}
OUT=$(mktemp -d)
cd "$OUT"

echo "== conversions =="
$W maf2paf  "$DATA/test.maf"          -o test.paf
$W maf2chain "$DATA/test.maf"         -o test.chain
$W paf2chain "$DATA/testdotplot.paf"  -o dot.chain
$W chain2paf dot.chain                -o dot.paf

echo "== stdin piping (README round-trip) =="
cat "$DATA/testdotplot.paf" | $W paf2chain | $W chain2paf | head -1

echo "== statistics =="
$W stat "$DATA/test.maf" | head -3

echo "== variant calling (matches the reference README VCF) =="
$W call "$DATA/test.maf" -s -l0 2>/dev/null | head -12

echo "== index + region extraction =="
cp "$DATA/test.maf" .
$W maf-index test.maf
$W maf-ext test.maf -R ref.chr8:181470000-181470050 | head -4 | cut -c1-70

echo "== coverage + dotplot =="
$W pafcov "$DATA/testdotplot.paf" | head -3
$W dotplot -f paf "$DATA/testdotplot.paf" --out_format csv -l0 | head -4

echo "== parallel + device knobs =="
echo "  -t N            fork-pool record/genome-axis parallelism"
echo "  WGA_TPU_DEVICE=1 route large batches through the TPU kernels"
echo "  WGA_TPU_TRACE=d  write a jax.profiler trace"
echo "done: outputs in $OUT"
