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

echo "== distributed mode (2 coordinated processes; stdout == serial) =="
PORT=$(( (RANDOM % 20000) + 20000 ))
for PID in 0 1; do
  PYTHONPATH= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=2 \
  JAX_COORDINATOR_ADDRESS=127.0.0.1:$PORT JAX_NUM_PROCESSES=2 \
  JAX_PROCESS_ID=$PID WGA_TPU_DIST=1 \
  $W stat test.maf > dist_stat.$PID 2>/dev/null &
done; wait
cmp <($W stat test.maf) dist_stat.0 && echo "  distributed stat == serial"

echo "== parallel + device knobs =="
echo "  -t N             fork-pool record/genome-axis parallelism"
echo "  WGA_TPU_DIST=1   multi-process mode (12 tool modes; see docs/SCALING.md)"
echo "  WGA_TPU_DEVICE=1 route large batches through the TPU kernels"
echo "  WGA_TPU_TRACE=d  write a jax.profiler trace"
echo "done: outputs in $OUT"
