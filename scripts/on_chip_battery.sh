#!/usr/bin/env bash
# One-command measurement battery for when the TPU tunnel is healthy.
# Runs: device probe -> histogram-kernel sweep -> headline bench.
# Every device job runs under `timeout` with SIGTERM margin (a SIGKILLed
# client mid-compile can wedge the tunnel for hours — CLAUDE.md).
#
# Usage: bash scripts/on_chip_battery.sh [outdir] [--msn1 DIR]
#   --msn1 DIR  also run the real-data MSN1 quality-floor parity module
#               (tests/test_msn1_parity.py) against the 5k fold sample in
#               DIR (msn1.fold1.{train,vali,test}.5k.txt — fetch with
#               scripts/fetch_msn1.sh where the network allows) and append
#               the floors to the battery output.
set -u -o pipefail
FAIL=0
OUT="/tmp/qrtpu_battery"
MSN1_DIR=""
while [ $# -gt 0 ]; do
  case "$1" in
    --msn1) MSN1_DIR="$2"; shift 2 ;;
    *) OUT="$1"; shift ;;
  esac
done
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site

echo "== probe =="
if ! timeout -k 30 120 python -c \
    "import jax, jax.numpy as jnp; jnp.arange(4).sum().block_until_ready(); print('device ok:', jax.devices()[0])"; then
  echo "device unresponsive — aborting battery"
  exit 1
fi

echo "== histogram kernel sweep (tile/G + one-hot variants) =="
timeout -k 60 1800 python scripts/bench_histkernel.py 2>&1 | tee "$OUT/histkernel.txt" \
  || { echo "!! kernel sweep FAILED (rc=$?)"; FAIL=1; }

echo "== headline bench (scoring + train s/tree, level+bestk+best) =="
timeout -k 60 3600 python bench.py 2>"$OUT/bench.stderr" | tee "$OUT/bench.json" \
  || { echo "!! bench FAILED (rc=$?)"; FAIL=1; }
tail -5 "$OUT/bench.stderr"

echo "== best-k A/B (exact vs k=2/4/8 vs level, 100 steady iters) =="
# retry loop: the tunnel shows intermittent multi-minute stalls; the
# script writes docs/sweeps/<date>-bestk.json incrementally and resumes
for i in 1 2 3; do
  timeout -s TERM -k 60 1800 python scripts/bench_bestk.py \
    2>&1 | tee -a "$OUT/bestk.txt" && break
  echo "bestk attempt $i stalled; retrying"
done

echo "== bin-count sweep (63/127/255 x level/best/bestk, timing+quality) =="
for i in 1 2 3 4; do
  timeout -s TERM -k 60 1800 python scripts/bench_bins.py \
    2>&1 | tee -a "$OUT/bins.txt" && break
  echo "bins attempt $i stalled; retrying"
done

echo "== DART per-iteration (MSLR + 540k scales, current kernels) =="
for i in 1 2 3; do
  timeout -s TERM -k 60 1800 python scripts/bench_dart.py \
    2>&1 | tee -a "$OUT/dart.txt" && break
  echo "dart attempt $i stalled; retrying"
done

if [ -n "$MSN1_DIR" ]; then
  echo "== MSN1 real-data quality floors (test-lambdamart.cc:135-137 etc.) =="
  if [ ! -f "$MSN1_DIR/msn1.fold1.train.5k.txt" ]; then
    echo "!! --msn1: $MSN1_DIR has no msn1.fold1.train.5k.txt"; FAIL=1
  else
    QUICKRANK_MSN1_DIR="$MSN1_DIR" timeout -k 60 3600 \
      python -m pytest tests/test_msn1_parity.py -v -rs 2>&1 \
      | tee "$OUT/msn1_floors.txt" \
      || { echo "!! MSN1 floors FAILED (rc=$?)"; FAIL=1; }
  fi
fi

if [ "$FAIL" -ne 0 ]; then
  echo "== battery INCOMPLETE (failures above); outputs in $OUT =="
  exit 1
fi
echo "== done; outputs in $OUT =="
