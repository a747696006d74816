#!/usr/bin/env bash
# One-command measurement battery for when the TPU tunnel is healthy.
# Runs: device probe -> histogram-kernel sweep -> headline bench.
# Every device job runs under `timeout` with SIGTERM margin (a SIGKILLed
# client mid-compile can wedge the tunnel for hours — CLAUDE.md).
#
# Usage: bash scripts/on_chip_battery.sh [outdir]
set -u -o pipefail
FAIL=0
OUT="${1:-/tmp/qrtpu_battery}"
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

echo "== headline bench (scoring + train s/tree, level+best) =="
timeout -k 60 3600 python bench.py 2>"$OUT/bench.stderr" | tee "$OUT/bench.json" \
  || { echo "!! bench FAILED (rc=$?)"; FAIL=1; }
tail -5 "$OUT/bench.stderr"

if [ "$FAIL" -ne 0 ]; then
  echo "== battery INCOMPLETE (failures above); outputs in $OUT =="
  exit 1
fi
echo "== done; outputs in $OUT =="
