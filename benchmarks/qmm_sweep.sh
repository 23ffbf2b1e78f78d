#!/bin/bash
# TN x NBUF sweep for the w4 pt decode kernel (r5: lm_head at 634 GB/s vs
# 819 roofline; per-layer shapes at ~600-730).  One subprocess per config
# (OMINIX_QMM_TN / OMINIX_QMM_NBUF are import/prepare-time), 100s settle
# between TPU processes (CLAUDE.md HBM release lag).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/qmm_sweep.log}
: > "$LOG"
run() {
  local tn=$1 nbuf=$2 shapes=$3
  echo "=== TN=$tn NBUF=$nbuf shapes=$shapes ===" | tee -a "$LOG"
  OMINIX_QMM_TN=$tn OMINIX_QMM_NBUF=$nbuf timeout 1200 \
    python benchmarks/qmm_bench.py --shapes "$shapes" --variants w4pt \
    --loops 640,3200 2>&1 | grep -v WARNING | tee -a "$LOG"
  echo "rc=$?" | tee -a "$LOG"
  sleep 110
}
# lm_head: the single biggest decode op (324.6 us/tok measured r5)
run 512 2 lmhead      # production default (baseline)
run 512 3 lmhead
run 512 4 lmhead
run 1024 2 lmhead
run 1024 3 lmhead
# per-layer shapes: NBUF deepening at the default TN
run 512 2 gateup,down,qkv,o   # baseline
run 512 3 gateup,down,qkv,o
echo "SWEEP DONE" | tee -a "$LOG"
