#!/bin/bash
# CPU follow-on chain after the v1 dihedral-TTA inference:
#   1. wait for eval_summary_v1dih.json (v1dih inference+eval in flight)
#   2. protocol-correct re-score of the parity single-forward V2 maps
#      (v2aug0) — the honest "semtpu single forward" headline number
#   3. mean ensemble of the two dihedral map sets + score
# Bounded waits; safe to relaunch (existence-guarded stages).
#
# Usage: bash scripts/dih_chain.sh >> /root/repo/dih_chain.log 2>&1
set -u
cd /root/repo

note() { echo "[dih $(date +%H:%M:%S)] $*"; }

wait_for_file() {
  local path=$1 s=${2:-120} max=${3:-60} i=0
  while [ ! -e "$path" ]; do
    i=$((i + 1))
    [ "$i" -gt "$max" ] && { note "gave up waiting for $path"; return 1; }
    sleep "$s"
  done
}

wait_for_file run_r2/eval_summary_v1dih.json 120 90 || exit 1
note "v1dih scored"

if [ ! -f run_r2/eval_summary_v2aug0_fill.json ]; then
  note "re-scoring v2aug0 (parity single forward) with the protocol sweep"
  timeout 7200 python scripts/eval_run.py run_r2 --cpu \
    --predictions run_r2/Output_Masks_UNet_v2aug0 \
    --summary-name eval_summary_v2aug0_fill.json \
    || note "v2aug0 re-score failed rc=$?"
fi

if [ ! -f run_r2/eval_summary_ens_dih.json ]; then
  note "dihedral mean ensemble (v1dih + v2dih)"
  timeout 10800 python scripts/ensemble_eval.py run_r2 ens_dih \
    run_r2/Output_Masks_UNet_v1dih run_r2/Output_Masks_UNet_v2dih --cpu \
    || note "dih ensemble failed rc=$?"
fi
note "chain complete"
