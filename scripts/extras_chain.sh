#!/bin/bash
# Unattended extras chain, run AFTER/alongside complete_seed_runs.sh:
#
#   1. wait for the tunnel, then for the roofline profile to finish
#      (so TTA inference doesn't perturb its timing measurements)
#   2. flip-TTA re-inference of the round-3 v2 UNet (infer_variant --tta)
#   3. when run_s1 / run_s2 finish: flip-TTA variants of their UNets
#   4. median + TTA cross-seed ensembles, seed-variance report
#
# Every stage is guarded by an output-file existence check — safe to
# relaunch any number of times.
#
# Usage: bash scripts/extras_chain.sh >> /root/repo/extras.log 2>&1
set -u
cd /root/repo

V2_MODEL=run_r2/3_UNet/Models/2026-08-17_09-26-59

note() { echo "[extras $(date +%H:%M:%S)] $*"; }

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(())*2))" \
    >/dev/null 2>&1
}

wait_for_tunnel() {
  while ! probe; do
    note "tunnel down; sleeping 5 min"
    sleep 300
  done
}

wait_for_file() {  # path, what, [sleep_s]
  local path=$1 what=$2 s=${3:-300}
  while [ ! -e "$path" ]; do
    note "waiting for $what ($path)"
    sleep "$s"
  done
}

tta_variant() {  # run_dir, model_dir, out_name
  local run=$1 model=$2 out=$3
  if [ -f "$run/eval_summary_${out#Output_Masks_UNet_}.json" ]; then
    note "$run/$out already evaluated; skipping"
    return 0
  fi
  note "=== TTA variant $run/$out ==="
  wait_for_tunnel
  timeout 5400 python scripts/infer_variant.py "$run" "$model" "$out" --tta \
    || note "infer_variant $out failed rc=$?"
}

wait_for_tunnel
note "tunnel is up"

# profile writes PROFILE_CYCLEGAN.json last; don't timeshare the chip
# while it measures step times (seedchain runs it first)
for i in $(seq 1 12); do
  [ -f PROFILE_CYCLEGAN.json ] && break
  note "waiting for roofline profile to finish ($i/12)"
  sleep 300
done

tta_variant run_r2 "$V2_MODEL" Output_Masks_UNet_v2tta

# seed TTA variants once each seed's own eval exists (training finished)
for n in 1 2; do
  wait_for_file run_s$n/eval_summary.json "run_s$n completion" 600
  model=$(ls -d run_s$n/3_UNet/Models/*/ 2>/dev/null | sort | tail -1)
  if [ -n "$model" ]; then
    tta_variant run_s$n "$model" Output_Masks_UNet_tta
  else
    note "run_s$n has no UNet model dir — skipping TTA variant"
  fi
done

note "=== median + TTA ensembles ==="
wait_for_tunnel
if [ ! -f run_r2/eval_summary_ens_seeds_med.json ]; then
  timeout 2400 python scripts/ensemble_eval.py run_r2 ens_seeds_med \
    run_r2/Output_Masks_UNet_v2aug0 run_s1/Output_Masks_UNet \
    run_s2/Output_Masks_UNet --mode median || note "median ensemble rc=$?"
fi
if [ ! -f run_r2/eval_summary_ens_seeds_tta.json ] \
   && [ -d run_s1/Output_Masks_UNet_tta ] && [ -d run_s2/Output_Masks_UNet_tta ]; then
  timeout 2400 python scripts/ensemble_eval.py run_r2 ens_seeds_tta \
    run_r2/Output_Masks_UNet_v2tta run_s1/Output_Masks_UNet_tta \
    run_s2/Output_Masks_UNet_tta || note "tta ensemble rc=$?"
fi

note "=== seed-variance report ==="
python scripts/seed_variance_report.py run_r2/eval_summary_v2aug0.json \
  run_s1/eval_summary.json run_s2/eval_summary.json \
  --ensemble run_r2/eval_summary_ens_seeds.json || note "report rc=$?"
note "chain complete"
