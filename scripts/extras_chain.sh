#!/bin/bash
# Unattended extras chain, run AFTER/alongside complete_seed_runs.sh:
#
#   1. wait for the tunnel, then for the roofline profile to finish
#      (so TTA inference doesn't perturb its timing measurements)
#   2. flip-TTA re-inference of the round-3 v2 UNet (infer_variant --tta,
#      whole-image forward — same operating point as the step-6b baselines)
#   3. when run_s1 / run_s2 finish: flip-TTA variants of their UNets
#   4. median + TTA cross-seed ensembles, seed-variance report
#
# Every stage is guarded by an output-file existence check and bounded
# waits — safe to relaunch any number of times, never hangs forever.
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

wait_for_file() {  # path, what, [sleep_s], [max_attempts] -> rc 1 on timeout
  local path=$1 what=$2 s=${3:-300} max=${4:-60} i=0
  while [ ! -e "$path" ]; do
    i=$((i + 1))
    if [ "$i" -gt "$max" ]; then
      note "gave up waiting for $what ($path) after $max x ${s}s"
      return 1
    fi
    note "waiting for $what ($path) [$i/$max]"
    sleep "$s"
  done
}

tta_variant() {  # run_dir, model_dir, out_name — 3 attempts, tunnel-gated
  local run=$1 model=$2 out=$3
  local summary="$run/eval_summary_${out#Output_Masks_UNet_}.json"
  if [ -f "$summary" ]; then
    note "$summary already present; skipping"
    return 0
  fi
  note "=== TTA variant $run/$out ==="
  for attempt in 1 2 3; do
    wait_for_tunnel
    timeout 5400 python scripts/infer_variant.py "$run" "$model" "$out" --tta \
      && return 0
    note "infer_variant $out attempt $attempt failed; retrying"
    sleep 120
  done
  note "infer_variant $out FAILED after 3 attempts"
  return 1
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

# seed TTA variants once each seed's own eval exists (training finished);
# a seed that never finishes (10 h bound) is skipped, the rest continue
for n in 1 2; do
  if wait_for_file run_s$n/eval_summary.json "run_s$n completion" 600 60; then
    model=$(ls -d run_s$n/3_UNet/Models/*/ 2>/dev/null | sort | tail -1)
    if [ -n "$model" ]; then
      tta_variant run_s$n "$model" Output_Masks_UNet_tta
    else
      note "run_s$n has no UNet model dir — skipping TTA variant"
    fi
  fi
done

note "=== median + TTA ensembles ==="
wait_for_tunnel
if [ ! -f run_r2/eval_summary_ens_seeds_med.json ] \
   && [ -f run_s1/eval_summary.json ] && [ -f run_s2/eval_summary.json ]; then
  timeout 2400 python scripts/ensemble_eval.py run_r2 ens_seeds_med \
    run_r2/Output_Masks_UNet_v2aug0 run_s1/Output_Masks_UNet \
    run_s2/Output_Masks_UNet --mode median || note "median ensemble rc=$?"
fi
# guard on the eval summaries (success markers of a COMPLETE infer+eval),
# not the output dirs, which can exist half-written after a failed attempt
if [ ! -f run_r2/eval_summary_ens_seeds_tta.json ] \
   && [ -f run_r2/eval_summary_v2tta.json ] \
   && [ -f run_s1/eval_summary_tta.json ] && [ -f run_s2/eval_summary_tta.json ]; then
  timeout 2400 python scripts/ensemble_eval.py run_r2 ens_seeds_tta \
    run_r2/Output_Masks_UNet_v2tta run_s1/Output_Masks_UNet_tta \
    run_s2/Output_Masks_UNet_tta || note "tta ensemble rc=$?"
fi

note "=== seed-variance report ==="
if [ -f run_s1/eval_summary.json ] && [ -f run_s2/eval_summary.json ]; then
  python scripts/seed_variance_report.py run_r2/eval_summary_v2aug0.json \
    run_s1/eval_summary.json run_s2/eval_summary.json \
    --ensemble run_r2/eval_summary_ens_seeds.json \
    --ensemble run_r2/eval_summary_ens_seeds_med.json \
    --ensemble run_r2/eval_summary_ens_seeds_tta.json || note "report rc=$?"
else
  note "seed evals incomplete — skipping variance report"
fi
note "chain complete"
