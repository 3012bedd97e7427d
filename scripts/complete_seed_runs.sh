#!/bin/bash
# Unattended completion chain for the seed-variance runs (VERDICT r2 item 2)
# plus the CycleGAN roofline profile (item 5). Safe to relaunch: every stage
# is skip-completed / overwrite-idempotent.
#
#   1. wait for the TPU tunnel (probe from a fresh process every 5 min)
#   2. profile_cyclegan.py  (remat A/B + measured roofline, ~20 min)
#   3. run_with_retry: run_s1 steps 3-6b (auto-resumes from checkpoints_010)
#   4. eval_run run_s1
#   5. run_with_retry: run_s2 steps 3-6b
#   6. eval_run run_s2
#   7. cross-seed ensemble (v2 + s1 + s2) scored against the 40-image GT
#
# Usage: bash scripts/complete_seed_runs.sh >> /root/repo/seedchain.log 2>&1
set -u
cd /root/repo

note() { echo "[seedchain $(date +%H:%M:%S)] $*"; }

probe() {
  timeout 75 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(())*2))" \
    >/dev/null 2>&1
}

wait_for_tunnel() {
  while ! probe; do
    note "tunnel still down; sleeping 5 min"
    sleep 300
  done
  note "tunnel is up"
}

run_seed() {
  local n=$1
  note "=== run_s$n steps 3-6b ==="
  python scripts/run_with_retry.py --root-dir /root/repo/run_s$n \
    --log /root/repo/run_s$n/pipeline.log --max-retries 60 -- \
    python -m semtpu.pipeline --root-dir /root/repo/run_s$n \
    --num-simulated-masks 1000 --wgan-epochs 1000 --cyclegan-epochs 50 \
    --unet-epochs 50 --cyclegan-label-smoothing-factor 0.1 \
    --cyclegan-gaussian-noise-value 0.15 --cyclegan-checkpoint-every 10 \
    --cyclegan-checkpoint auto --metadata-bar-rows 56 \
    --unet-checkpoint-monitor val_loss --unet-early-stopping-patience 12 \
    --skip-completed-steps true --seed $n --steps 3,4,5,6a,6b
  note "run_s$n pipeline rc=$?"
  for attempt in 1 2 3; do
    wait_for_tunnel
    timeout 2400 python scripts/eval_run.py run_s$n \
      --summary-name eval_summary.json && break
    note "eval_run run_s$n attempt $attempt failed; retrying"
    sleep 120
  done
}

wait_for_tunnel

if [ ! -f PROFILE_CYCLEGAN.json ]; then
  note "=== CycleGAN roofline profile ==="
  timeout 2700 python scripts/profile_cyclegan.py \
    || note "profile failed (rc=$?) — continuing with seed runs"
else
  note "PROFILE_CYCLEGAN.json already present; skipping profile"
fi

if [ ! -f run_s1/eval_summary.json ]; then run_seed 1; else note "run_s1 already evaluated"; fi
if [ ! -f run_s2/eval_summary.json ]; then run_seed 2; else note "run_s2 already evaluated"; fi

note "=== cross-seed ensemble ==="
wait_for_tunnel
timeout 2400 python scripts/ensemble_eval.py run_r2 ens_seeds \
  run_r2/Output_Masks_UNet_v2aug0 run_s1/Output_Masks_UNet run_s2/Output_Masks_UNet \
  || note "ensemble failed rc=$?"
note "chain complete"
