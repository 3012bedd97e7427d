#!/bin/bash
# Round-4 unattended TPU chain (VERDICT r3 items 2, 4, 5, 6, 9):
#
#   1. wait for the CycleGAN roofline profile to finish (don't timeshare
#      the chip while it measures); adopt the winning remat mode if it
#      beats "none" by >= 1.15x
#   2. run_t0: ONE uninterrUPTED full-budget timed run, seed 0, at the
#      final operating point (V2 config: val-loss monitor + early stop,
#      aug off, anti-collapse knobs) — steps 0-6b; per-step times land in
#      run_t0/timings.txt automatically
#   3. eval_run run_t0 (protocol sweep) -> the single-forward parity row
#   4. classifier: train self-supervised, step 7, leak-free calibration
#      (threshold picked on one half of GT, gain reported on the other)
#   5. dihedral-TTA variant of run_t0's UNet -> the headline row
#   6. run_s1 / run_s2 (seeds 1/2, same config) + eval + TTA variants
#   7. cross-seed ensembles (single-forward AND dihedral) + variance report
#
# Every stage is output-guarded — safe to relaunch any number of times.
# Usage: nohup bash scripts/round4_chain.sh >> /root/repo/round4_chain.log 2>&1 &
set -u
cd /root/repo

note() { echo "[r4chain $(date +%H:%M:%S)] $*"; }

probe() {
  # backend init through the tunnel has been observed taking >2 min while
  # still healthy — keep the probe window generous
  timeout 240 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(())*2))" \
    >/dev/null 2>&1
}

wait_for_tunnel() {
  while ! probe; do
    note "tunnel down; sleeping 5 min"
    sleep 300
  done
}

PIPE_FLAGS="--num-simulated-masks 1000 --wgan-epochs 1000 --cyclegan-epochs 50 \
  --unet-epochs 50 --cyclegan-label-smoothing-factor 0.1 \
  --cyclegan-gaussian-noise-value 0.15 --cyclegan-checkpoint-every 10 \
  --cyclegan-checkpoint auto --metadata-bar-rows 56 \
  --unet-checkpoint-monitor val_loss --unet-early-stopping-patience 12 \
  --skip-completed-steps true"

# ---- 1. roofline profile gate + remat adoption --------------------------
for i in $(seq 1 24); do
  [ -f PROFILE_CYCLEGAN.json ] && break
  note "waiting for roofline profile ($i/24)"
  sleep 300
done
REMAT=$(python - <<'EOF'
import json, os
mode = "none"
try:
    r = json.load(open("PROFILE_CYCLEGAN.json"))
    best, bs = "none", 1.0
    for m in ("blocks", "full"):
        s = r.get(f"remat_{m}", {}).get("speedup_vs_none", 0)
        if s and s > bs:
            best, bs = m, s
    if bs >= 1.15:
        mode = best
except Exception:
    pass
print(mode)
EOF
)
note "remat mode for the runs: $REMAT"
PIPE_FLAGS="$PIPE_FLAGS --cyclegan-remat $REMAT"

run_pipeline() {  # dir, seed
  local dir=$1 seed=$2
  if [ ! -d "$dir/Input_Images" ]; then
    note "staging $dir inputs"
    python scripts/prepare_run.py "$dir" || return 1
  fi
  note "=== $dir steps 0-6b (seed $seed) ==="
  python scripts/run_with_retry.py --root-dir /root/repo/$dir \
    --log /root/repo/$dir/pipeline.log --max-retries 60 -- \
    python -m semtpu.pipeline --root-dir /root/repo/$dir \
    $PIPE_FLAGS --seed $seed --steps 0,1,2,3,4,5,6a,6b
  note "$dir pipeline rc=$?"
}

eval_dir() {  # dir, extra args...
  local dir=$1; shift
  for attempt in 1 2 3; do
    wait_for_tunnel
    timeout 2400 python scripts/eval_run.py $dir "$@" && return 0
    note "eval_run $dir attempt $attempt failed; retrying"
    sleep 120
  done
  return 1
}

tta_variant() {  # run_dir, out_name (model auto-picked: latest)
  local run=$1 out=$2
  local summary="$run/eval_summary_${out#Output_Masks_UNet_}.json"
  [ -f "$summary" ] && { note "$summary present; skipping"; return 0; }
  local model
  model=$(ls -d $run/3_UNet/Models/*/ 2>/dev/null | sort | tail -1)
  [ -z "$model" ] && { note "$run has no UNet model"; return 1; }
  for attempt in 1 2 3; do
    wait_for_tunnel
    timeout 5400 python scripts/infer_variant.py "$run" "$model" "$out" \
      --tta-dihedral && return 0
    note "infer_variant $out attempt $attempt failed; retrying"
    sleep 120
  done
  return 1
}

# ---- 2+3. timed seed-0 run + parity eval ---------------------------------
wait_for_tunnel
if [ ! -f run_t0/eval_summary.json ]; then
  run_pipeline run_t0 0
  eval_dir run_t0 || note "run_t0 eval FAILED"
else
  note "run_t0 already evaluated"
fi

# ---- 4. classifier train + step 7 + leak-free calibration ----------------
if [ ! -f run_t0/classifier_calibration.json ] && [ -f run_t0/eval_summary.json ]; then
  if [ ! -d run_t0/Classifier ]; then
    note "=== training classifier (self-supervised) ==="
    wait_for_tunnel
    timeout 7200 python scripts/train_classifier.py run_t0 \
      --out run_t0/Classifier || note "classifier training rc=$?"
  fi
  if [ -d run_t0/Classifier ]; then
    note "=== step 7 + calibrated classifier eval ==="
    wait_for_tunnel
    timeout 2400 python -m semtpu.pipeline --root-dir /root/repo/run_t0 \
      --classifier-model-dir /root/repo/run_t0/Classifier \
      --classifier-score-threshold 0.1 --metadata-bar-rows 56 --steps 7 \
      || note "step 7 rc=$?"
    eval_dir run_t0 --classifier run_t0/Classifier \
      --classifier-sweep "0.05,0.1,0.15,0.2,0.3,0.4,0.5" \
      --classifier-calibrate --classifier-threshold 0.1 \
      --summary-name eval_summary_classifier.json \
      || note "classifier eval rc=$?"
  fi
fi

# ---- 5. dihedral TTA headline variant ------------------------------------
[ -f run_t0/eval_summary.json ] && tta_variant run_t0 Output_Masks_UNet_dih

# ---- 6. seed runs ---------------------------------------------------------
for n in 1 2; do
  if [ ! -f run_s$n/eval_summary.json ]; then
    wait_for_tunnel
    run_pipeline run_s$n $n
    eval_dir run_s$n || note "run_s$n eval FAILED"
  else
    note "run_s$n already evaluated"
  fi
  [ -f run_s$n/eval_summary.json ] && tta_variant run_s$n Output_Masks_UNet_dih
done

# ---- 7. cross-seed ensembles + variance report ----------------------------
if [ -f run_s1/eval_summary.json ] && [ -f run_s2/eval_summary.json ]; then
  wait_for_tunnel
  if [ ! -f run_t0/eval_summary_ens_seeds.json ]; then
    timeout 2400 python scripts/ensemble_eval.py run_t0 ens_seeds \
      run_t0/Output_Masks_UNet run_s1/Output_Masks_UNet \
      run_s2/Output_Masks_UNet || note "single-forward ensemble rc=$?"
  fi
  if [ ! -f run_t0/eval_summary_ens_seeds_dih.json ] \
     && [ -f run_t0/eval_summary_dih.json ] \
     && [ -f run_s1/eval_summary_dih.json ] \
     && [ -f run_s2/eval_summary_dih.json ]; then
    timeout 2400 python scripts/ensemble_eval.py run_t0 ens_seeds_dih \
      run_t0/Output_Masks_UNet_dih run_s1/Output_Masks_UNet_dih \
      run_s2/Output_Masks_UNet_dih || note "dihedral ensemble rc=$?"
  fi
  python scripts/seed_variance_report.py run_t0/eval_summary.json \
    run_s1/eval_summary.json run_s2/eval_summary.json \
    --ensemble run_t0/eval_summary_ens_seeds.json \
    --ensemble run_t0/eval_summary_ens_seeds_dih.json \
    || note "variance report rc=$?"
fi

# ---- 8. TSEM variant with the round-3/4 quality levers (VERDICT item 9) --
# Superseded: the TSEM stage now lives in round5_chain.sh under a
# /tmp/r5_tsem.lock flock (ADVICE r4: the duplicated output-guarded stage
# here could race a concurrently-relaunched v2/v5 chain into two pipelines
# writing one run_tsem dir). Run round5_chain.sh for TSEM.
note "chain complete"
