#!/bin/bash
# Round-5 unattended TPU chain — takes over from round4_chain_v2.sh after
# the in-flight run_s2 pipeline (run_with_retry pid in /tmp/r5_s2_retry.pid).
#
# Reordering vs v2 (VERDICT r4 "weak 1": sequencing keeps starving the
# highest-value items): the ~3.2 h TSEM run — the biggest still-open item —
# moves AHEAD of the ~2 h classifier stage and ahead of the cheap s1/s2 TTA
# rows, so a late wedge costs a nice-to-have instead of a VERDICT item.
# Order: s2 -> s2 eval -> single-forward ensemble + variance -> run_t0
# dihedral TTA -> TSEM (pipeline + eval + TTA) -> classifier calibration ->
# s1/s2 TTA + dihedral ensemble + final variance report.
#
# New vs v2 (ADVICE r4): run_pipeline propagates its real rc; the stage-1
# wait verifies the supervisor pid's identity via /proc/cmdline instead of
# bare kill -0; artifacts are git-committed the moment they land (VERDICT
# item 8 — the last two rounds both ended with decisive evidence in-flight).
#
# Every stage is output-guarded — safe to relaunch any number of times.
# Usage: nohup bash scripts/round5_chain.sh >> /root/repo/round5_chain.log 2>&1 &
set -u
cd /root/repo

note() { echo "[r5chain $(date +%H:%M:%S)] $*"; }

probe() {
  timeout 240 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(())*2))" \
    >/dev/null 2>&1
}

wait_for_tunnel() {
  while ! probe; do
    note "tunnel down; sleeping 5 min"
    sleep 300
  done
}

# commit small evidence artifacts as they land; retried because the
# interactive session may hold .git/index.lock for a moment
commit_artifacts() {  # message, paths...
  local msg=$1; shift
  for attempt in 1 2 3 4 5; do
    if git add -f -- "$@" 2>/dev/null && git commit -m "$msg" --only -- "$@" \
        >/dev/null 2>&1; then
      note "committed: $msg"
      return 0
    fi
    sleep 30
  done
  note "commit FAILED (non-fatal): $msg"
  return 1
}

PIPE_FLAGS="--num-simulated-masks 1000 --wgan-epochs 1000 --cyclegan-epochs 50 \
  --unet-epochs 50 --cyclegan-label-smoothing-factor 0.1 \
  --cyclegan-gaussian-noise-value 0.15 --cyclegan-checkpoint-every 10 \
  --cyclegan-checkpoint auto --metadata-bar-rows 56 \
  --unet-checkpoint-monitor val_loss --unet-early-stopping-patience 12 \
  --skip-completed-steps true --cyclegan-remat none"

run_pipeline() {  # dir, seed, extra flags...
  local dir=$1 seed=$2; shift 2
  if [ ! -d "$dir/Input_Images" ]; then
    note "staging $dir inputs"
    python scripts/prepare_run.py "$dir" || return 1
  fi
  note "=== $dir steps 0-6b (seed $seed) ==="
  python scripts/run_with_retry.py --root-dir /root/repo/$dir \
    --log /root/repo/$dir/pipeline.log --max-retries 60 -- \
    python -m semtpu.pipeline --root-dir /root/repo/$dir \
    $PIPE_FLAGS --seed $seed "$@" --steps 0,1,2,3,4,5,6a,6b
  local rc=$?
  note "$dir pipeline rc=$rc"
  return $rc
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

tta_variant() {  # run_dir, out_name, extra args...
  local run=$1 out=$2; shift 2
  local summary="$run/eval_summary_${out#Output_Masks_UNet_}.json"
  [ -f "$summary" ] && { note "$summary present; skipping"; return 0; }
  local model
  model=$(ls -d $run/3_UNet/Models/*/ 2>/dev/null | sort | tail -1)
  [ -z "$model" ] && { note "$run has no UNet model"; return 1; }
  for attempt in 1 2 3; do
    wait_for_tunnel
    timeout 5400 python scripts/infer_variant.py "$run" "$model" "$out" \
      --tta-dihedral "$@" && return 0
    note "infer_variant $out attempt $attempt failed; retrying"
    sleep 120
  done
  return 1
}

variance_report() {  # extra --ensemble args appended automatically if present
  local args=(run_t0/eval_summary.json run_s1/eval_summary.json
              run_s2/eval_summary.json)
  [ -f run_t0/eval_summary_ens_seeds.json ] \
    && args+=(--ensemble run_t0/eval_summary_ens_seeds.json)
  [ -f run_t0/eval_summary_ens_seeds_dih.json ] \
    && args+=(--ensemble run_t0/eval_summary_ens_seeds_dih.json)
  python scripts/seed_variance_report.py "${args[@]}"
}

# ---- 1. wait for the in-flight run_s2 pipeline ----------------------------
S2_PID=$(cat /tmp/r5_s2_retry.pid 2>/dev/null || echo "")
s2_alive() {
  [ -n "$S2_PID" ] && kill -0 "$S2_PID" 2>/dev/null \
    && grep -q run_with_retry "/proc/$S2_PID/cmdline" 2>/dev/null
}
while ! grep -q "step 6b" run_s2/timings.txt 2>/dev/null; do
  if s2_alive; then
    note "run_s2 pipeline (retry pid $S2_PID) still running; sleeping 5 min"
    sleep 300
  else
    note "run_s2 pipeline not running and step 6b missing — (re)launching"
    wait_for_tunnel
    run_pipeline run_s2 2 || note "run_s2 relaunch rc nonzero; loop retries"
    S2_PID=""
  fi
done
note "run_s2 pipeline complete"

# ---- 2. eval s2, single-forward cross-seed ensemble, variance report ------
if [ ! -f run_s2/eval_summary.json ]; then
  eval_dir run_s2 || note "run_s2 eval FAILED"
fi
[ -f run_s2/eval_summary.json ] \
  && commit_artifacts "evidence: run_s2 (seed 2) parity eval" \
       run_s2/eval_summary.json run_s2/timings.txt

if [ -f run_s1/eval_summary.json ] && [ -f run_s2/eval_summary.json ]; then
  wait_for_tunnel
  if [ ! -f run_t0/eval_summary_ens_seeds.json ]; then
    timeout 2400 python scripts/ensemble_eval.py run_t0 ens_seeds \
      run_t0/Output_Masks_UNet run_s1/Output_Masks_UNet \
      run_s2/Output_Masks_UNet || note "single-forward ensemble rc=$?"
  fi
  if [ ! -f SEED_VARIANCE.json ] && variance_report; then
    commit_artifacts \
      "evidence: SEED_VARIANCE.json + single-forward cross-seed ensemble (seeds 0/1/2)" \
      SEED_VARIANCE.json run_t0/eval_summary.json run_s1/eval_summary.json \
      run_s2/eval_summary.json run_t0/eval_summary_ens_seeds.json \
      run_t0/timings.txt run_s1/timings.txt
  fi
fi

# ---- 3. run_t0 dihedral TTA (same-run TTA row for the README table) --------
if [ -f run_t0/eval_summary.json ]; then
  tta_variant run_t0 Output_Masks_UNet_dih \
    && commit_artifacts "evidence: run_t0 dihedral TTA eval" \
         run_t0/eval_summary_dih.json
fi

# ---- 4. TSEM with the round-3/4 quality levers (the long pole) -------------
TSEM_GT="/root/reference/Datasets/Electron Microscopy Image Masks/TiO2_Masks_TSEM"
exec 9>/tmp/r5_tsem.lock
if flock -n 9; then
  if [ ! -f run_tsem/eval_summary.json ]; then
    if [ ! -d run_tsem/Input_Images ]; then
      note "staging run_tsem inputs"
      python scripts/prepare_run.py run_tsem \
        --images-dir "/root/reference/Datasets/Electron Microscopy Images/TSEM" \
        --gt-dir "$TSEM_GT" --gt-suffix ""
    fi
    note "=== run_tsem steps 0-6b ==="
    wait_for_tunnel
    run_pipeline run_tsem 0 --dark-background false --invert-images true \
      || note "run_tsem pipeline rc nonzero"
    eval_dir run_tsem --gt "$TSEM_GT" --gt-suffix "" || note "tsem eval FAILED"
    [ -f run_tsem/eval_summary.json ] \
      && commit_artifacts "evidence: run_tsem parity eval (TSEM dataset)" \
           run_tsem/eval_summary.json run_tsem/timings.txt
  fi
  if [ -f run_tsem/eval_summary.json ] && [ ! -f run_tsem/eval_summary_dih.json ]; then
    tta_variant run_tsem Output_Masks_UNet_dih --gt "$TSEM_GT" --gt-suffix "" \
      && commit_artifacts "evidence: run_tsem dihedral TTA eval" \
           run_tsem/eval_summary_dih.json
  fi
else
  note "run_tsem locked by another chain; skipping"
fi

# ---- 5. classifier train + step 7 + leak-free calibration ------------------
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
    commit_artifacts "evidence: leak-free classifier calibration on run_t0" \
      run_t0/classifier_calibration.json run_t0/eval_summary_classifier.json \
      || true
  fi
fi

# ---- 6. s1/s2 dihedral TTA + dihedral cross-seed ensemble ------------------
for d in run_s1 run_s2; do
  [ -f $d/eval_summary.json ] && tta_variant $d Output_Masks_UNet_dih
done
if [ -f run_t0/eval_summary_dih.json ] \
   && [ -f run_s1/eval_summary_dih.json ] \
   && [ -f run_s2/eval_summary_dih.json ]; then
  wait_for_tunnel
  if [ ! -f run_t0/eval_summary_ens_seeds_dih.json ]; then
    timeout 2400 python scripts/ensemble_eval.py run_t0 ens_seeds_dih \
      run_t0/Output_Masks_UNet_dih run_s1/Output_Masks_UNet_dih \
      run_s2/Output_Masks_UNet_dih || note "dihedral ensemble rc=$?"
  fi
  variance_report || note "final variance report rc=$?"
  commit_artifacts "evidence: dihedral TTA rows + dihedral cross-seed ensemble" \
    SEED_VARIANCE.json run_s1/eval_summary_dih.json run_s2/eval_summary_dih.json \
    run_t0/eval_summary_ens_seeds_dih.json || true
fi
note "chain v5 complete"
