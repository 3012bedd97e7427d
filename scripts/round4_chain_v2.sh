#!/bin/bash
# Round-4 unattended TPU chain, v2 — REORDERED from round4_chain.sh.
#
# Why v2: v1 ran classifier training (~2h) and the run_t0 dihedral TTA
# variant BEFORE the seed runs. The two biggest open VERDICT items
# (2: seed variance, 4: single-forward gap via cross-seed ensembling)
# both gate on run_s1 AND run_s2 finishing inside the round; classifier
# calibration (item 5) and the TTA rows are cheaper and independent.
# v2 ordering: run_t0 -> eval -> s1 -> s2 -> ensemble+variance ->
# TTA variants -> classifier -> TSEM.
#
# v1's shell was stopped mid-run; the run_t0 pipeline it launched
# (run_with_retry, pid in /tmp/r4_t0_retry.pid) keeps running — stage 1
# waits for it by watching run_t0/timings.txt instead of racing it.
#
# Every stage is output-guarded — safe to relaunch any number of times.
# Usage: nohup bash scripts/round4_chain_v2.sh >> /root/repo/round4_chain.log 2>&1 &
set -u
cd /root/repo

note() { echo "[r4chainV2 $(date +%H:%M:%S)] $*"; }

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

PIPE_FLAGS="--num-simulated-masks 1000 --wgan-epochs 1000 --cyclegan-epochs 50 \
  --unet-epochs 50 --cyclegan-label-smoothing-factor 0.1 \
  --cyclegan-gaussian-noise-value 0.15 --cyclegan-checkpoint-every 10 \
  --cyclegan-checkpoint auto --metadata-bar-rows 56 \
  --unet-checkpoint-monitor val_loss --unet-early-stopping-patience 12 \
  --skip-completed-steps true"

REMAT=$(python - <<'EOF'
import json
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

# ---- 1. wait for the in-flight run_t0 pipeline (launched by v1) ----------
T0_RETRY_PID=$(cat /tmp/r4_t0_retry.pid 2>/dev/null || echo "")
t0_alive() {  # a recycled pid must not count: verify the process identity
  [ -n "$T0_RETRY_PID" ] && kill -0 "$T0_RETRY_PID" 2>/dev/null \
    && grep -q run_with_retry "/proc/$T0_RETRY_PID/cmdline" 2>/dev/null
}
while ! grep -q "step 6b" run_t0/timings.txt 2>/dev/null; do
  if t0_alive; then
    note "run_t0 pipeline (retry pid $T0_RETRY_PID) still running; sleeping 5 min"
    sleep 300
  else
    note "run_t0 pipeline not running and step 6b missing — (re)launching"
    wait_for_tunnel
    run_pipeline run_t0 0 || note "run_t0 relaunch rc nonzero; loop retries"
    T0_RETRY_PID=""
  fi
done
note "run_t0 pipeline complete"

# ---- 2. parity eval of the timed run --------------------------------------
if [ ! -f run_t0/eval_summary.json ]; then
  eval_dir run_t0 || note "run_t0 eval FAILED"
else
  note "run_t0 already evaluated"
fi

# ---- 3. seed runs (the gating items: variance + cross-seed ensemble) ------
for n in 1 2; do
  if [ ! -f run_s$n/eval_summary.json ]; then
    wait_for_tunnel
    run_pipeline run_s$n $n
    eval_dir run_s$n || note "run_s$n eval FAILED"
  else
    note "run_s$n already evaluated"
  fi
done

# ---- 4. single-forward cross-seed ensemble + variance report --------------
if [ -f run_s1/eval_summary.json ] && [ -f run_s2/eval_summary.json ]; then
  wait_for_tunnel
  if [ ! -f run_t0/eval_summary_ens_seeds.json ]; then
    timeout 2400 python scripts/ensemble_eval.py run_t0 ens_seeds \
      run_t0/Output_Masks_UNet run_s1/Output_Masks_UNet \
      run_s2/Output_Masks_UNet || note "single-forward ensemble rc=$?"
  fi
  python scripts/seed_variance_report.py run_t0/eval_summary.json \
    run_s1/eval_summary.json run_s2/eval_summary.json \
    --ensemble run_t0/eval_summary_ens_seeds.json \
    || note "variance report rc=$?"
fi

# ---- 5. dihedral TTA variants + dihedral ensemble --------------------------
for d in run_t0 run_s1 run_s2; do
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
  python scripts/seed_variance_report.py run_t0/eval_summary.json \
    run_s1/eval_summary.json run_s2/eval_summary.json \
    --ensemble run_t0/eval_summary_ens_seeds.json \
    --ensemble run_t0/eval_summary_ens_seeds_dih.json \
    || note "variance report rc=$?"
fi

# ---- 6. classifier train + step 7 + leak-free calibration ------------------
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

# ---- 7. TSEM variant: superseded -------------------------------------------
# The TSEM stage now lives in round5_chain.sh under a /tmp/r5_tsem.lock
# flock (ADVICE r4: duplicated output-guarded stages across chains could
# race into two concurrent run_tsem pipelines). Run round5_chain.sh for TSEM.
note "chain v2 complete"
