#!/bin/bash
# Round-5b TPU run queue — post-VM-wipe re-harvest.
#
# The round-5 VM restart wiped everything untracked: saved/ (all run
# dirs + checkpoints), data/ (the corpus), logs/, and .jax_cache (so
# every program compiles fresh through the axon relay again).  What
# survived is what was committed: the flagship-v2 + head-to-head quality
# tables in PERFORMANCE.md, the metric vectors under artifacts/, and the
# torch reference leg's checkpoints (artifacts/head_to_head/ref_ckpt).
#
# This queue re-creates the missing EVIDENCE in priority order:
#   1. small-v2 leg retrain (the head-to-head "ours" checkpoint)
#   2. the pesq_wb_approx-gap A/B battery on it (VERDICT r4 item 2)
#   3. chip probes: packed-train A/B, train MFU, warm bench
#   4. SNR-adaptive family end to end (VERDICT item 4 — zero trained
#      evidence so far)
#   5. DiffWave vocoder trained leg + quality tests (VERDICT item 3)
#   6. WaveGrad trained leg + quality tests
#   7. flagship-v2 retrain (its table is already published; this
#      re-establishes a committed checkpoint) — last, it is the longest
#
# Watchdog: every stage is killed + retried if its log goes idle longer
# than the stage timeout.  With the compile cache cold, fresh flagship
# compiles are silent for ~10 min, so training/eval first attempts get
# generous idle timeouts; the documented relay wedge is >55 min silent,
# so 20-30 min idle still catches it.
#
# Usage: nohup bash tools/round5b_queue.sh > /tmp/r5b_outer.log 2>&1 &
#        echo $! > /tmp/r5_queue.pid
set -u
cd /root/repo
mkdir -p logs saved
Q=logs/r5b_queue.log

note() { echo "=== [$(date -u +%H:%M:%S)] $*" >> "$Q"; }

latest_run() { ls -d saved/"$1"/*/ 2>/dev/null | sort | tail -1; }

# run_watched <name> <idle_timeout_s> <max_retries> <resume_spec> <cmd...>
run_watched() {
  local name=$1 timeout=$2 max_retries=$3 spec=$4; shift 4
  local log="logs/r5b_${name}.log" attempt=0 rc pid age
  local -a cmd=("$@")
  while :; do
    note "stage $name attempt $attempt: ${cmd[*]}"
    "${cmd[@]}" > "$log" 2>&1 &
    pid=$!
    rc=""
    while :; do
      sleep 15
      if ! kill -0 "$pid" 2>/dev/null; then
        wait "$pid"; rc=$?; break
      fi
      age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
      if [ "$age" -gt "$timeout" ]; then
        note "stage $name WEDGED (log idle ${age}s > ${timeout}s) — kill -9 $pid"
        kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        rc=137
        sleep 10
        break
      fi
    done
    if [ "$rc" = "0" ]; then note "stage $name rc=0"; return 0; fi
    attempt=$((attempt + 1))
    if [ "$attempt" -gt "$max_retries" ] || [ "$spec" = once ]; then
      note "stage $name FAILED rc=$rc after $attempt attempt(s) — SKIPPING"
      return 1
    fi
    case "$spec" in
      train:*)
        local entry=${spec#train:}; local sname=${entry#*:}; entry=${entry%%:*}
        local r; r=$(latest_run "$sname")
        if [ -n "$r" ] && [ -f "${r}checkpoint_current.ckpt" ]; then
          cmd=(python "$entry" -r "${r}checkpoint_current.ckpt"
               ${RESUME_EXTRA[@]+"${RESUME_EXTRA[@]}"})
          note "stage $name retrying from ${r}checkpoint_current.ckpt"
        else
          note "stage $name retrying from scratch (no checkpoint yet)"
        fi
        ;;
      retry) note "stage $name retrying (rc=$rc)" ;;
    esac
  done
}

note "===================== round-5b queue start ====================="

# Wait for the corpus regeneration if it is still running.
while [ ! -d data/synth2/test_hard ] || [ ! -d data/synth2/train200 ]; do
  note "waiting for corpus regeneration (data/synth2)"
  sleep 60
done
N_TR=$(ls data/synth2/train/clean 2>/dev/null | wc -l)
note "corpus present: $N_TR train files"

# ---------------------------------------------------------------------------
# 1. Retrain the small-v2 head-to-head leg (checkpoint was wiped).
run_watched small_train 1800 10 train:train.py:SDDM2_UNet_synth2_small \
  python train.py -c configs/config_unet_synth_small_v2.json
SMALL=$(latest_run SDDM2_UNet_synth2_small)
SBEST="${SMALL}model_best.ckpt"
[ -f "$SBEST" ] || SBEST="${SMALL}checkpoint_current.ckpt"

# 2. pesq_wb_approx-gap battery (VERDICT r4 item 2): serving-config A/Bs
#    against the committed torch-reference numbers.
if [ -n "$SMALL" ] && [ -f "$SBEST" ]; then
  run_watched pesq_default 1200 1 retry python tools/eval_flagship.py \
    -r "$SBEST" --data data/synth2/test --out saved/pesq_ab/default --batch-rows 8
  run_watched pesq_s12 1200 1 retry python tools/eval_flagship.py \
    -r "$SBEST" --data data/synth2/test --out saved/pesq_ab/s12 --steps 12 --batch-rows 8
  run_watched pesq_f32 1200 1 retry python tools/eval_flagship.py \
    -r "$SBEST" --data data/synth2/test --out saved/pesq_ab/f32 --f32 --batch-rows 8
  run_watched pesq_base_f32 1800 1 retry python tools/eval_flagship.py \
    -r "$SBEST" --data data/synth2/test --out saved/pesq_ab/base_f32 --base --f32 --batch-rows 8
  run_watched pesq_seed1 1200 1 retry python tools/eval_flagship.py \
    -r "$SBEST" --data data/synth2/test --out saved/pesq_ab/seed1 --seed 1 --batch-rows 8
  run_watched pesq_seed2 1200 1 retry python tools/eval_flagship.py \
    -r "$SBEST" --data data/synth2/test --out saved/pesq_ab/seed2 --seed 2 --batch-rows 8
  run_watched small_hard 1200 1 retry python tools/eval_flagship.py \
    -r "$SBEST" --data data/synth2/test_hard --out saved/pesq_ab/hard --batch-rows 8
else
  note "small-v2 run missing — skipping pesq battery"
fi

# ---------------------------------------------------------------------------
# 3. Chip probes (short, high value — before the long trainings).
run_watched packed_train_ab 1800 1 retry python tools/packed_train_ab.py --impl both --steps 20
run_watched mfu_train 1800 1 retry python tools/mfu.py --train
run_watched bench_warm 1800 1 retry python bench.py

# ---------------------------------------------------------------------------
# 4. SNR-adaptive family end to end (zero trained evidence to date).
run_watched snr_est_train 1800 10 train:train_snr_estimator.py:SDDM2_SNREstimator_synth2 \
  python train_snr_estimator.py -c configs/config_snr_estimator_synth.json
E=$(latest_run SDDM2_SNREstimator_synth2)
if [ -n "$E" ] && [ -f "${E}model_best.ckpt" ]; then
  RESUME_EXTRA=(-s "${E}model_best.ckpt")
  run_watched snr_train 1800 15 train:train_with_snr_estimator.py:SDDM2_UNet_with_SNREstimator_synth2 \
    python train_with_snr_estimator.py -c configs/config_unet_snr_synth.json -s "${E}model_best.ckpt"
  unset RESUME_EXTRA
  S=$(latest_run SDDM2_UNet_with_SNREstimator_synth2)
  if [ -n "$S" ] && [ -f "${S}model_best.ckpt" ]; then
    run_watched snr_infer 1800 1 retry python infer_with_snr_estimator.py -r "${S}model_best.ckpt"
  else
    note "snr joint run/model_best missing — skipping snr_infer"
  fi
else
  note "snr estimator run/model_best missing — skipping snr_train/snr_infer"
fi

# ---------------------------------------------------------------------------
# 5. DiffWave vocoder: spectrogram prep + training + quality tests.
run_watched spec_train 1200 2 retry python prepare_spectrogram.py data/synth2/train -c configs/config_diffwave_synth.json --resume
run_watched spec_test  1200 2 retry python prepare_spectrogram.py data/synth2/test  -c configs/config_diffwave_synth.json --resume
run_watched diffwave_train 1800 15 train:train_specmodel.py:SDDM_DiffWave_synth2 \
  python train_specmodel.py -c configs/config_diffwave_synth.json
D=$(latest_run SDDM_DiffWave_synth2)
if [ -n "$D" ] && [ -f "${D}model_best.ckpt" ]; then
  run_watched diffwave_test_ddim6 1800 1 retry python test.py -r "${D}model_best.ckpt" --ddim --steps 6
  run_watched diffwave_test       1800 1 retry python test.py -r "${D}model_best.ckpt"
else
  note "diffwave run/model_best missing — skipping vocoder tests"
fi

# ---------------------------------------------------------------------------
# 6. WaveGrad trained leg + quality tests.
run_watched wavegrad_train 1800 15 train:train_specmodel.py:SDDM_WaveGrad_synth2 \
  python train_specmodel.py -c configs/config_wavegrad_synth.json
W=$(latest_run SDDM_WaveGrad_synth2)
if [ -n "$W" ] && [ -f "${W}model_best.ckpt" ]; then
  run_watched wavegrad_test_ddim6 1800 1 retry python test.py -r "${W}model_best.ckpt" --ddim --steps 6
  run_watched wavegrad_test       1800 1 retry python test.py -r "${W}model_best.ckpt"
else
  note "wavegrad run/model_best missing — skipping wavegrad tests"
fi

# ---------------------------------------------------------------------------
# 7. Flagship-v2 retrain (longest; its quality table is already published —
#    this re-establishes a checkpoint worth committing).
run_watched flagship_train 1800 15 train:train.py:SDDM2_UNet_synth2_flagship \
  python train.py -c configs/config_unet_synth_flagship_v2.json
F=$(latest_run SDDM2_UNet_synth2_flagship)
FBEST="${F}model_best.ckpt"
[ -f "$FBEST" ] || FBEST="${F}checkpoint_current.ckpt"
if [ -n "$F" ] && [ -f "$FBEST" ]; then
  run_watched flagship_eval_best 1200 1 retry python tools/eval_flagship.py \
    -r "$FBEST" --data data/synth2/test --out saved/flagship_v2b_eval --batch-rows 8
  run_watched flagship_eval_best_hard 1200 1 retry python tools/eval_flagship.py \
    -r "$FBEST" --data data/synth2/test_hard --out saved/flagship_v2b_eval_hard --batch-rows 8
fi

note "===================== round-5b queue done ====================="
