#!/bin/bash
# Round-5 TPU run queue — the round-4 harvest, under a watchdog.
#
# Every stage runs with a no-progress monitor: if the stage's stdout log
# goes idle for longer than its timeout (the documented relay-wedge
# signature — the round-4 flagship run wedged mid-epoch and silently
# blocked six downstream stages), the process is killed and the stage is
# retried — training stages resume from checkpoint_current.ckpt, eval
# stages rerun from scratch — up to a bounded number of attempts, then
# skipped with a loud log line so the queue always drains.
#
# Usage: nohup bash tools/round5_queue.sh > /tmp/r5_queue_outer.log 2>&1 &
set -u
cd /root/repo
mkdir -p logs saved
Q=logs/r5_queue.log

note() { echo "=== [$(date -u +%H:%M:%S)] $*" >> "$Q"; }

latest_run() { ls -d saved/"$1"/*/ 2>/dev/null | sort | tail -1; }

# run_watched <name> <idle_timeout_s> <max_retries> <resume_spec> <cmd...>
#   resume_spec: "train:<entry>:<saved_name>" — on failure/wedge restart as
#                `python <entry> -r <latest_run>/checkpoint_current.ckpt`
#                "retry" — rerun the same command
#                "once"  — no retry
run_watched() {
  local name=$1 timeout=$2 max_retries=$3 spec=$4; shift 4
  local log="logs/r5_${name}.log" attempt=0 rc pid age start
  local -a cmd=("$@")
  while :; do
    note "stage $name attempt $attempt: ${cmd[*]}"
    start=$(date +%s)
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
        sleep 10   # let the chip tunnel settle before the next attach
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

note "===================== round-5 queue start ====================="

# ---------------------------------------------------------------------------
# 1. Resume the wedged flagship-v2 run (epoch 350/500 checkpoint on disk).
FLAG_CKPT=saved/SDDM2_UNet_synth2_flagship/0820_052647/checkpoint_current.ckpt
run_watched flagship_resume 300 15 train:train.py:SDDM2_UNet_synth2_flagship \
  python train.py -r "$FLAG_CKPT"

# Prefer the best checkpoint of the run that holds the best monitor value:
# resume continues the monitor, so the newest run's model_best is global-best.
F=$(latest_run SDDM2_UNet_synth2_flagship)
FBEST="${F}model_best.ckpt"
[ -f "$FBEST" ] || FBEST="${F}checkpoint_current.ckpt"

# 2. Flagship v2 quality evals: full-T, ancestral-12, DDIM-6 (fills the
#    ROUND4_FLAGSHIP_TABLE placeholder in PERFORMANCE.md).
if [ -n "$F" ]; then
  run_watched flagship_eval      900 1 retry python tools/eval_flagship.py \
    -r "$FBEST" --data data/synth2/test --out saved/flagship_v2_eval --batch-rows 8
  run_watched flagship_eval_s12  900 1 retry python tools/eval_flagship.py \
    -r "$FBEST" --data data/synth2/test --out saved/flagship_v2_eval_s12 --steps 12 --batch-rows 8
  run_watched flagship_eval_ddim6 900 1 retry python tools/eval_flagship.py \
    -r "$FBEST" --data data/synth2/test --out saved/flagship_v2_eval_ddim6 --ddim --steps 6 --batch-rows 8
  run_watched flagship_eval_hard 900 1 retry python tools/eval_flagship.py \
    -r "$FBEST" --data data/synth2/test_hard --out saved/flagship_v2_eval_hard --batch-rows 8
else
  note "flagship run dir missing — skipping flagship evals"
fi

# ---------------------------------------------------------------------------
# 3. pesq_wb_approx-gap battery on the head-to-head small leg (round-4
#    verdict item 2): f32 serving, ancestral-12, seed spread, epoch-500
#    checkpoint, hard split.
SMALL=saved/SDDM2_UNet_synth2_small/0820_043223
run_watched pesq_f32  900 1 retry python tools/eval_flagship.py \
  -r "$SMALL/model_best.ckpt" --data data/synth2/test --out saved/pesq_ab/f32 --f32 --batch-rows 8
run_watched pesq_s12  900 1 retry python tools/eval_flagship.py \
  -r "$SMALL/model_best.ckpt" --data data/synth2/test --out saved/pesq_ab/s12 --steps 12 --batch-rows 8
run_watched pesq_seed1 900 1 retry python tools/eval_flagship.py \
  -r "$SMALL/model_best.ckpt" --data data/synth2/test --out saved/pesq_ab/seed1 --seed 1 --batch-rows 8
run_watched pesq_seed2 900 1 retry python tools/eval_flagship.py \
  -r "$SMALL/model_best.ckpt" --data data/synth2/test --out saved/pesq_ab/seed2 --seed 2 --batch-rows 8
run_watched pesq_last 900 1 retry python tools/eval_flagship.py \
  -r "$SMALL/checkpoint_last.ckpt" --data data/synth2/test --out saved/pesq_ab/last --batch-rows 8
run_watched small_hard 900 1 retry python tools/eval_flagship.py \
  -r "$SMALL/model_best.ckpt" --data data/synth2/test_hard --out saved/pesq_ab/hard --batch-rows 8

# ---------------------------------------------------------------------------
# 4. Short, high-value chip probes before the long vocoder trainings.
run_watched packed_train_ab 600 1 retry python tools/packed_train_ab.py --impl both --steps 20
run_watched mfu_train       900 1 retry python tools/mfu.py --train
run_watched bench_warm      900 1 retry python bench.py

# ---------------------------------------------------------------------------
# 5. Vocoder family: spectrogram prep + DiffWave training + quality tests.
run_watched spec_train 600 2 retry python prepare_spectrogram.py data/synth2/train -c configs/config_diffwave_synth.json --resume
run_watched spec_test  600 2 retry python prepare_spectrogram.py data/synth2/test  -c configs/config_diffwave_synth.json --resume
run_watched diffwave_train 300 15 train:train_specmodel.py:SDDM_DiffWave_synth2 \
  python train_specmodel.py -c configs/config_diffwave_synth.json
D=$(latest_run SDDM_DiffWave_synth2)
if [ -n "$D" ] && [ -f "${D}model_best.ckpt" ]; then
  run_watched diffwave_test       1800 1 retry python test.py -r "${D}model_best.ckpt"
  run_watched diffwave_test_ddim6 1800 1 retry python test.py -r "${D}model_best.ckpt" --ddim --steps 6
else
  note "diffwave run/model_best missing — skipping vocoder tests"
fi

# ---------------------------------------------------------------------------
# 6. SNR-adaptive family end to end (the one family with zero trained
#    evidence): estimator → joint training with frozen estimator → infer.
run_watched snr_est_train 300 10 train:train_snr_estimator.py:SDDM2_SNREstimator_synth2 \
  python train_snr_estimator.py -c configs/config_snr_estimator_synth.json
E=$(latest_run SDDM2_SNREstimator_synth2)
if [ -n "$E" ] && [ -f "${E}model_best.ckpt" ]; then
  RESUME_EXTRA=(-s "${E}model_best.ckpt")  # -s survives watchdog resumes
  run_watched snr_train 300 15 train:train_with_snr_estimator.py:SDDM2_UNet_with_SNREstimator_synth2 \
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
# 7. WaveGrad trained leg + quality tests.
run_watched wavegrad_train 300 15 train:train_specmodel.py:SDDM_WaveGrad_synth2 \
  python train_specmodel.py -c configs/config_wavegrad_synth.json
W=$(latest_run SDDM_WaveGrad_synth2)
if [ -n "$W" ] && [ -f "${W}model_best.ckpt" ]; then
  run_watched wavegrad_test_ddim6 1800 1 retry python test.py -r "${W}model_best.ckpt" --ddim --steps 6
  run_watched wavegrad_test       1800 1 retry python test.py -r "${W}model_best.ckpt"
else
  note "wavegrad run/model_best missing — skipping wavegrad tests"
fi

note "===================== round-5 queue done ====================="
