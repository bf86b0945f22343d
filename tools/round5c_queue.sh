#!/bin/bash
# Round-5c TPU queue — re-prioritized remainder of round 5.
#
# Rationale: the 5b phase-1 queue ordered the low-value flagship retrain
# and long trainings AHEAD of the epoch-500 pesq legs (phase 2), which
# with ~5h of round left would have starved the highest-value evidence.
# This queue runs the cheap, high-value legs first and guards every
# stage with (a) an idle watchdog, (b) a per-stage hard wall cap, and
# (c) a round-end deadline so the driver's end-of-round bench finds a
# free chip.
#
# Order:
#   1. warm bench (chip probe, minutes)
#   2. epoch-500 pesq legs: pesq_last, pesq_last_s12, hard_s12
#   3. SNR-adaptive family end to end (zero trained evidence to date)
#   4. DiffWave vocoder: spec prep + train + DDIM-6/full-T quality tests
#   5. WaveGrad trained leg + tests
#   6. flagship-v2 retrain ONLY if >100 min remain
#
# After each leg: snapshot metric vectors (+small ckpts) into artifacts/
# and commit — the VM-wipe lesson.
#
# Usage: nohup bash tools/round5c_queue.sh > /tmp/r5c_outer.log 2>&1 &
#        echo $! > /tmp/r5c_queue.pid
set -u
cd /root/repo
mkdir -p logs saved
Q=logs/r5c_queue.log
DEADLINE=${DEADLINE:-1787289000}   # ~40 min before estimated round end

note() { echo "=== [$(date -u +%H:%M:%S)] $*" >> "$Q"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

latest_run() { ls -d saved/"$1"/*/ 2>/dev/null | sort | tail -1; }

snapshot() {  # snapshot <run_dir> <dest_leg> <msg>
  local run=$1 dest=$2 msg=$3
  [ -n "$run" ] || return 0
  python tools/snapshot_run.py "$run" "artifacts/round5/$dest" >> "$Q" 2>&1
  git add -A "artifacts/round5/$dest" >> "$Q" 2>&1
  git -c user.email=queue@local -c user.name=queue \
    commit -q -m "artifacts: $msg" >> "$Q" 2>&1 || true
}

# run_watched <name> <idle_s> <cap_s> <need_s> <max_retries> <resume_spec> <cmd...>
#   need_s: skip the stage outright if less than this remains before DEADLINE.
#   cap_s:  hard wall cap — kill at cap but treat as "done" (rc recorded);
#           training stages leave a usable model_best/checkpoint_current.
run_watched() {
  local name=$1 idle=$2 cap=$3 need=$4 max_retries=$5 spec=$6; shift 6
  local log="logs/r5c_${name}.log" attempt=0 rc pid age start now
  local -a cmd=("$@")
  if [ "$(left)" -lt "$need" ]; then
    note "stage $name SKIPPED (deadline: $(left)s left < ${need}s needed)"
    return 1
  fi
  while :; do
    note "stage $name attempt $attempt: ${cmd[*]}"
    "${cmd[@]}" > "$log" 2>&1 &
    pid=$!
    start=$(date +%s)
    rc=""
    while :; do
      sleep 15
      if ! kill -0 "$pid" 2>/dev/null; then wait "$pid"; rc=$?; break; fi
      now=$(date +%s)
      if [ $((now - start)) -gt "$cap" ] || [ "$(left)" -lt 120 ]; then
        note "stage $name CAPPED after $((now - start))s — kill -9 $pid"
        kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
        rc=capped; sleep 5; break
      fi
      age=$(( now - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
      if [ "$age" -gt "$idle" ]; then
        note "stage $name WEDGED (log idle ${age}s > ${idle}s) — kill -9 $pid"
        kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
        rc=137; sleep 10; break
      fi
    done
    if [ "$rc" = "0" ]; then note "stage $name rc=0"; return 0; fi
    if [ "$rc" = capped ]; then note "stage $name capped (partial ok)"; return 0; fi
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

note "=================== round-5c queue start ($(left)s to deadline) ==="

# Wait for the still-running mfu --train probe (launched by the 5b queue).
if [ -n "${MFU_PID:-}" ]; then
  note "waiting on mfu probe pid $MFU_PID"
  while kill -0 "$MFU_PID" 2>/dev/null; do sleep 20; done
  note "mfu probe done"
fi

# ---------------------------------------------------------------------------
# 1. Warm bench (the driver-comparable numbers, on a warm cache).
run_watched bench_warm 1200 1800 600 1 retry python bench.py

# ---------------------------------------------------------------------------
# 2. Epoch-500 pesq legs on the retrained small-v2 checkpoint.
SMALL=$(latest_run SDDM2_UNet_synth2_small)
if [ -n "$SMALL" ] && [ -f "${SMALL}checkpoint_last.ckpt" ]; then
  run_watched pesq_last 1200 1800 500 1 retry python tools/eval_flagship.py \
    -r "${SMALL}checkpoint_last.ckpt" --data data/synth2/test \
    --out saved/pesq_ab/last --batch-rows 8
  run_watched pesq_last_s12 1200 1800 500 1 retry python tools/eval_flagship.py \
    -r "${SMALL}checkpoint_last.ckpt" --data data/synth2/test \
    --out saved/pesq_ab/last_s12 --steps 12 --batch-rows 8
  run_watched small_hard_s12 1200 1800 500 1 retry python tools/eval_flagship.py \
    -r "${SMALL}model_best.ckpt" --data data/synth2/test_hard \
    --out saved/pesq_ab/hard_s12 --steps 12 --batch-rows 8
  for leg in last last_s12 hard_s12; do
    R=$(latest_run "pesq_ab/$leg"); snapshot "$R" "pesq_ab/$leg" "pesq_ab $leg vectors"
  done
else
  note "small-v2 checkpoint_last missing — skipping epoch-500 legs"
fi

# ---------------------------------------------------------------------------
# 3. SNR-adaptive family end to end.
run_watched snr_est_train 1800 2700 1200 10 train:train_snr_estimator.py:SDDM2_SNREstimator_synth2 \
  python train_snr_estimator.py -c configs/config_snr_estimator_synth.json
E=$(latest_run SDDM2_SNREstimator_synth2)
EBEST="${E}model_best.ckpt"; [ -f "$EBEST" ] || EBEST="${E}checkpoint_current.ckpt"
if [ -n "$E" ] && [ -f "$EBEST" ]; then
  snapshot "$E" snr_estimator "SNR estimator trained run"
  RESUME_EXTRA=(-s "$EBEST")
  run_watched snr_train 1800 3600 1500 15 train:train_with_snr_estimator.py:SDDM2_UNet_with_SNREstimator_synth2 \
    python train_with_snr_estimator.py -c configs/config_unet_snr_synth.json -s "$EBEST"
  unset RESUME_EXTRA
  S=$(latest_run SDDM2_UNet_with_SNREstimator_synth2)
  SBEST="${S}model_best.ckpt"; [ -f "$SBEST" ] || SBEST="${S}checkpoint_current.ckpt"
  if [ -n "$S" ] && [ -f "$SBEST" ]; then
    snapshot "$S" snr_joint "SNR joint trained run"
    run_watched snr_infer 1800 2700 900 1 retry \
      python infer_with_snr_estimator.py -r "$SBEST"
    snapshot "$(latest_run SDDM2_UNet_with_SNREstimator_synth2)" snr_joint "SNR infer vectors"
  else
    note "snr joint run missing — skipping snr_infer"
  fi
else
  note "snr estimator run missing — skipping snr_train/snr_infer"
fi

# ---------------------------------------------------------------------------
# 4. DiffWave vocoder: spectrogram prep + training + quality tests.
run_watched spec_train 1200 1800 600 2 retry \
  python prepare_spectrogram.py data/synth2/train -c configs/config_diffwave_synth.json --resume
run_watched spec_test 1200 1800 300 2 retry \
  python prepare_spectrogram.py data/synth2/test -c configs/config_diffwave_synth.json --resume
run_watched diffwave_train 1800 2700 1200 15 train:train_specmodel.py:SDDM_DiffWave_synth2 \
  python train_specmodel.py -c configs/config_diffwave_synth.json
D=$(latest_run SDDM_DiffWave_synth2)
DBEST="${D}model_best.ckpt"; [ -f "$DBEST" ] || DBEST="${D}checkpoint_current.ckpt"
if [ -n "$D" ] && [ -f "$DBEST" ]; then
  snapshot "$D" diffwave "DiffWave trained run"
  run_watched diffwave_test_ddim6 1800 2700 600 1 retry \
    python test.py -r "$DBEST" --ddim --steps 6
  run_watched diffwave_test 1800 2700 900 1 retry python test.py -r "$DBEST"
  snapshot "$(latest_run SDDM_DiffWave_synth2)" diffwave "DiffWave test metrics"
else
  note "diffwave run missing — skipping vocoder tests"
fi

# ---------------------------------------------------------------------------
# 5. WaveGrad trained leg + tests.
run_watched wavegrad_train 1800 2700 1200 15 train:train_specmodel.py:SDDM_WaveGrad_synth2 \
  python train_specmodel.py -c configs/config_wavegrad_synth.json
W=$(latest_run SDDM_WaveGrad_synth2)
WBEST="${W}model_best.ckpt"; [ -f "$WBEST" ] || WBEST="${W}checkpoint_current.ckpt"
if [ -n "$W" ] && [ -f "$WBEST" ]; then
  snapshot "$W" wavegrad "WaveGrad trained run"
  run_watched wavegrad_test_ddim6 1800 2700 600 1 retry \
    python test.py -r "$WBEST" --ddim --steps 6
  run_watched wavegrad_test 1800 2700 900 1 retry python test.py -r "$WBEST"
  snapshot "$(latest_run SDDM_WaveGrad_synth2)" wavegrad "WaveGrad test metrics"
else
  note "wavegrad run missing — skipping wavegrad tests"
fi

# ---------------------------------------------------------------------------
# 6. Flagship-v2 retrain — only with >100 min to spare.
if [ "$(left)" -gt 6000 ]; then
  run_watched flagship_train 1800 $(( $(left) - 1200 )) 6000 15 train:train.py:SDDM2_UNet_synth2_flagship \
    python train.py -c configs/config_unet_synth_flagship_v2.json
  F=$(latest_run SDDM2_UNet_synth2_flagship)
  [ -n "$F" ] && snapshot "$F" flagship_v2b "flagship-v2 retrain checkpoint"
else
  note "flagship retrain skipped ($(left)s left)"
fi

note "=================== round-5c queue done ($(left)s to deadline) ==="
