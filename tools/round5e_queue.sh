#!/bin/bash
# Round-5e queue — final round-5 chip schedule.
#
# The post-fix SNR-estimator compile wedged (25 min silent; the pre-fix
# program compiled in ~7).  5e gives the estimator ONE fresh watched
# attempt at reduced epochs (80 — an auxiliary regressor; kill-and-retry
# has cleared this wedge class before), then runs the guaranteed-value
# vocoder legs, then the SNR joint leg (short recipe) + inference, then
# WaveGrad and the timed packed A/Bs as time allows.  Deadline-gated
# throughout so the driver's end-of-round bench finds a free chip.
set -u
cd /root/repo
mkdir -p logs saved
Q=logs/r5e_queue.log
DEADLINE=${DEADLINE:-1787289000}

note() { echo "=== [$(date -u +%H:%M:%S)] $*" >> "$Q"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
latest_run() { ls -d saved/"$1"/*/ 2>/dev/null | sort | tail -1; }

snapshot() {
  local run=$1 dest=$2 msg=$3
  [ -n "$run" ] || return 0
  python tools/snapshot_run.py "$run" "artifacts/round5/$dest" >> "$Q" 2>&1
  git add -A "artifacts/round5/$dest" >> "$Q" 2>&1
  git -c user.email=queue@local -c user.name=queue \
    commit -q -m "artifacts: $msg" >> "$Q" 2>&1 || true
}

# run_watched <name> <idle_s> <cap_s> <need_s> <max_retries> <resume_spec> <cmd...>
run_watched() {
  local name=$1 idle=$2 cap=$3 need=$4 max_retries=$5 spec=$6; shift 6
  local log="logs/r5e_${name}.log" attempt=0 rc pid age start now
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

note "=================== round-5e queue start ($(left)s to deadline) ==="

# ---------------------------------------------------------------------------
# 1. SNR estimator — one fresh watched attempt, short recipe (80 epochs).
run_watched snr_est_train 900 1500 900 1 train:train_snr_estimator.py:SDDM2_SNREstimator_synth2 \
  python train_snr_estimator.py -c /tmp/snr_est_short.json
E=$(latest_run SDDM2_SNREstimator_synth2)
[ -n "$E" ] && snapshot "$E" snr_estimator "SNR estimator trained run (post segment_sisnr fix)"

# ---------------------------------------------------------------------------
# 2. DiffWave vocoder: spectrogram prep + training + quality tests.
run_watched spec_train 1200 1500 500 2 retry \
  python prepare_spectrogram.py data/synth2/train -c configs/config_diffwave_synth.json --resume
run_watched spec_test 1200 900 300 2 retry \
  python prepare_spectrogram.py data/synth2/test -c configs/config_diffwave_synth.json --resume
run_watched diffwave_train 1500 1800 900 15 train:train_specmodel.py:SDDM_DiffWave_synth2 \
  python train_specmodel.py -c configs/config_diffwave_synth.json
D=$(latest_run SDDM_DiffWave_synth2)
DBEST="${D}model_best.ckpt"; [ -f "$DBEST" ] || DBEST="${D}checkpoint_current.ckpt"
if [ -n "$D" ] && [ -f "$DBEST" ]; then
  snapshot "$D" diffwave "DiffWave trained run"
  run_watched diffwave_test_ddim6 1500 1200 500 1 retry \
    python test.py -r "$DBEST" --ddim --steps 6
  run_watched diffwave_test 1500 1500 600 1 retry python test.py -r "$DBEST"
  snapshot "$(latest_run SDDM_DiffWave_synth2)" diffwave "DiffWave test metrics"
else
  note "diffwave run missing — skipping vocoder tests"
fi

# ---------------------------------------------------------------------------
# 3. SNR joint leg (short recipe) + inference.
EBEST="${E}model_best.ckpt"; [ -f "$EBEST" ] || EBEST="${E}checkpoint_current.ckpt"
if [ -n "$E" ] && [ -f "$EBEST" ]; then
  RESUME_EXTRA=(-s "$EBEST")
  run_watched snr_train 1500 1800 1000 15 train:train_with_snr_estimator.py:SDDM2_UNet_with_SNREstimator_synth2 \
    python train_with_snr_estimator.py -c /tmp/snr_joint_short.json -s "$EBEST"
  unset RESUME_EXTRA
  S=$(latest_run SDDM2_UNet_with_SNREstimator_synth2)
  SBEST="${S}model_best.ckpt"; [ -f "$SBEST" ] || SBEST="${S}checkpoint_current.ckpt"
  if [ -n "$S" ] && [ -f "$SBEST" ]; then
    snapshot "$S" snr_joint "SNR joint trained run"
    run_watched snr_infer 1500 1500 700 1 retry \
      python infer_with_snr_estimator.py -r "$SBEST"
    snapshot "$(latest_run SDDM2_UNet_with_SNREstimator_synth2)" snr_joint "SNR infer vectors"
  else
    note "snr joint run missing — skipping snr_infer"
  fi
else
  note "snr estimator checkpoint missing — skipping snr_train/snr_infer"
fi

# ---------------------------------------------------------------------------
# 4. WaveGrad trained leg + tests (time permitting).
run_watched wavegrad_train 1500 1500 800 15 train:train_specmodel.py:SDDM_WaveGrad_synth2 \
  python train_specmodel.py -c configs/config_wavegrad_synth.json
W=$(latest_run SDDM_WaveGrad_synth2)
WBEST="${W}model_best.ckpt"; [ -f "$WBEST" ] || WBEST="${W}checkpoint_current.ckpt"
if [ -n "$W" ] && [ -f "$WBEST" ]; then
  snapshot "$W" wavegrad "WaveGrad trained run"
  run_watched wavegrad_test_ddim6 1500 1200 500 1 retry \
    python test.py -r "$WBEST" --ddim --steps 6
  run_watched wavegrad_test 1500 1200 500 1 retry python test.py -r "$WBEST"
  snapshot "$(latest_run SDDM_WaveGrad_synth2)" wavegrad "WaveGrad test metrics"
else
  note "wavegrad run missing — skipping wavegrad tests"
fi

# ---------------------------------------------------------------------------
# 5. Timed packed-vs-plain train-step A/B.
run_watched packed_time_ab 1500 1500 600 1 retry \
  python tools/packed_train_ab.py --impl all --steps 3 --time 20
run_watched packed_time_ab_donate 1500 1200 400 1 retry \
  python tools/packed_train_ab.py --impl all --steps 3 --time 20 --donate

note "=================== round-5e queue done ($(left)s to deadline) ==="
