#!/bin/bash
# Round-5g queue — final stretch: SNR-joint leg post-beta-clamp fix.
# Gated on the 5f queue (WaveGrad) via /tmp/r5f_queue.pid.
set -u
cd /root/repo
mkdir -p logs saved
Q=logs/r5g_queue.log
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
run_watched() {
  local name=$1 idle=$2 cap=$3 need=$4; shift 4
  local log="logs/r5g_${name}.log" rc pid age start now
  local -a cmd=("$@")
  if [ "$(left)" -lt "$need" ]; then
    note "stage $name SKIPPED ($(left)s left < ${need}s)"; return 1
  fi
  note "stage $name: ${cmd[*]}"
  "${cmd[@]}" > "$log" 2>&1 &
  pid=$!; start=$(date +%s); rc=""
  while :; do
    sleep 15
    if ! kill -0 "$pid" 2>/dev/null; then wait "$pid"; rc=$?; break; fi
    now=$(date +%s)
    if [ $((now - start)) -gt "$cap" ] || [ "$(left)" -lt 120 ]; then
      note "stage $name CAPPED — kill -9 $pid"
      kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null; rc=capped; break
    fi
    age=$(( now - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$idle" ]; then
      note "stage $name WEDGED — kill -9 $pid"
      kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null; rc=137; break
    fi
  done
  note "stage $name rc=$rc"
  [ "$rc" = 0 ] || [ "$rc" = capped ]
}

if [ -f /tmp/r5f_queue.pid ]; then
  note "waiting on 5f queue pid $(cat /tmp/r5f_queue.pid)"
  while kill -0 "$(cat /tmp/r5f_queue.pid)" 2>/dev/null; do sleep 20; done
fi
note "============ round-5g queue start ($(left)s to deadline) ============"

E=$(latest_run SDDM2_SNREstimator_synth2)
EBEST="${E}model_best.ckpt"
if [ -n "$E" ] && [ -f "$EBEST" ]; then
  run_watched snr_train 600 900 700 \
    python train_with_snr_estimator.py -c /tmp/snr_joint_short.json -s "$EBEST"
  S=$(latest_run SDDM2_UNet_with_SNREstimator_synth2)
  SBEST="${S}model_best.ckpt"; [ -f "$SBEST" ] || SBEST="${S}checkpoint_current.ckpt"
  if [ -n "$S" ] && [ -f "$SBEST" ]; then
    snapshot "$S" snr_joint "SNR joint trained run (post beta-clamp fix)"
    run_watched snr_infer 600 1100 500 \
      python infer_with_snr_estimator.py -r "$SBEST"
    snapshot "$(latest_run SDDM2_UNet_with_SNREstimator_synth2)" snr_joint "SNR infer vectors"
  else
    note "snr joint checkpoint missing — skipping infer"
  fi
else
  note "estimator checkpoint missing — nothing to do"
fi
note "============ round-5g queue done ($(left)s to deadline) ============"
