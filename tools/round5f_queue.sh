#!/bin/bash
# Round-5f queue — WaveGrad leg while the SNR-joint NaN is debugged on CPU.
set -u
cd /root/repo
mkdir -p logs saved
Q=logs/r5f_queue.log
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
  local log="logs/r5f_${name}.log" rc pid age start now
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

note "============ round-5f queue start ($(left)s to deadline) ============"
run_watched wavegrad_train 900 1200 600 \
  python train_specmodel.py -c configs/config_wavegrad_synth.json
W=$(latest_run SDDM_WaveGrad_synth2)
WBEST="${W}model_best.ckpt"; [ -f "$WBEST" ] || WBEST="${W}checkpoint_current.ckpt"
if [ -n "$W" ] && [ -f "$WBEST" ]; then
  snapshot "$W" wavegrad "WaveGrad trained run"
  run_watched wavegrad_test_ddim6 900 900 400 \
    python test.py -r "$WBEST" --ddim --steps 6
  snapshot "$(latest_run SDDM_WaveGrad_synth2)" wavegrad "WaveGrad ddim6 test"
else
  note "wavegrad checkpoint missing — skipping tests"
fi
note "============ round-5f queue done ($(left)s to deadline) ============"
