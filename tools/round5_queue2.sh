#!/bin/bash
# Round-5 queue, phase 2 — supplementary evals that depend on phase-1 state.
# Gated on the phase-1 queue PID (/tmp/r5_queue.pid — written by the
# operator at launch; if absent we assume phase 1 already drained).
#
#  A. Flagship global-best checkpoint: resume continues the monitor, so if
#     the resumed run never beats the pre-wedge best (epoch 275,
#     val_loss 0.00735), the newest run dir has NO model_best and phase 1
#     evaluated checkpoint_current (epoch 500) instead.  Evaluate the
#     epoch-275 global best too so the published table uses the honest
#     monitor-selected checkpoint.
#  B. pesq_wb_approx gap: serve the small head-to-head leg through the
#     PLAIN engine in f32 — bit-path-equivalent to the torch leg's
#     (f32, no packing); together with phase 1's packed-f32 leg this
#     separates dtype from packing.
#  C. Hard-split head-to-head assembly happens in the builder session once
#     the torch ref leg (logs/r5_ref_eval_hard.log, CPU) finishes.
#
# Usage: nohup bash tools/round5_queue2.sh > /tmp/r5_queue2_outer.log 2>&1 &
set -u
cd /root/repo
mkdir -p logs saved
Q=logs/r5_queue.log

note() { echo "=== [$(date -u +%H:%M:%S)] [q2] $*" >> "$Q"; }

if [ -f /tmp/r5_queue.pid ]; then
  note "waiting on phase-1 queue pid $(cat /tmp/r5_queue.pid)"
  while kill -0 "$(cat /tmp/r5_queue.pid)" 2>/dev/null; do sleep 30; done
fi
note "phase 2 start"

run_watched() {  # run_watched <name> <idle_timeout_s> <cmd...> — retry once
  local name=$1 timeout=$2 attempt=0 rc pid age
  shift 2
  local -a cmd=("$@")
  while :; do
    note "stage $name attempt $attempt: ${cmd[*]}"
    "${cmd[@]}" > "logs/r5_${name}.log" 2>&1 &
    pid=$!
    while :; do
      sleep 15
      if ! kill -0 "$pid" 2>/dev/null; then wait "$pid"; rc=$?; break; fi
      age=$(( $(date +%s) - $(stat -c %Y "logs/r5_${name}.log" 2>/dev/null || echo 0) ))
      if [ "$age" -gt "$timeout" ]; then
        note "stage $name WEDGED (log idle ${age}s) — kill -9 $pid"
        kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null; rc=137
        sleep 10
        break
      fi
    done
    [ "$rc" = "0" ] && { note "stage $name rc=0"; return 0; }
    attempt=$((attempt + 1))
    [ "$attempt" -gt 1 ] && { note "stage $name FAILED rc=$rc — SKIP"; return 1; }
  done
}

# A. the pre-wedge global-best flagship checkpoint (epoch 275)
GB=saved/SDDM2_UNet_synth2_flagship/0820_052647/model_best.ckpt
if [ -f "$GB" ]; then
  run_watched flagship_eval_best275 900 python tools/eval_flagship.py \
    -r "$GB" --data data/synth2/test --out saved/flagship_v2_eval_best275 --batch-rows 8
  run_watched flagship_eval_best275_hard 900 python tools/eval_flagship.py \
    -r "$GB" --data data/synth2/test_hard --out saved/flagship_v2_eval_best275_hard --batch-rows 8
fi

# B. plain-engine f32 serving of the small leg (reference-equivalent path)
SMALL=saved/SDDM2_UNet_synth2_small/0820_043223
if [ -f "$SMALL/model_best.ckpt" ]; then
  run_watched pesq_base_f32 1800 python tools/eval_flagship.py \
    -r "$SMALL/model_best.ckpt" --data data/synth2/test \
    --out saved/pesq_ab/base_f32 --base --f32 --batch-rows 8
fi

note "phase 2 done"
