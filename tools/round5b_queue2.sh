#!/bin/bash
# Round-5b queue, phase 2 — pesq-gap follow-ups that depend on phase-1
# results (gated on /tmp/r5_queue.pid, written at phase-1 launch).
#
# Phase-1 findings on the retrained small-v2 leg (T=100 packed bf16
# default serving unless noted):
#   default 4.2337 / f32 4.2257 / plain-f32 4.2256 / seeds 4.231-4.236
#   ancestral-12 4.2672            (torch ref best@375: 4.2884)
# -> engine, dtype, and sampler seed are all exonerated; remaining
#    suspects are checkpoint epoch (ref best@375 vs ours best@275) and
#    the step count (ancestral-12 recovers most of the gap).
set -u
cd /root/repo
mkdir -p logs saved
Q=logs/r5b_queue.log

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
    "${cmd[@]}" > "logs/r5b_${name}.log" 2>&1 &
    pid=$!
    while :; do
      sleep 15
      if ! kill -0 "$pid" 2>/dev/null; then wait "$pid"; rc=$?; break; fi
      age=$(( $(date +%s) - $(stat -c %Y "logs/r5b_${name}.log" 2>/dev/null || echo 0) ))
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

SMALL=$(ls -d saved/SDDM2_UNet_synth2_small/*/ 2>/dev/null | sort | tail -1)
if [ -n "$SMALL" ]; then
  # epoch-500 checkpoint (ref's best came later in training than ours)
  run_watched pesq_last 1200 python tools/eval_flagship.py \
    -r "${SMALL}checkpoint_last.ckpt" --data data/synth2/test \
    --out saved/pesq_ab/last --batch-rows 8
  # the recommended serving config on the epoch-500 checkpoint
  run_watched pesq_last_s12 1200 python tools/eval_flagship.py \
    -r "${SMALL}checkpoint_last.ckpt" --data data/synth2/test \
    --out saved/pesq_ab/last_s12 --steps 12 --batch-rows 8
  # hard split under the recommended serving config
  run_watched small_hard_s12 1200 python tools/eval_flagship.py \
    -r "${SMALL}model_best.ckpt" --data data/synth2/test_hard \
    --out saved/pesq_ab/hard_s12 --steps 12 --batch-rows 8
fi

note "phase 2 done"
