#!/bin/bash
# Round-4 TPU run queue: the quality runs the verdict asked for, chained so
# the single chip is never contended.  Each stage logs to logs/r4_*.log and
# the queue keeps going past a failed stage (failures are visible in the log).
set -u
cd /root/repo
mkdir -p logs saved

# queue2 gates on this pid so the single chip is never contended
echo $$ > /tmp/r4_queue.pid
trap 'rm -f /tmp/r4_queue.pid' EXIT

stage() {  # stage <name> <cmd...>
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] stage $name: $*" >> logs/r4_queue.log
  "$@" > "logs/r4_${name}.log" 2>&1
  echo "=== [$(date -u +%H:%M:%S)] stage $name rc=$?" >> logs/r4_queue.log
}


require() {  # require <value> <stage-name> — skip loudly if run dir missing
  [ -n "$1" ] && return 0
  echo "=== [$(date -u +%H:%M:%S)] SKIP $2: run dir missing" >> logs/r4_queue.log
  return 1
}

latest_run() {  # latest_run <saved-name>
  ls -d saved/"$1"/*/ 2>/dev/null | sort | tail -1
}

# 1. Our head-to-head leg: small v2, 500 epochs (same 200-file subset as the
#    torch reference leg).
stage small_train python train.py -c configs/config_unet_synth_small_v2.json
R=$(latest_run SDDM2_UNet_synth2_small)
require "${R}" small_eval && stage small_eval python tools/eval_flagship.py -r "${R}model_best.ckpt" \
  --data data/synth2/test --out saved/our_eval --batch-rows 8

# 2. Flagship v2: full-size recipe on corpus v2 (fills ROUND4_FLAGSHIP_TABLE).
stage flagship_train python train.py -c configs/config_unet_synth_flagship_v2.json
F=$(latest_run SDDM2_UNet_synth2_flagship)
require "${F}" flagship_eval && stage flagship_eval python tools/eval_flagship.py -r "${F}model_best.ckpt" \
  --data data/synth2/test --out saved/flagship_v2_eval --batch-rows 8
require "${F}" flagship_eval_s12 && stage flagship_eval_s12 python tools/eval_flagship.py -r "${F}model_best.ckpt" \
  --data data/synth2/test --out saved/flagship_v2_eval_s12 --steps 12 --batch-rows 8
require "${F}" flagship_eval_ddim6 && stage flagship_eval_ddim6 python tools/eval_flagship.py -r "${F}model_best.ckpt" \
  --data data/synth2/test --out saved/flagship_v2_eval_ddim6 --ddim 6 --batch-rows 8

# 3. Vocoder family: spectrogram prep + DiffWave training on corpus v2.
stage spec_train python prepare_spectrogram.py data/synth2/train -c configs/config_diffwave_synth.json --resume
stage spec_test  python prepare_spectrogram.py data/synth2/test  -c configs/config_diffwave_synth.json --resume
stage diffwave_train python train_specmodel.py -c configs/config_diffwave_synth.json

# 4. SNR-adaptive family end to end.
stage snr_est_train python train_snr_estimator.py -c configs/config_snr_estimator_synth.json
E=$(latest_run SDDM2_SNREstimator_synth2)
stage snr_train python train_with_snr_estimator.py -c configs/config_unet_snr_synth.json \
  -s "${E}model_best.ckpt"
echo "=== [$(date -u +%H:%M:%S)] queue done" >> logs/r4_queue.log
