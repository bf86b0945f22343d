#!/bin/bash
# Round-4 TPU queue, phase 2 — runs after tools/round4_queue.sh exits:
# vocoder + SNR-family quality evals, the WaveGrad trained leg, the
# gather-free packed-training A/B on chip, and the train-step MFU trace.
set -u
cd /root/repo
mkdir -p logs saved

if [ -f /tmp/r4_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue.pid)" 2>/dev/null; do sleep 30; done
fi

stage() {
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

latest_run() {
  ls -d saved/"$1"/*/ 2>/dev/null | sort | tail -1
}

# 1. Vocoder quality: trained DiffWave, full-T vs DDIM-6 (VERDICT r3 #3/#7).
D=$(latest_run SDDM_DiffWave_synth2)
require "${D}" diffwave_test && stage diffwave_test python test.py -r "${D}model_best.ckpt"
require "${D}" diffwave_test_ddim6 && stage diffwave_test_ddim6 python test.py -r "${D}model_best.ckpt" --ddim 6

# 2. SNR-adaptive family inference + evaluation (VERDICT r3 #5).
S=$(latest_run SDDM2_UNet_with_SNREstimator_synth2)
require "${S}" snr_infer && stage snr_infer python infer_with_snr_estimator.py -r "${S}model_best.ckpt"

# 3. WaveGrad trained leg on corpus v2 + full-T vs DDIM-6 quality (VERDICT r3 #7).
stage wavegrad_train python train_specmodel.py -c configs/config_wavegrad_synth.json
W=$(latest_run SDDM_WaveGrad_synth2)
require "${W}" wavegrad_test_ddim6 && stage wavegrad_test_ddim6 python test.py -r "${W}model_best.ckpt" --ddim 6
require "${W}" wavegrad_test && stage wavegrad_test python test.py -r "${W}model_best.ckpt"

# 4. Gather-free packed-training A/B on chip (VERDICT r3 #4b).
stage packed_train_ab python tools/packed_train_ab.py --impl both --steps 20

# 5. Train-step MFU from an xplane trace (VERDICT r3 #4a).
stage mfu_train python tools/mfu.py --train

# 6. Warm bench (both driver metrics) for the round-end capture.
stage bench python bench.py
echo "=== [$(date -u +%H:%M:%S)] queue2 done" >> logs/r4_queue.log
