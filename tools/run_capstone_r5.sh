#!/bin/bash
# Round-5 46-move capstone: the r4 recipe with DEVICE-SIDE synthetic
# action-data generation (SYNTH_DEVICE=1 -> train/device_synth.py; the
# sprite/stage banks live on the chip and the host only assembles clip
# indices).  Verdict gate: action-phase train_throughput >= 20 steps/s
# with eval accuracy at the r4 operating point (det 99.81 / act 99.19 /
# damage 99.99).
set -e
WORKDIR=${1:-/root/capstone_r5}
mkdir -p "$WORKDIR"
cd /root/repo

export SYNTH_DEVICE=${SYNTH_DEVICE:-1}
export DET_STEPS=${DET_STEPS:-12000}
export DET_COMPOSITES=${DET_COMPOSITES:-4800}
export ACT_EPOCHS=${ACT_EPOCHS:-160}
export ACT_STEPS=${ACT_STEPS:-64}
export ACT_BATCH=${ACT_BATCH:-16}
export EVAL_FRAMES=${EVAL_FRAMES:-1800}
export EVAL_PAIRS=${EVAL_PAIRS:-3}
export SMALL_EVAL=${SMALL_EVAL:-1}

echo "=== capstone r5: detector ==="
if [ ! -f "$WORKDIR/detector_state.pkl" ]; then
  python -u tools/pixels_capstone.py "$WORKDIR" --phase detector
fi
echo "=== capstone r5: action (device synth) ==="
if [ ! -f "$WORKDIR/action_state.pkl" ]; then
  python -u tools/pixels_capstone.py "$WORKDIR" --phase action
fi
echo "=== capstone r5: finetune (device synth) ==="
if [ ! -f "$WORKDIR/action_state_pre_ft.pkl" ]; then
  ACT_FT_EPOCHS=${ACT_FT_EPOCHS:-100} ACT_FT_LR=${ACT_FT_LR:-1.2e-4} \
  ACT_FT_DIFFICULTY=${ACT_FT_DIFFICULTY:-2} \
    python -u tools/pixels_capstone.py "$WORKDIR" --phase finetune
fi
echo "=== capstone r5: eval ==="
python -u tools/pixels_capstone.py "$WORKDIR" --phase eval
echo "=== capstone r5: done ==="
