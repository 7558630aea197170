#!/bin/bash
# Round-4 46-move capstone run: doubled detector pose coverage for the
# 46-move sprite space (the 27->47-class detection drop tracked to
# composite-pool coverage), full action budget + warm-restart fine-tune,
# then the held-out eval.  Phases run as subprocesses (tunnel-client leak
# containment) and resume from state pickles if interrupted.
set -e
WORKDIR=${1:-/root/capstone_r4}
mkdir -p "$WORKDIR"
cd /root/repo

export DET_STEPS=${DET_STEPS:-12000}
export DET_COMPOSITES=${DET_COMPOSITES:-4800}
export ACT_EPOCHS=${ACT_EPOCHS:-160}
export ACT_STEPS=${ACT_STEPS:-64}
export ACT_BATCH=${ACT_BATCH:-16}
export EVAL_FRAMES=${EVAL_FRAMES:-1800}
export EVAL_PAIRS=${EVAL_PAIRS:-3}
export SMALL_EVAL=${SMALL_EVAL:-1}

echo "=== capstone r4: detector ==="
if [ ! -f "$WORKDIR/detector_state.pkl" ]; then
  python -u tools/pixels_capstone.py "$WORKDIR" --phase detector
fi
echo "=== capstone r4: action ==="
if [ ! -f "$WORKDIR/action_state.pkl" ]; then
  python -u tools/pixels_capstone.py "$WORKDIR" --phase action
fi
echo "=== capstone r4: finetune ==="
if [ ! -f "$WORKDIR/action_state_pre_ft.pkl" ]; then
  ACT_FT_EPOCHS=${ACT_FT_EPOCHS:-100} ACT_FT_LR=${ACT_FT_LR:-1.2e-4} \
    python -u tools/pixels_capstone.py "$WORKDIR" --phase finetune
fi
echo "=== capstone r4: eval ==="
python -u tools/pixels_capstone.py "$WORKDIR" --phase eval
echo "=== capstone r4: done ==="
