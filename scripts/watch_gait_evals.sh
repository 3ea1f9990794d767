#!/bin/bash
# Milestone watcher for the flagship MoB run: every POLL seconds, if a new
# checkpoint at-or-past the next milestone exists, run the commanded-gait
# sweep on CPU (concurrent-safe with TPU training) and append to
# gait_evals.jsonl. Milestones every STEP iterations.
#
# Usage: watch_gait_evals.sh RUN_DIR [STEP=10000] [POLL=120]
set -u
RUN_DIR=$1; STEP=${2:-10000}; POLL=${3:-120}
cd "$(dirname "$0")/.."
NEXT=$STEP
while true; do
    if [ -f "$RUN_DIR/STOP_EVALS" ]; then echo "[watch] stop"; break; fi
    # newest numbered checkpoint iteration
    best=$(ls "$RUN_DIR"/checkpoints/state_*.pkl 2>/dev/null \
           | grep -o 'state_[0-9]*' | grep -o '[0-9]*' | sort -n | tail -1)
    if [ -n "${best:-}" ] && [ "$best" -ge "$NEXT" ]; then
        ck="$RUN_DIR/checkpoints/state_${best}.pkl"
        echo "[watch] milestone $NEXT -> eval $ck $(date +%H:%M:%S)"
        python scripts/eval_gaits.py --checkpoint "$ck" --cpu --steps 250 \
            --num-envs 16 --out "$RUN_DIR/gait_evals.jsonl" \
            >> "$RUN_DIR/gait_evals.log" 2>&1
        NEXT=$(( (best / STEP + 1) * STEP ))
    fi
    sleep "$POLL"
done
