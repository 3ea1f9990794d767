#!/bin/bash
# Round-2 night supervisor: serializes the remaining TPU work after the
# flagship MoB run finishes (only ONE process may own the TPU — see
# .claude/skills/verify/SKILL.md). Safe to re-run; each stage skips if its
# artifact already exists. Launch detached:
#   setsid nohup bash scripts/night_r2.sh > /tmp/night_r2.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
MOB_LOG=${MOB_LOG:-/tmp/chunk_train_r2b2.log}

echo "[night] waiting for MoB chunk driver ($MOB_LOG) $(date +%H:%M:%S)"
while ! grep -q 'chunk_train\] done' "$MOB_LOG" 2>/dev/null; do sleep 30; done
echo "[night] MoB driver done $(date +%H:%M:%S)"

# Stage 1: headline benchmark at HEAD (flat-fold + corner cache included)
if [ ! -s /tmp/bench_r2_post.json ]; then
    echo "[night] bench $(date +%H:%M:%S)"
    python bench.py --num-envs 4096 --iters 5 --warmup 2 \
        > /tmp/bench_r2_post.json 2>/tmp/bench_r2_post.log
    echo "[night] bench rc=$? $(date +%H:%M:%S)"; cat /tmp/bench_r2_post.json
fi

# Stage 2: profile window (what is hot now that the gather is folded)
if [ ! -s /tmp/profile_r2.txt ]; then
    echo "[night] profile $(date +%H:%M:%S)"
    python tools/profile_step.py --mode train --num-envs 4096 --top 25 \
        > /tmp/profile_r2.txt 2>&1
    echo "[night] profile rc=$? $(date +%H:%M:%S)"
fi

# Stage 3: parkour terrain-level promotion run (VERDICT r1 item 5).
# STOP at any chunk boundary: touch runs/parkour_promo_r2/STOP
if [ ! -f runs/parkour_promo_r2/SKIP ]; then
    echo "[night] parkour promotion run $(date +%H:%M:%S)"
    TRAIN=scripts/train_parkour.py bash scripts/chunk_train.sh \
        runs/parkour_promo_r2 1500 6 \
        --num-envs 2048 --easy-mode --terrain mixed \
        --set only_forwards=true --set only_forwards_velocity=0.8 \
        --save-interval 500 --log-freq 50
    echo "[night] parkour driver exited $(date +%H:%M:%S)"
fi
echo "[night] all stages done $(date +%H:%M:%S)"
