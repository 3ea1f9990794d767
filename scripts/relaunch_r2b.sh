#!/bin/bash
# One-shot supervisor: wait for the running chunk driver to exit at the
# STOP boundary, then resume the MoB run with the sharpened sigma anneal
# (reference objective engages at ~65k iterations instead of 100k — the
# policy is now robust enough to absorb the sharper penalty exponent).
set -u
cd "$(dirname "$0")/.."
while ! grep -q 'chunk_train\] done' /tmp/chunk_train_r2b.log 2>/dev/null; do
    sleep 20
done
rm -f runs/go1_mob_r2b/STOP
setsid nohup bash scripts/chunk_train.sh runs/go1_mob_r2b 10000 5 \
    --preset go1_mob --num-envs 4096 --save-interval 1000 --log-freq 50 \
    --set ac.compute_dtype=bfloat16 \
    --set rewards.sigma_rew_neg_anneal_steps=1560000 \
    > /tmp/chunk_train_r2b2.log 2>&1 < /dev/null &
echo "[relaunch] driver pid $! $(date +%H:%M:%S)"
