#!/bin/bash
# Round-5c supervisor: multi-embodiment rerun with per-robot control
# constants, and the final bench capture. Launch when the TPU is free.
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[r5c] $* $(date +%H:%M:%S)"; }
ckpt_commit() {
    local msg="$1"; shift
    git add -f "$@" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$msg"
}

# ---- multi-embodiment rerun (per-robot gains/init/angles fix) ----------
if [ ! -s results/multi_r5b/metrics.csv ]; then
    stamp "multi-embodiment go1+go2+b1 rerun (2048 envs, 3000 iters)"
    mkdir -p runs/multi_r5b results/multi_r5b
    timeout 10800 python scripts/train_multi.py --robots go1,go2,b1 \
        --num-envs 2048 --iterations 3000 --log-freq 25 \
        --run-dir runs/multi_r5b > runs/multi_r5b/train.log 2>&1
    stamp "multi rc=$?"
    cp runs/multi_r5b/metrics.csv results/multi_r5b/ 2>/dev/null
    ckpt_commit "multi-embodiment rerun with per-robot control constants" \
        results/multi_r5b
fi

# ---- final bench capture ------------------------------------------------
if [ ! -s results/bench_r5.json ]; then
    stamp "bench"
    timeout 1800 python bench.py > /tmp/bench_r5.out 2>&1
    grep -m1 '^{' /tmp/bench_r5.out > results/bench_r5.json
    cat results/bench_r5.json
    ckpt_commit "round-5 bench capture" results/bench_r5.json
fi
stamp "r5c done — TPU free"
