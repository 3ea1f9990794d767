#!/bin/bash
# Round-5b supervisor: parkour v2 (quadratic soft-start ramps) + vision
# distillation from the v2 expert. Artifact-guarded; commits after every
# stage. Launch detached when the TPU is free:
#   setsid nohup bash scripts/supervisor_r5b.sh > /tmp/super_r5b.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 7*3600 ))}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; }
stamp() { echo "[r5b] $* $(date +%H:%M:%S)"; }
ckpt_commit() {
    local msg="$1"; shift
    git add -f "$@" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$msg"
}

PK=runs/parkour_v2_r5
VZ=runs/vision_v2_r5

# ---- Stage P: parkour v2 training (quadratic soft-start) ----------------
if [ ! -f "$PK/STOP" ] && [ -z "$(ls "$PK"/state_*.pkl 2>/dev/null)" ] && ! past_deadline; then
    mkdir -p "$PK"
    stamp "parkour v2 train (4096 envs x 8000 iters)"
    timeout 7200 python scripts/train_parkour.py --run-dir "$PK" \
        --iterations 8000 --num-envs 4096 --terrain mixed \
        --soft-start --std-floor 0.3 \
        --set only_forwards=true --set only_forwards_velocity=0.8 \
        --save-interval 2000 --log-freq 50 > "$PK/train.log" 2>&1
    stamp "train rc=$?"
fi

PKCK=$(ls -t "$PK"/state_*.pkl 2>/dev/null | head -1)

# ---- Stage P2: eval battery --------------------------------------------
if [ -n "${PKCK:-}" ] && [ ! -s results/parkour_v2_r5/eval_expert.json ]; then
    mkdir -p results/parkour_v2_r5
    stamp "parkour v2 eval battery ($PKCK)"
    timeout 2400 python scripts/train_vision.py eval --checkpoint "$PKCK" \
        --num-envs 1024 --steps 1300 --terrain mixed \
        --set terrain.soft_start=true \
        --set only_forwards=true --set only_forwards_velocity=0.8 \
        > results/parkour_v2_r5/eval_expert.json.tmp \
        2>results/parkour_v2_r5/eval_expert.log \
        && mv results/parkour_v2_r5/eval_expert.json.tmp \
              results/parkour_v2_r5/eval_expert.json
    stamp "expert mixed eval rc=$?"
    for spec in "gap 0" "gap 2" "gap 4" "hurdle 0" "hurdle 2" "hurdle 4" \
                "jump 0" "jump 2" "jump 4" "stairs 2" "stairs 4" \
                "crawl 2" "crawl 4"; do
        set -- $spec
        out="results/parkour_v2_r5/diag_$1_L$2.json"
        [ -s "$out" ] && continue
        timeout 1500 python tools/diag_parkour.py --checkpoint "$PKCK" \
            --terrain "$1" --level "$2" --num-envs 32 --steps 1300 \
            --set terrain.soft_start=true --cpu > "$out.tmp" 2>/dev/null \
            && mv "$out.tmp" "$out"
        stamp "diag $1 L$2 rc=$?"
    done
    gzip -kf "$PK/metrics.csv" && mv "$PK/metrics.csv.gz" results/parkour_v2_r5/
    python tools/slim_checkpoint.py "$PKCK" \
        checkpoints/parkour_v2_r5.pkl.gz >> /tmp/super_r5b.log 2>&1
    ckpt_commit "parkour v2 (quadratic soft-start): train + eval battery" \
        results/parkour_v2_r5 checkpoints/parkour_v2_r5.pkl.gz
fi

# ---- Stage V: vision distillation from the v2 expert --------------------
if [ -n "${PKCK:-}" ] && [ ! -f "$VZ/SKIP" ] && ! past_deadline; then
    mkdir -p "$VZ" results/vision_v2_r5
    if [ ! -s "$VZ/rb_demos.pkl" ]; then
        stamp "vision generate (expert: $PKCK)"
        timeout 3000 python scripts/train_vision.py generate \
            --checkpoint "$PKCK" --num-envs 1024 --steps 512 \
            --terrain mixed --set terrain.soft_start=true \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/generate.log" 2>&1
        stamp "generate rc=$?"
    fi
    if [ -s "$VZ/rb_demos.pkl" ] && [ ! -s "$VZ/vision_student.pkl" ] && ! past_deadline; then
        stamp "vision train (1024 envs, BC 6000 + 524k DDPG steps)"
        timeout 10800 python scripts/train_vision.py train \
            --demos "$VZ/rb_demos.pkl" \
            --num-envs 1024 --env-steps 524288 --bc-steps 6000 \
            --terrain mixed --set terrain.soft_start=true \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/train.log" 2>&1
        stamp "train rc=$?"
    fi
    if [ -s "$VZ/vision_student.pkl" ] && [ ! -s "$VZ/eval.json" ]; then
        stamp "vision eval (student)"
        timeout 3000 python scripts/train_vision.py eval \
            --student "$VZ/vision_student.pkl" \
            --num-envs 1024 --steps 1300 --terrain mixed \
            --set terrain.soft_start=true \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/eval.json.tmp" 2>"$VZ/eval.log" \
            && mv "$VZ/eval.json.tmp" "$VZ/eval.json"
        stamp "student eval rc=$?"
        cp "$VZ"/eval.json "$VZ/vision_student.pkl" results/vision_v2_r5/ 2>/dev/null
        cp results/parkour_v2_r5/eval_expert.json results/vision_v2_r5/ 2>/dev/null
        ckpt_commit "vision v2: student + eval vs expert" results/vision_v2_r5
    fi
fi

stamp "r5b stages done — TPU free"
