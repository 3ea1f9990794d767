#!/bin/bash
# Round-4 supervisor: strictly sequential TPU stages (ONE TPU client, ONE
# CPU core — see .claude/skills/verify/SKILL.md). Artifact-guarded so it is
# safe to re-run after a crash. Launch detached:
#   setsid nohup bash scripts/supervisor_r4.sh > /tmp/super_r4.log 2>&1 < /dev/null &
#
# Stages (VERDICT round-3 "Next round" items):
#   1. MoB obedience fine-tune from the 100k checkpoint: chunk A with
#      boosted scales on the disobeyed dims (raibert/clearance/orientation),
#      chunk B back at reference-exact scales; constant sigma 0.02, std
#      clamp off (the reference-exact stabilizer setting validated in r3).
#   2. Obedience + gait + tracking evals (TPU, xla backend) before/after.
#   3. Full-difficulty parkour (no easy_mode) resumed from the r2b slim
#      checkpoint, with the new per-kind crossing-rate columns.
#   4. Vision distillation at 1024 envs with a 8x step budget.
#   5. A/B of the fused adaptation substep (same exact-resume start).
#   6. Pallas parity pytest on TPU (driver-visible artifact).
set -u
cd "$(dirname "$0")/.."
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 4*3600 ))}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; }
stamp() { echo "[r4] $* $(date +%H:%M:%S)"; }

MOB=runs/go1_mob_r4_obed
PK=runs/parkour_full_r4
VZ=runs/vision_r4
SIGMA_FLAGS="--set rewards.sigma_rew_neg_init=none --set ppo.std_range=none"
OBED_FLAGS="--set reward_scales.raibert_heuristic=-15 \
  --set reward_scales.feet_clearance_cmd_linear=-45 \
  --set reward_scales.orientation_control=-10"

# ---- Stage 0: obedience BASELINE on the 100k checkpoint (xla backend,
# small batch on TPU: compiles once, runs in seconds) --------------------
mkdir -p "$MOB" results
if [ ! -s "$MOB/obedience_100k.jsonl" ]; then
    stamp "obedience baseline (100k)"
    WTW_PHYSICS_BACKEND=xla timeout 2400 python scripts/eval_gaits.py \
        --checkpoint checkpoints/go1_mob_r2b_100k.pkl.gz --num-envs 32 \
        --steps 300 --obedience --out "$MOB/obedience_100k.jsonl" \
        > "$MOB/obedience_100k.log" 2>&1
    stamp "rc=$?"
fi

# ---- Stage 1: MoB obedience fine-tune ----------------------------------
if [ ! -f "$MOB/STOP" ] && [ ! -f "$MOB/ft_done" ] && ! past_deadline; then
    if [ ! -f "$MOB/chunkA_done" ]; then
        stamp "MoB ft chunk A (boosted obedience scales, 4k iters)"
        python scripts/train.py --preset go1_mob --num-envs 4096 \
            --run-dir "$MOB" --iterations 4000 \
            --resume checkpoints/go1_mob_r2b_100k.pkl.gz \
            $SIGMA_FLAGS $OBED_FLAGS \
            --save-interval 3000 --log-freq 50 >> "$MOB/train.log" 2>&1
        stamp "chunk A rc=$?" && touch "$MOB/chunkA_done"
    fi
    if [ -f "$MOB/chunkA_done" ] && [ ! -f "$MOB/ft_done" ] && ! past_deadline; then
        stamp "MoB ft chunk B (reference-exact scales, 2k iters)"
        NEWEST=$(ls -t "$MOB"/checkpoints/state_*.pkl | head -1)
        python scripts/train.py --preset go1_mob --num-envs 4096 \
            --run-dir "$MOB" --iterations 2000 --resume "$NEWEST" \
            $SIGMA_FLAGS --save-interval 1500 --log-freq 50 \
            >> "$MOB/train.log" 2>&1
        stamp "chunk B rc=$?"
        touch "$MOB/ft_done"
    fi
fi

# ---- Stage 2: MoB evals (TPU, xla backend) ------------------------------
CK=$(ls -t "$MOB"/checkpoints/state_*.pkl 2>/dev/null | head -1)
if [ -n "${CK:-}" ] && [ -f "$MOB/ft_done" ] && [ ! -f "$MOB/evals_done" ]; then
    stamp "obedience eval (post-ft)"
    WTW_PHYSICS_BACKEND=xla timeout 2400 python scripts/eval_gaits.py \
        --checkpoint "$CK" --num-envs 32 --steps 300 --obedience \
        --out "$MOB/obedience.jsonl" > "$MOB/obedience.log" 2>&1
    stamp "gait eval"
    WTW_PHYSICS_BACKEND=xla timeout 2400 python scripts/eval_gaits.py \
        --checkpoint "$CK" --num-envs 32 --steps 300 \
        --out "$MOB/gait_evals.jsonl" > "$MOB/gait_evals.log" 2>&1
    stamp "play tracking eval"
    WTW_PHYSICS_BACKEND=xla timeout 2400 python scripts/play.py \
        --checkpoint "$CK" --num-envs 32 --steps 250 --vx 0.5 --gait-stats \
        > "$MOB/final_play_eval.json" 2>"$MOB/play.log"
    python tools/slim_checkpoint.py "$CK" \
        checkpoints/go1_mob_r4_obed.pkl.gz >> "$MOB/train.log" 2>&1
    mkdir -p results/go1_mob_r4_obed
    cp "$MOB"/obedience*.jsonl "$MOB/gait_evals.jsonl" \
       "$MOB/final_play_eval.json" results/go1_mob_r4_obed/ 2>/dev/null
    gzip -kf "$MOB/metrics.csv" && \
        mv "$MOB/metrics.csv.gz" results/go1_mob_r4_obed/
    touch "$MOB/evals_done"
    stamp "MoB evals done"
fi

# ---- Stage 3: vision distillation at 1024 envs (BC warm start) ----------
# Runs BEFORE parkour: the r2b expert already traverses its promoted
# terrain; the student deliverable (VERDICT #2) must not be lost to the
# deadline if parkour training runs long.
PKCK=$(ls -t "$PK"/state_*.pkl 2>/dev/null | head -1)
[ -z "${PKCK:-}" ] && PKCK=checkpoints/parkour_promo_r2b_7k5.pkl.gz
if [ ! -f "$VZ/SKIP" ] && ! past_deadline; then
    mkdir -p "$VZ"
    if [ ! -s "$VZ/rb_demos.pkl" ]; then
        stamp "vision generate (expert: $PKCK)"
        python scripts/train_vision.py generate \
            --checkpoint "$PKCK" --num-envs 1024 --steps 512 \
            --terrain mixed \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/generate.log" 2>&1
        stamp "generate rc=$?"
    fi
    if [ -s "$VZ/rb_demos.pkl" ] && [ ! -s "$VZ/vision_student.pkl" ] && ! past_deadline; then
        stamp "vision train (1024 envs, BC warm start + 524k DDPG steps)"
        python scripts/train_vision.py train --demos "$VZ/rb_demos.pkl" \
            --num-envs 1024 --env-steps 524288 \
            --bc-steps 6000 \
            --terrain mixed \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/train.log" 2>&1
        stamp "train rc=$?"
    fi
    if [ -s "$VZ/vision_student.pkl" ] && [ ! -s "$VZ/eval.json" ]; then
        stamp "vision eval (student)"
        python scripts/train_vision.py eval \
            --student "$VZ/vision_student.pkl" \
            --num-envs 1024 --steps 256 --terrain mixed \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/eval.json" 2>"$VZ/eval.log"
        stamp "eval rc=$?"
        stamp "vision eval (expert, same conditions)"
        python scripts/train_vision.py eval \
            --checkpoint "$PKCK" \
            --num-envs 1024 --steps 256 --terrain mixed \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/eval_expert.json" 2>>"$VZ/eval.log"
        stamp "expert eval rc=$?"
        mkdir -p results/vision_r4
        cp "$VZ"/eval*.json "$VZ/vision_student.pkl" results/vision_r4/ 2>/dev/null
    fi
fi

# ---- Stage 4: full-difficulty parkour (NO easy_mode) --------------------
if [ ! -f "$PK/SKIP" ] && [ ! -f "$PK/STOP" ] && [ ! -f "$PK/done" ] && ! past_deadline; then
    mkdir -p "$PK"
    if [ ! -s "$PK/state_last.pkl" ] && \
       [ -z "$(ls "$PK"/state_*.pkl 2>/dev/null)" ]; then
        stamp "parkour full-difficulty chunk 1 (resume r2b slim)"
        python scripts/train_parkour.py --run-dir "$PK" --iterations 2000 \
            --num-envs 2048 --terrain mixed \
            --resume checkpoints/parkour_promo_r2b_7k5.pkl.gz \
            --anneal-iterations 16000 \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --save-interval 1000 --log-freq 50 >> "$PK/train.log" 2>&1
        stamp "chunk 1 rc=$?"
    fi
    for i in 2 3; do
        past_deadline && break
        [ -f "$PK/STOP" ] && break
        NEWEST=$(ls -t "$PK"/state_*.pkl 2>/dev/null | head -1)
        [ -z "$NEWEST" ] && break
        stamp "parkour chunk $i"
        python scripts/train_parkour.py --run-dir "$PK" --iterations 2000 \
            --num-envs 2048 --terrain mixed --resume "$NEWEST" \
            --anneal-iterations 16000 \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --save-interval 1000 --log-freq 50 >> "$PK/train.log" 2>&1
        stamp "chunk $i rc=$?"
    done
    NEWEST=$(ls -t "$PK"/state_*.pkl 2>/dev/null | head -1)
    if [ -n "$NEWEST" ]; then
        python tools/slim_checkpoint.py "$NEWEST" \
            checkpoints/parkour_full_r4.pkl.gz >> "$PK/train.log" 2>&1
        mkdir -p results/parkour_full_r4
        gzip -kf "$PK/metrics.csv" && \
            mv "$PK/metrics.csv.gz" results/parkour_full_r4/
        touch "$PK/done"
    fi
    stamp "parkour done"
fi

# ---- Stage 5: A/B fused adaptation substep (same exact-resume start) ----
ABCK=$(ls -t "$MOB"/checkpoints/state_*.pkl 2>/dev/null | head -1)
if [ -n "${ABCK:-}" ] && [ ! -s runs/ab_exact/metrics.csv ] && ! past_deadline; then
    for mode in true false; do
        tag=$([ "$mode" = true ] && echo fused || echo exact)
        stamp "A/B substep: $tag"
        python scripts/train.py --preset go1_mob --num-envs 4096 \
            --run-dir "runs/ab_$tag" --iterations 400 --resume "$ABCK" \
            $SIGMA_FLAGS --set ppo.fused_adaptation_substep=$mode \
            --log-freq 20 --save-interval 0 > "/tmp/ab_$tag.log" 2>&1
        stamp "$tag rc=$?"
        mkdir -p results/ab_substep_r4
        cp "runs/ab_$tag/metrics.csv" "results/ab_substep_r4/$tag.csv" 2>/dev/null
    done
fi

# ---- Stage 5b: multi-embodiment mixed-batch training run ----------------
if [ ! -s results/multi_r4/metrics.csv ] && ! past_deadline; then
    stamp "multi-embodiment go1+go2+b1 (2048 envs, 1500 iters)"
    mkdir -p runs/multi_r4 results/multi_r4
    python scripts/train_multi.py --robots go1,go2,b1 --num-envs 2048 \
        --iterations 1500 --log-freq 25 --run-dir runs/multi_r4 \
        > runs/multi_r4/train.log 2>&1
    stamp "multi rc=$?"
    cp runs/multi_r4/metrics.csv results/multi_r4/ 2>/dev/null
fi

# ---- Stage 6: Pallas parity pytest ON TPU (driver-visible artifact) -----
if [ ! -s results/pallas_tpu_r4.txt ]; then
    stamp "pallas parity pytest on TPU"
    WTW_TEST_TPU=1 timeout 2400 python -m pytest \
        tests/test_physics_batched.py -k pallas -q \
        > results/pallas_tpu_r4.txt 2>&1
    stamp "pallas pytest rc=$?"; tail -2 results/pallas_tpu_r4.txt
fi

stamp "all stages done — TPU free"
