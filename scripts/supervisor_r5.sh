#!/bin/bash
# Round-5 supervisor: strictly sequential TPU stages, risk-ordered per the
# round-4 verdict (cheap/crash-prone validation first, long fine-tunes
# last), artifact-guarded (safe to re-run after a crash), per-stage
# timeouts, and a results commit after EVERY stage so driver snapshots
# never orphan finished work. Launch detached AFTER the headline parkour
# run (runs/parkour_soft_r5) has exited:
#   setsid nohup bash scripts/supervisor_r5.sh > /tmp/super_r5.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 8*3600 ))}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; }
stamp() { echo "[r5] $* $(date +%H:%M:%S)"; }
ckpt_commit() {  # ckpt_commit <message> <paths...>
    local msg="$1"; shift
    git add -f "$@" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$msg"
}

PK=runs/parkour_soft_r5
VZ=runs/vision_r5
MOB=runs/go1_mob_r5_cot
SIGMA_FLAGS="--set rewards.sigma_rew_neg_init=none --set ppo.std_range=none"
PKCK=$(ls -t "$PK"/state_*.pkl 2>/dev/null | head -1)

# ---- Stage 0: parkour eval battery (CPU diag + TPU mixed eval) ---------
mkdir -p results/parkour_soft_r5
if [ -n "${PKCK:-}" ] && [ ! -s results/parkour_soft_r5/eval_expert.json ]; then
    stamp "parkour eval battery ($PKCK)"
    for spec in "gap 0" "gap 3" "hurdle 0" "hurdle 3" "jump 0" "jump 3" \
                "stairs 0" "stairs 3" "crawl 0" "crawl 3"; do
        set -- $spec
        out="results/parkour_soft_r5/diag_$1_L$2.json"
        [ -s "$out" ] && continue
        timeout 1500 python tools/diag_parkour.py --checkpoint "$PKCK" \
            --terrain "$1" --level "$2" --num-envs 32 --steps 1300 \
            --set terrain.soft_start=true --cpu > "$out.tmp" 2>/dev/null \
            && mv "$out.tmp" "$out"
        stamp "diag $1 L$2 rc=$?"
    done
    timeout 2400 python scripts/train_vision.py eval --checkpoint "$PKCK" \
        --num-envs 1024 --steps 1300 --terrain mixed \
        --set terrain.soft_start=true \
        --set only_forwards=true --set only_forwards_velocity=0.8 \
        > results/parkour_soft_r5/eval_expert.json.tmp \
        2>results/parkour_soft_r5/eval_expert.log \
        && mv results/parkour_soft_r5/eval_expert.json.tmp \
              results/parkour_soft_r5/eval_expert.json
    stamp "expert mixed eval rc=$?"
    gzip -kf "$PK/metrics.csv" && mv "$PK/metrics.csv.gz" results/parkour_soft_r5/
    python tools/slim_checkpoint.py "$PKCK" \
        checkpoints/parkour_soft_r5.pkl.gz >> /tmp/super_r5.log 2>&1
    ckpt_commit "parkour r5: eval battery + metrics + slim checkpoint" \
        results/parkour_soft_r5 checkpoints/parkour_soft_r5.pkl.gz
fi

# ---- Stage 1: vision distillation from the r5 expert -------------------
if [ -n "${PKCK:-}" ] && [ ! -f "$VZ/SKIP" ] && ! past_deadline; then
    mkdir -p "$VZ" results/vision_r5
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
        cp "$VZ"/eval.json "$VZ/vision_student.pkl" results/vision_r5/ 2>/dev/null
        cp results/parkour_soft_r5/eval_expert.json results/vision_r5/ 2>/dev/null
        ckpt_commit "vision r5: student + eval vs expert" results/vision_r5
    fi
fi

# ---- Stage 2: fused-adaptation-substep A/B (cheap, long-promised) ------
ABCK=$(ls -t runs/go1_mob_r4_obed/checkpoints/state_*.pkl 2>/dev/null | head -1)
if [ -n "${ABCK:-}" ] && [ ! -s results/ab_substep_r5/exact.csv ] && ! past_deadline; then
    mkdir -p results/ab_substep_r5
    for mode in true false; do
        tag=$([ "$mode" = true ] && echo fused || echo exact)
        stamp "A/B substep: $tag"
        rm -rf "runs/ab_$tag"
        timeout 3600 python scripts/train.py --preset go1_mob --num-envs 4096 \
            --run-dir "runs/ab_$tag" --iterations 400 --resume "$ABCK" \
            $SIGMA_FLAGS --set ppo.fused_adaptation_substep=$mode \
            --log-freq 20 --save-interval 0 > "/tmp/ab_$tag.log" 2>&1
        stamp "$tag rc=$?"
        cp "runs/ab_$tag/metrics.csv" "results/ab_substep_r5/$tag.csv" 2>/dev/null
    done
    ckpt_commit "fused-adaptation-substep A/B curves (r5)" results/ab_substep_r5
fi

# ---- Stage 3: multi-embodiment TPU run ---------------------------------
if [ ! -s results/multi_r5/metrics.csv ] && ! past_deadline; then
    stamp "multi-embodiment go1+go2+b1 (2048 envs, 1500 iters)"
    mkdir -p runs/multi_r5 results/multi_r5
    timeout 10800 python scripts/train_multi.py --robots go1,go2,b1 \
        --num-envs 2048 --iterations 1500 --log-freq 25 \
        --run-dir runs/multi_r5 > runs/multi_r5/train.log 2>&1
    stamp "multi rc=$?"
    cp runs/multi_r5/metrics.csv results/multi_r5/ 2>/dev/null
    ckpt_commit "multi-embodiment mixed-batch training run (r5)" results/multi_r5
fi

# ---- Stage 4: MoB CoT fine-tune (longest, last) ------------------------
if [ ! -f "$MOB/STOP" ] && [ ! -f "$MOB/ft_done" ] && ! past_deadline; then
    mkdir -p "$MOB"
    if [ ! -f "$MOB/chunkA_done" ]; then
        stamp "MoB CoT chunk A (energy emphasis, 3k iters)"
        timeout 7200 python scripts/train.py --preset go1_mob --num-envs 4096 \
            --run-dir "$MOB" --iterations 3000 \
            --resume "$ABCK" $SIGMA_FLAGS \
            --set reward_scales.torques=-0.0004 \
            --set reward_scales.dof_vel=-0.0004 \
            --save-interval 2500 --log-freq 50 >> "$MOB/train.log" 2>&1
        stamp "chunk A rc=$?" && touch "$MOB/chunkA_done"
    fi
    if [ -f "$MOB/chunkA_done" ] && ! past_deadline; then
        stamp "MoB CoT chunk B (reference-exact scales, 1.5k iters)"
        NEWEST=$(ls -t "$MOB"/checkpoints/state_*.pkl | head -1)
        timeout 5400 python scripts/train.py --preset go1_mob --num-envs 4096 \
            --run-dir "$MOB" --iterations 1500 --resume "$NEWEST" \
            $SIGMA_FLAGS --save-interval 1400 --log-freq 50 \
            >> "$MOB/train.log" 2>&1
        stamp "chunk B rc=$?"
        touch "$MOB/ft_done"
    fi
fi

# ---- Stage 5: MoB evals ------------------------------------------------
CK=$(ls -t "$MOB"/checkpoints/state_*.pkl 2>/dev/null | head -1)
if [ -n "${CK:-}" ] && [ -f "$MOB/ft_done" ] && [ ! -f "$MOB/evals_done" ]; then
    mkdir -p results/go1_mob_r5_cot
    if [ ! -s "$MOB/obedience.jsonl" ]; then
        stamp "obedience eval (post-ft)"
        WTW_PHYSICS_BACKEND=xla timeout 2400 python scripts/eval_gaits.py \
            --checkpoint "$CK" --num-envs 32 --steps 300 --obedience \
            --out "$MOB/obedience.jsonl" > "$MOB/obedience.log" 2>&1
        stamp "rc=$?"
    fi
    if [ ! -s "$MOB/gait_evals.jsonl" ]; then
        stamp "gait eval"
        WTW_PHYSICS_BACKEND=xla timeout 2400 python scripts/eval_gaits.py \
            --checkpoint "$CK" --num-envs 32 --steps 300 \
            --out "$MOB/gait_evals.jsonl" > "$MOB/gait_evals.log" 2>&1
        stamp "rc=$?"
    fi
    if [ ! -s "$MOB/final_play_eval.json" ]; then
        stamp "play tracking eval (CoT)"
        WTW_PHYSICS_BACKEND=xla timeout 2400 python scripts/play.py \
            --checkpoint "$CK" --num-envs 32 --steps 250 --vx 0.5 \
            --gait-stats > "$MOB/final_play_eval.json.tmp" 2>"$MOB/play.log" \
            && mv "$MOB/final_play_eval.json.tmp" "$MOB/final_play_eval.json"
        stamp "rc=$?"
    fi
    python tools/slim_checkpoint.py "$CK" \
        checkpoints/go1_mob_r5_cot.pkl.gz >> "$MOB/train.log" 2>&1
    cp "$MOB"/obedience.jsonl "$MOB/gait_evals.jsonl" \
       "$MOB/final_play_eval.json" results/go1_mob_r5_cot/ 2>/dev/null
    gzip -kf "$MOB/metrics.csv" && \
        mv "$MOB/metrics.csv.gz" results/go1_mob_r5_cot/
    touch "$MOB/evals_done"
    ckpt_commit "MoB CoT fine-tune: evals + metrics + slim checkpoint (r5)" \
        results/go1_mob_r5_cot checkpoints/go1_mob_r5_cot.pkl.gz
    stamp "MoB evals done"
fi

stamp "all stages done — TPU free"
