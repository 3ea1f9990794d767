#!/bin/bash
# Round-2 night supervisor (v2): the host has ONE CPU core and the TPU
# accepts ONE client, so every remaining stage must run strictly
# sequentially. Stages are guarded by artifact existence, so the script
# is safe to re-run after a crash. Launch detached:
#   setsid nohup bash scripts/night_r2.sh > /tmp/night_r2.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
MOB_LOG=${MOB_LOG:-/tmp/chunk_train_r2b2.log}
MOB_RUN=runs/go1_mob_r2b
PK_RUN=runs/parkour_promo_r2b
PK_CHUNKS=${PK_CHUNKS:-5}
# past this deadline skip starting new long stages so the chip and the
# single CPU core are free for the round-end driver bench. DEADLINE is an
# absolute epoch (date -d '04:45 tomorrow' +%s); the old HHMM comparison
# had no midnight wrap (an evening launch at 23:00 was "past" an 04:45
# deadline from the start and skipped every guarded stage).
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -d 'tomorrow 04:45' +%s)}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; }

stamp() { echo "[night] $* $(date +%H:%M:%S)"; }

stamp "waiting for MoB chunk driver ($MOB_LOG)"
while ! grep -q 'chunk_train\] done' "$MOB_LOG" 2>/dev/null; do sleep 30; done
stamp "MoB driver done"

# Stage A1: headline benchmark at HEAD (flat-fold + corner cache included)
if [ ! -s /tmp/bench_r2_post.json ]; then
    stamp "bench"
    python bench.py --num-envs 4096 --iters 5 --warmup 2 \
        > /tmp/bench_r2_post.json 2>/tmp/bench_r2_post.log
    stamp "bench rc=$?"; cat /tmp/bench_r2_post.json
fi

# Stage A2: profile window (what is hot now that the gather is folded)
if [ ! -s /tmp/profile_r2.txt ]; then
    stamp "profile"
    python tools/profile_step.py --mode train --num-envs 4096 --top 25 \
        > /tmp/profile_r2.txt 2>&1
    stamp "profile rc=$?"
fi

# Stage B: final MoB evals on CPU while the TPU is idle (CPU evals must
# NEVER overlap TPU training on this 1-core host)
if [ ! -f "$MOB_RUN/final_eval_done" ]; then
    for it in 80000 90000 100000; do
        ck="$MOB_RUN/checkpoints/state_${it}.pkl"
        [ -f "$ck" ] || continue
        stamp "eval_gaits $it"
        python scripts/eval_gaits.py --checkpoint "$ck" --cpu --steps 250 \
            --num-envs 16 --out "$MOB_RUN/gait_evals.jsonl" \
            >> "$MOB_RUN/gait_evals.log" 2>&1
    done
    stamp "play tracking eval"
    CK=$(ls -t "$MOB_RUN"/checkpoints/state_*.pkl | head -1)
    python scripts/play.py --checkpoint "$CK" --cpu --num-envs 32 \
        --steps 250 --vx 0.5 --gait-stats \
        > "$MOB_RUN/final_play_eval.json" 2>>"$MOB_RUN/gait_evals.log"
    touch "$MOB_RUN/final_eval_done"
    stamp "MoB evals done"
fi

# Stage C: parkour terrain-level promotion run (VERDICT r1 item 5).
# STOP at any chunk boundary: touch runs/parkour_promo_r2/STOP
if [ ! -f "$PK_RUN/SKIP" ] && [ ! -f "$PK_RUN/STOP" ]; then
    stamp "parkour promotion run"
    TRAIN=scripts/train_parkour.py bash scripts/chunk_train.sh \
        "$PK_RUN" 1500 "$PK_CHUNKS" \
        --num-envs 2048 --easy-mode --terrain mixed \
        --set only_forwards=true --set only_forwards_velocity=0.8 \
        --anneal-iterations $((1500 * PK_CHUNKS)) \
        --save-interval 500 --log-freq 50
    stamp "parkour driver exited"
fi

# Stage D: vision pipeline at scale from the parkour expert
# (VERDICT r1 item 7). Guarded per sub-stage.
VZ=runs/vision_r2
PKCK=$(ls -t "$PK_RUN"/state_*.pkl 2>/dev/null | head -1)
if past_deadline; then stamp "deadline — skipping vision"; PKCK=""; fi
if [ -n "${PKCK:-}" ]; then
    mkdir -p "$VZ"
    if [ ! -s "$VZ/rb_demos.pkl" ]; then
        stamp "vision generate ($PKCK)"
        python scripts/train_vision.py generate --checkpoint "$PKCK" \
            --num-envs 1024 --steps 512 --terrain mixed --easy-mode \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/generate.log" 2>&1
        stamp "generate rc=$?"
    fi
    if [ -s "$VZ/rb_demos.pkl" ] && [ ! -s "$VZ/vision_student.pkl" ] && ! past_deadline; then
        stamp "vision train"
        python scripts/train_vision.py train --demos "$VZ/rb_demos.pkl" \
            --checkpoint "$PKCK" --num-envs 1024 --env-steps 262144 \
            --terrain mixed --easy-mode \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/train.log" 2>&1
        stamp "train rc=$?"
    fi
    if [ -s "$VZ/vision_student.pkl" ] && [ ! -s "$VZ/eval.json" ] && ! past_deadline; then
        stamp "vision eval"
        python scripts/train_vision.py eval --student "$VZ/vision_student.pkl" \
            --checkpoint "$PKCK" --num-envs 1024 --steps 512 \
            --terrain mixed --easy-mode \
            --set only_forwards=true --set only_forwards_velocity=0.8 \
            --out "$VZ" > "$VZ/eval.json" 2>"$VZ/eval.log"
        stamp "eval rc=$?"
    fi
fi

# Stage E: targeted test subset (full suite ~35 min does not fit before
# the round-end driver bench on the single CPU core; core files only)
if [ ! -s /tmp/pytest_r2_full.log ] && ! past_deadline; then
    stamp "targeted pytest"
    timeout 1200 python -m pytest tests/test_divergence_guard.py \
        tests/test_learners.py tests/test_curriculum.py -q \
        > /tmp/pytest_r2_full.log 2>&1
    stamp "pytest rc=$?"; tail -2 /tmp/pytest_r2_full.log
fi
stamp "all stages done — TPU free for the driver bench"
