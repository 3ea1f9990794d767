#!/bin/bash
# Chunked long-horizon training driver for the axon TPU terminal.
#
# Runs train.py in bounded chunks that EXIT CLEANLY (the axon terminal
# wedges ~1 time in 3 when a TPU client is killed mid-run, so chunks must
# never be killed; see .claude/skills/verify/SKILL.md). Each chunk resumes
# from the newest state_*.pkl by mtime. Stop by `touch <run_dir>/STOP`
# (takes effect at the next chunk boundary).
#
# Usage: chunk_train.sh RUN_DIR CHUNK_ITERS MAX_CHUNKS [extra train.py args...]
# Set TRAIN=scripts/train_parkour.py to chunk a Stack-B run instead.
set -u
RUN_DIR=$1; CHUNK=$2; MAXC=$3; shift 3
TRAIN=${TRAIN:-scripts/train.py}
mkdir -p "$RUN_DIR"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$MAXC"); do
    if [ -f "$RUN_DIR/STOP" ]; then echo "[chunk_train] STOP file — exiting"; break; fi
    RESUME=""
    # Stack A saves under checkpoints/, Stack B at the run-dir root
    NEWEST=$(ls -t "$RUN_DIR"/checkpoints/state_*.pkl "$RUN_DIR"/state_*.pkl 2>/dev/null | head -1)
    if [ -n "$NEWEST" ]; then RESUME="--resume $NEWEST"; fi
    echo "[chunk_train] chunk $i/$MAXC resume='$RESUME' $(date +%H:%M:%S)"
    python "$TRAIN" --run-dir "$RUN_DIR" --iterations "$CHUNK" \
        $RESUME "$@" >> "$RUN_DIR/train.log" 2>&1
    rc=$?
    echo "[chunk_train] chunk $i rc=$rc $(date +%H:%M:%S)"
    if [ $rc -ne 0 ]; then echo "[chunk_train] chunk failed — stopping"; break; fi
done
echo "[chunk_train] done $(date +%H:%M:%S)"
