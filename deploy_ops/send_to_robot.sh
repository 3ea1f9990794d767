#!/bin/bash
# rsync the robot-side subset of the repo to the Go1's onboard computer —
# the analog of go1_gym_deploy/scripts/send_to_unitree.sh (which syncs
# go1_gym_deploy/ + runs/ to unitree@192.168.123.15).
#
# Usage:  ./send_to_robot.sh [user@host] [--dry-run]
set -euo pipefail
cd "$(dirname "$0")/.."

TARGET="${1:-unitree@192.168.123.15}"
DRY=""
for a in "$@"; do [ "$a" = "--dry-run" ] && DRY="--dry-run"; done

# robot side needs: numpy deploy stack, the C++ bridge source (built on the
# robot by the installer), ops scripts, and exported policies. Notably NOT
# jax / the training stack.
rsync -av $DRY -e ssh \
  --include='runs/*/checkpoints/policy_*.npz' \
  --exclude='runs/*/checkpoints/*' \
  --exclude='*.pkl' --exclude='*.mp4' --exclude='__pycache__' \
  wtw_tpu/deploy wtw_tpu/__init__.py wtw_tpu/utils \
  scripts/deploy.py cpp deploy_ops runs \
  "$TARGET:~/wtw/"
echo "synced to $TARGET:~/wtw"
