#!/bin/bash
# On-robot installation — the analog of
# go1_gym_deploy/installer/install_deployment_code.sh (which docker-loads an
# 11 GB image). Here: build the C++ bridge, build (or load) the slim
# controller image, and install the autostart units.
#
# Run ON the robot's onboard computer after deploy_ops/send_to_robot.sh.
# --dry-run prints every step without executing.
set -euo pipefail
cd "$(dirname "$0")/../.."

DRY=""
[ "${1:-}" = "--dry-run" ] && DRY="echo +"

echo "== wtw_tpu Go1 deployment installer =="
echo "This software can physically move a robot. Keep the robot hung up"
echo "for the first run; the R2 dead-man switch must be held for motion."

echo "[1/3] building the 500 Hz LCM bridge (sim + unitree-sdk backends)"
$DRY make -C cpp
if [ -d "$HOME/unitree_legged_sdk" ]; then
  echo "      vendor SDK found: rebuilding hardware backend against it"
  $DRY make -C cpp sdk CXXFLAGS="-O2 -std=c++17 -Wall -pthread \
    -I$HOME/unitree_legged_sdk/include -L$HOME/unitree_legged_sdk/lib"
fi

echo "[2/3] building the controller docker image"
if [ -f deploy_ops/docker/deployment_image.tar ]; then
  $DRY docker load -i deploy_ops/docker/deployment_image.tar
else
  $DRY make -C deploy_ops/docker build ${DRY:+DRY=1}
fi

echo "[3/3] installing autostart hooks (rc.local)"
$DRY sudo cp deploy_ops/autostart/start_bridge.sh /usr/local/bin/
$DRY sudo cp deploy_ops/autostart/start_controller.sh /usr/local/bin/
echo "done. Start manually with:"
echo "  deploy_ops/autostart/start_bridge.sh && deploy_ops/autostart/start_controller.sh"
