#!/bin/bash
# Start the detached 50 Hz policy controller container — the analog of
# go1_gym_deploy/autostart/start_controller.sh.
set -u
cd "$(dirname "$0")/../docker"
make autostart "$@"
