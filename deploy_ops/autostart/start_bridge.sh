#!/bin/bash
# Start the 500 Hz motor bridge — the analog of
# go1_gym_deploy/autostart/start_unitree_sdk.sh. Kills a previous instance
# by pidfile (never by pattern), then launches the hardware backend.
set -u
PIDFILE=/tmp/wtw_bridge.pid
BRIDGE="$(dirname "$0")/../../cpp/lcm_position_bridge_sdk"
[ "${1:-}" = "--sim" ] && BRIDGE="$(dirname "$0")/../../cpp/lcm_position_bridge --sim"

if [ -f "$PIDFILE" ]; then
  kill "$(cat "$PIDFILE")" 2>/dev/null || true
  rm -f "$PIDFILE"
fi
$BRIDGE &
echo $! > "$PIDFILE"
echo "bridge running (pid $(cat "$PIDFILE"))"
