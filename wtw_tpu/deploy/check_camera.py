"""Camera stream sanity check.

The analog of go1_gym_deploy/tests/check_camera_msgs.py: subscribe to the
five onboard camera channels and report message rates and sizes.

    python -m wtw_tpu.deploy.check_camera [--seconds 5]
"""
from __future__ import annotations

import argparse
import collections
import time

from .lcm_wire import LCM

CHANNELS = [
    "camera_image_front", "camera_image_bottom", "camera_image_left",
    "camera_image_right", "camera_image_rear",
    "rect_image_front", "rect_image_bottom", "rect_image_left",
    "rect_image_right", "rect_image_rear",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--addr", default="239.255.76.67")
    ap.add_argument("--port", type=int, default=7667)
    args = ap.parse_args()

    lc = LCM(addr=(args.addr, args.port))
    counts = collections.Counter()
    sizes = {}

    def handler(channel, data):
        counts[channel] += 1
        sizes[channel] = len(data)

    for ch in CHANNELS:
        lc.subscribe(ch, handler)

    t_end = time.time() + args.seconds
    while time.time() < t_end:
        lc.handle_once(0.1)
    lc.stop()
    if not counts:
        print("no camera messages received")
        return
    for ch in CHANNELS:
        if counts[ch]:
            print(f"{ch}: {counts[ch] / args.seconds:.1f} Hz, "
                  f"{sizes[ch]} bytes/msg")


if __name__ == "__main__":
    main()
