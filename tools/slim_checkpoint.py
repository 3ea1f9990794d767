#!/usr/bin/env python
"""Convert a full exact-resume checkpoint into a slim, version-controllable
one.

Full Stack-A checkpoints (runner.save) carry the 4096-env world state
(~138 MB) for bitwise resume. runs/ does not survive between build rounds,
so long trainings that must continue across rounds need a checkpoint small
enough to commit: learner TrainState (params + optimizer states + RNG +
iteration), curriculum weights, the reward-anneal clock (common_step), and
the env config. Envs restart fresh on resume; the learning trajectory
continues (the reference's resume has the same semantics — it restores
weights + curriculum only, ppo_cse/__init__.py:76-91).

    python tools/slim_checkpoint.py runs/go1_mob_r2b/checkpoints/state_last.pkl \
        checkpoints/go1_mob/state_slim.pkl.gz
"""
import argparse
import gzip
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("full", help="full state_*.pkl written by runner.save")
    ap.add_argument("slim", help="output path (.pkl.gz)")
    args = ap.parse_args()

    with open(args.full, "rb") as f:
        blob = pickle.load(f)
    world = blob["world"]
    if "obs_n" in blob:
        # Stack B (train_parkour): keep the CaT state + per-env curriculum
        # levels beside the learner state
        slim = {
            "slim": True,
            "stack": "b",
            "ts": blob["ts"],
            "terrain_level": world.env.terrain_level,
            "terrain_type": world.env.terrain_type,
            "cat": world.cat,
            "soft_p_progress": world.soft_p_progress,
            "common_step": world.common_step,
            "iteration": blob.get("iteration", 0),
        }
    else:
        slim = {
            "slim": True,
            "ts": blob["ts"],
            "curriculum": world.curriculum,
            "common_step": world.common_step,
            "cfg": blob.get("cfg"),
        }
    with gzip.open(args.slim, "wb", compresslevel=6) as f:
        pickle.dump(slim, f)
    mb = os.path.getsize(args.slim) / 1e6
    it = int(blob.get("iteration", 0) or getattr(blob["ts"], "iteration", 0))
    print(f"{args.slim}: {mb:.1f} MB (from "
          f"{os.path.getsize(args.full) / 1e6:.1f} MB), iteration {it}")


if __name__ == "__main__":
    main()
