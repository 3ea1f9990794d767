#!/usr/bin/env python
"""Plot training curves from a run's metrics.csv.

The offline analog of the reference's ml_dash dashboard + .charts.yml spec
(scripts/go1/train.py:227-253, README.md:153-169):

    python scripts/plot_run.py runs/go1_flat/seed0 [--out curves.png]
"""
import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--keys", nargs="*", default=None,
                    help="columns to plot (default: the charts.yml set)")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = os.path.join(args.run_dir, "metrics.csv")
    rows = list(csv.DictReader(open(path)))
    if not rows:
        print("no data")
        return
    # default chart set mirrors .charts.yml (train.py:227-253)
    keys = args.keys or [k for k in (
        "mean_step_reward", "rew_total", "rew_tracking_lin_vel",
        "rew_tracking_ang_vel", "rew_tracking_contacts_shaped_force",
        "adaptation_loss", "value_loss", "mean_episode_length",
        "steps_per_s") if k in rows[0]]
    its = [float(r["iteration"]) for r in rows]
    n = len(keys)
    cols = 3
    rows_n = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows_n, cols, figsize=(4.5 * cols, 3 * rows_n),
                             squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        ax.plot(its, [float(r[k]) for r in rows])
        ax.set_title(k, fontsize=10)
        ax.grid(alpha=0.3)
    for j in range(n, rows_n * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    out = args.out or os.path.join(args.run_dir, "curves.png")
    fig.savefig(out, dpi=110)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
