"""Training driver.

The host-side analog of go1_gym_learn/ppo_cse/__init__.py Runner:107-296 —
but the entire iteration (rollout + GAE + PPO update + curriculum) is ONE
jitted call; the host only logs, checkpoints, and paces. Checkpoints are
exact-resume: params, optimizer state, env state arrays, RNG keys, and
curriculum weights all serialize (impossible in the reference, where PhysX
state is opaque — SURVEY.md §5.4).
"""
from __future__ import annotations

import csv
import os
import pickle
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import ppo_cse
from ..models import actor_critic as ac


@dataclass
class RunnerArgs:
    # ppo_cse/__init__.py:43-59
    save_video_interval: int = 0          # video: offline re-render (round 2)
    log_freq: int = 10
    save_interval: int = 400
    run_dir: str = "runs/default"
    resume: bool = False
    resume_path: Optional[str] = None
    # live observability: TensorBoard event files under <run_dir>/tb — the
    # analog of the reference's ml_dash dashboard (ppo_cse/__init__.py:108-229)
    tensorboard: bool = True
    # jax.profiler trace of iterations [profile_start, profile_start+
    # profile_iters) into <run_dir>/profile (SURVEY.md §5.1; the reference
    # has no profiling hooks)
    profile_start: int = -1
    profile_iters: int = 3
    console_table_freq: int = 0           # texttable-style monitor


class Runner:
    def __init__(self, env, args: ppo_cse.PPOArgs = ppo_cse.PPOArgs(),
                 ac_args: ac.ACArgs = ac.ACArgs(),
                 runner_args: RunnerArgs = RunnerArgs(),
                 seed: int = 0):
        self.env = env
        self.args = args
        self.ac_args = ac_args
        self.runner_args = runner_args

        key = jax.random.PRNGKey(seed)
        k_env, k_train = jax.random.split(key)
        self.world = env.init_state(k_env)
        self.world, self.obs_dict = env.get_observations(self.world)
        self.ts = ppo_cse.init_train_state(k_train, env, args, ac_args)
        # donate the carried state: the iteration rewrites ts/world/obs in
        # place on device instead of allocating fresh buffers each call
        # (the (T,N,2100) rollout + env state are the largest live arrays)
        self._iteration_fn = jax.jit(
            ppo_cse.make_train_fns(env, args, ac_args),
            donate_argnums=(0,))

        os.makedirs(runner_args.run_dir, exist_ok=True)
        os.makedirs(os.path.join(runner_args.run_dir, "checkpoints"),
                    exist_ok=True)
        self._csv_path = os.path.join(runner_args.run_dir, "metrics.csv")
        self._csv_keys = None
        self._tb = None
        if runner_args.tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    os.path.join(runner_args.run_dir, "tb"))
                # Canned dashboard layout (TB "Custom Scalars" tab) — the
                # analog of the reference's .charts.yml chart spec consumed
                # by ml_dash (scripts/go1/train.py:227-253): the standard
                # WTW training dashboard, one chart per headline metric.
                self._tb.add_custom_scalars({
                    "training": {
                        "episode reward": ["Multiline", ["rew_total"]],
                        "tracking": ["Multiline", [
                            "rew_tracking_lin_vel", "rew_tracking_ang_vel"]],
                        "gait shaping": ["Multiline", [
                            "rew_tracking_contacts_shaped_force",
                            "rew_tracking_contacts_shaped_vel",
                            "rew_orientation_control"]],
                        "smoothness": ["Multiline", [
                            "rew_action_smoothness_1",
                            "rew_action_smoothness_2", "rew_dof_pos"]],
                        "adaptation loss": ["Multiline", ["adaptation_loss"]],
                    },
                    "optimization": {
                        "losses": ["Multiline", ["value_loss",
                                                 "surrogate_loss"]],
                        "kl / lr": ["Multiline", ["kl_mean", "lr"]],
                        "throughput": ["Multiline", ["steps_per_s"]],
                    },
                    "eval": {
                        "train vs eval reward": ["Multiline", [
                            "rew_total", "eval_rew_total"]],
                    },
                })
            except Exception:
                pass                       # torch/tensorboard absent: CSV only
        self._it_offset = 0
        if runner_args.resume and runner_args.resume_path:
            self.load(runner_args.resume_path)

    # ------------------------------------------------------------------
    def learn(self, num_learning_iterations: int, log_fn=print):
        """ppo_cse/__init__.py:107-229 analog."""
        ra = self.runner_args
        t_start = time.time()
        steps_per_iter = self.args.num_steps_per_env * self.env.num_envs
        it0 = int(jax.device_get(self.ts.iteration))  # resume-aware numbering
        last_log_it, last_log_t = it0 - 1, t_start
        for it in range(it0, it0 + num_learning_iterations):
            t0 = time.time()
            if it == ra.profile_start:
                jax.profiler.start_trace(
                    os.path.join(ra.run_dir, "profile"))
            self.ts, self.world, self.obs_dict, stats = self._iteration_fn(
                self.ts, self.world, self.obs_dict)
            if ra.profile_start >= 0 and \
                    it == ra.profile_start + ra.profile_iters - 1:
                jax.block_until_ready(stats["loss"])
                jax.profiler.stop_trace()
                log_fn(f"profiler trace -> {ra.run_dir}/profile")
            if (it % ra.log_freq == 0) or \
                    it == it0 + num_learning_iterations - 1:
                stats = jax.device_get(stats)
                # rate over the whole span since the last log (iterations
                # dispatch asynchronously; the log step alone absorbs the
                # device_get sync and would read misleadingly slow)
                now = time.time()
                span = max(it - last_log_it, 1)
                dt_iter = (now - last_log_t) / span
                last_log_it, last_log_t = it, now
                row = {
                    "iteration": it,
                    "steps_per_s": steps_per_iter / dt_iter,
                    "total_env_steps": (it + 1) * steps_per_iter,
                    "wall_s": time.time() - t_start,
                    "mean_step_reward": float(stats["mean_step_reward"]),
                    "num_episodes": float(stats["num_episodes"]),
                    "value_loss": float(stats["value_loss"]),
                    "surrogate_loss": float(stats["surrogate_loss"]),
                    "adaptation_loss": float(stats["adaptation_loss"]),
                    "kl_mean": float(stats["kl_mean"]),
                    "lr": float(stats["lr"]),
                }
                ep = np.asarray(stats["episode_reward_sums"])
                for i, name in enumerate(self.env.reward_names):
                    row[f"rew_{name}"] = float(ep[i])
                row["rew_total"] = float(ep[-1])
                # eval/episode/* stream (ppo_cse/__init__.py:163-180)
                if getattr(self.env, "num_eval_envs", 0) > 0 and \
                        "eval_episode_reward_sums" in stats:
                    epe = np.asarray(stats["eval_episode_reward_sums"])
                    row["eval_rew_total"] = float(epe[-1])
                    row["eval_num_episodes"] = float(
                        stats["eval_num_episodes"])
                self._write_csv(row)
                if self._tb is not None:
                    for k, v in row.items():
                        if k != "iteration":
                            self._tb.add_scalar(k, v, it)
                    self._tb.flush()
                log_fn(f"it {it:6d} | {row['steps_per_s']:.0f} steps/s | "
                       f"rew {row['mean_step_reward']:.4f} | "
                       f"ep_rew {row['rew_total']:.2f} | "
                       f"vloss {row['value_loss']:.4f} | "
                       f"adapt {row['adaptation_loss']:.5f}")
                if ra.console_table_freq and it % ra.console_table_freq == 0:
                    from ..utils.monitor import monitor_table
                    log_fn(monitor_table(
                        {k: v for k, v in row.items()
                         if k.startswith("rew_")}, title=f"iter {it}"))
            if ra.save_interval and it % ra.save_interval == 0 and it > 0:
                self.save(it)
            if ra.save_video_interval and it % ra.save_video_interval == 0 \
                    and it > 0:
                self.record_video(tag=it)
        self.save("last")
        return self

    # ------------------------------------------------------------------
    def _write_csv(self, row):
        # only write the header once per FILE (resume chunks append)
        new = self._csv_keys is None and not (
            os.path.exists(self._csv_path)
            and os.path.getsize(self._csv_path) > 0)
        if self._csv_keys is None:
            if not new:
                # appending to an existing file: adopt ITS header so rows
                # stay aligned even if the metric set changed between
                # resume chunks (extrasaction='ignore' drops extras;
                # keys absent from the new rows fill as empty cells)
                with open(self._csv_path, newline="") as f:
                    self._csv_keys = next(csv.reader(f))
            else:
                self._csv_keys = list(row.keys())
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_keys,
                               extrasaction="ignore")
            if new:
                w.writeheader()
            w.writerow(row)

    def save(self, tag):
        """Exact-resume checkpoint + deployment export
        (ppo_cse/__init__.py:231-274 analog)."""
        path = os.path.join(self.runner_args.run_dir, "checkpoints",
                            f"state_{tag}.pkl")
        blob = {
            "ts": jax.device_get(self.ts),
            "world": jax.device_get(self.world),
            "obs_dict": jax.device_get(self.obs_dict),
            # env config, so eval tools (scripts/play.py) can rebuild an
            # obs-compatible env without the user re-specifying the preset
            "cfg": getattr(self.env, "cfg", None),
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        # deployment export: flat npz of policy weights (consumed by
        # wtw_tpu/deploy; replaces the TorchScript .jit exports)
        export = {}
        p = jax.device_get(self.ts.params)
        for net in ("adaptation", "actor"):
            for i, lyr in enumerate(p[net]):
                export[f"{net}/w{i}"] = np.asarray(lyr["w"])
                export[f"{net}/b{i}"] = np.asarray(lyr["b"])
        np.savez(os.path.join(self.runner_args.run_dir, "checkpoints",
                              f"policy_{tag}.npz"), **export)
        return path

    def load(self, path):
        opener = __import__("gzip").open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            blob = pickle.load(f)
        to_dev = lambda t: jax.tree.map(jnp.asarray, t)
        ts = blob["ts"]
        # migration: pre-round-3 checkpoints hold adaptation-optimizer
        # moments for the FULL param tree; the optimizer now scopes to the
        # adaptation subtree (matching the reference's separate Adam,
        # ppo_cse/ppo.py:60-63) — strip the zero actor/critic moments
        ts = ts.replace(adapt_opt_state=jax.tree.map(
            lambda s: (s["adaptation"]
                       if isinstance(s, dict) and "adaptation" in s else s),
            ts.adapt_opt_state,
            is_leaf=lambda s: isinstance(s, dict) and "adaptation" in s))
        self.ts = to_dev(ts)
        if blob.get("slim"):
            # slim checkpoint (tools/slim_checkpoint.py): learner state +
            # curriculum weights + anneal clock only — env arrays are NOT
            # carried (they don't fit version control; runs/ is wiped
            # between build rounds). Envs restart fresh; training state,
            # command curriculum, and reward anneal continue exactly.
            self.world = self.world.replace(
                curriculum=to_dev(blob["curriculum"]),
                common_step=jnp.asarray(blob["common_step"]))
            self.world, self.obs_dict = self.env.get_observations(self.world)
        else:
            self.world = to_dev(blob["world"])
            self.obs_dict = to_dev(blob["obs_dict"])
        return self

    # ------------------------------------------------------------------
    def record_video(self, tag="last", steps: int = 250):
        """Record + offline-render a rollout of the current policy
        (the analog of the reference's camera mp4s every
        save_video_interval; legged_robot.py:1611-1673,
        ppo_cse/__init__.py:277-296)."""
        from ..utils.video import record_rollout, render_trajectory
        policy = self.get_inference_policy()
        traj = record_rollout(
            self.env, lambda obs: policy(obs["obs_history"]), steps=steps)
        path = os.path.join(self.runner_args.run_dir, f"video_{tag}.mp4")
        return render_trajectory(traj, self.env.model, hf=self.env.hf,
                                 path=path)

    # ------------------------------------------------------------------
    def get_inference_policy(self):
        """Student policy fn(obs_history) -> actions
        (ppo_cse/__init__.py:298 analog)."""
        params = self.ts.params

        @jax.jit
        def policy(obs_history):
            mean, _ = ac.act_student(params, obs_history, self.ac_args)
            return mean

        return policy
