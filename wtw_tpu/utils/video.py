"""Offline trajectory rendering.

The reference logs training videos through Isaac Gym camera sensors
(legged_robot.py:1611-1673, mp4 every save_video_interval iterations). There
is no GPU rasterizer on TPU, so the equivalent is RECORD-THEN-RENDER: the
env state trajectory (base pose + joint angles) is recorded on device,
pulled to host, and re-rendered with matplotlib into an mp4/gif — the robot
as its kinematic skeleton + collision spheres over the terrain heightfield.

Exact-state recording is possible here precisely because the env state is
explicit arrays (SURVEY.md §5.4) — the reference cannot do this since PhysX
state is opaque.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Trajectory:
    base_pos: np.ndarray     # (T, 3)
    base_quat: np.ndarray    # (T, 4)
    joint_q: np.ndarray      # (T, nj)


def record_rollout(env, policy_fn, steps: int = 250, seed: int = 0,
                   env_index: int = 0, commands=None) -> Trajectory:
    """Roll a policy and record env `env_index`'s state trajectory."""
    import jax
    import jax.numpy as jnp

    world = env.init_state(jax.random.PRNGKey(seed))
    if commands is not None:
        cmds = jnp.broadcast_to(jnp.asarray(commands),
                                world.env.commands.shape)
        world = world.replace(env=world.env.replace(commands=cmds))
    world, obs = env.get_observations(world)

    def _step(w, o):
        w, o, rew, done, info = env.step(w, policy_fn(o))
        if commands is not None:
            w = w.replace(env=w.env.replace(commands=jnp.broadcast_to(
                jnp.asarray(commands), w.env.commands.shape)))
        return w, o, rew, done, info

    step = jax.jit(_step)
    pos, quat, q = [], [], []
    for _ in range(steps):
        world, obs, rew, done, info = step(world, obs)
        phys = world.env.phys
        pos.append(np.asarray(phys.base_pos[env_index]))
        quat.append(np.asarray(phys.base_quat[env_index]))
        q.append(np.asarray(phys.joint_q[env_index]))
    return Trajectory(np.stack(pos), np.stack(quat), np.stack(q))


def render_trajectory(traj: Trajectory, model, hf=None,
                      path: str = "rollout.mp4", fps: int = 50,
                      stride: int = 2) -> str:
    """Render a recorded trajectory as a side+top view animation. Uses the
    model's FK to draw the leg skeleton. Saves mp4 (ffmpeg) or falls back
    to gif (pillow)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    import jax
    import jax.numpy as jnp
    from ..physics.engine import fk

    fk_j = jax.jit(lambda p, qt, jq: fk(model, p, qt, jq)[0])
    frames = range(0, len(traj.base_pos), stride)
    fig, (ax_side, ax_top) = plt.subplots(2, 1, figsize=(8, 8))

    # terrain profile under the robot's path
    if hf is not None:
        heights = np.asarray(hf.heights)
        origin = np.asarray(hf.origin)
        scale = float(hf.horizontal_scale)

    chains = _leg_chains(model)

    def draw(t):
        ax_side.clear()
        ax_top.clear()
        body_pos = np.asarray(
            fk_j(jnp.asarray(traj.base_pos[t]),
                 jnp.asarray(traj.base_quat[t]),
                 jnp.asarray(traj.joint_q[t])))
        bx, by, bz = traj.base_pos[t]
        if hf is not None:
            xs = np.linspace(bx - 1.5, bx + 1.5, 60)
            iu = np.clip(((xs - origin[0]) / scale).astype(int), 0,
                         heights.shape[0] - 1)
            iv = np.clip(int((by - origin[1]) / scale), 0,
                         heights.shape[1] - 1)
            ax_side.fill_between(xs, -1.0, heights[iu, iv], color="0.8")
        for chain in chains:
            pts = body_pos[chain]
            ax_side.plot(pts[:, 0], pts[:, 2], "o-", lw=2, ms=3)
            ax_top.plot(pts[:, 0], pts[:, 1], "o-", lw=2, ms=3)
        ax_side.plot([bx], [bz], "ks", ms=8)
        ax_top.plot([bx], [by], "ks", ms=8)
        ax_side.set_xlim(bx - 1.5, bx + 1.5)
        ax_side.set_ylim(bz - 0.8, bz + 0.8)
        ax_side.set_ylabel("z [m]")
        ax_top.set_xlim(bx - 1.5, bx + 1.5)
        ax_top.set_ylim(by - 1.0, by + 1.0)
        ax_top.set_ylabel("y [m]")
        ax_side.set_title(f"t = {t * 0.02:.2f} s")

    anim = animation.FuncAnimation(fig, draw, frames=frames, interval=1000
                                   / fps * stride)
    try:
        anim.save(path, writer="ffmpeg", fps=fps // stride)
    except Exception:
        path = path.rsplit(".", 1)[0] + ".gif"
        anim.save(path, writer="pillow", fps=max(fps // stride, 1))
    plt.close(fig)
    return path


def _leg_chains(model):
    """Body-index chains base->hip->thigh->calf per leg from the parent
    table."""
    parent = list(model.parent_static)
    chains = []
    # leaves = bodies that are no one's parent
    children = {p for p in parent[1:]}
    leaves = [i for i in range(len(parent)) if i not in children and i > 0]
    for leaf in leaves:
        chain = [leaf]
        while chain[-1] != 0:
            chain.append(parent[chain[-1]])
        chains.append(list(reversed(chain)))
    return chains
