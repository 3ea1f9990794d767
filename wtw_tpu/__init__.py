"""wtw_tpu — a TPU-native quadruped locomotion RL framework.

A from-scratch JAX/XLA re-design of the capabilities of
`walk-these-ways` (gait-conditioned Go1/Go2/B1 sim-to-real locomotion):

- ``wtw_tpu.physics``  — vectorized articulated rigid-body engine (replaces
  Isaac Gym / PhysX; reference: go1_gym/envs/base/legged_robot.py's calls
  into `gymapi`).
- ``wtw_tpu.envs``     — one robot-parameterized legged env as a pure
  function (replaces the reference's five copied per-robot packages).
- ``wtw_tpu.terrain``  — procedural heightfield terrains incl. parkour
  (reference: go1_gym/utils/terrain.py, tasks/terrainParkour.py).
- ``wtw_tpu.learn``    — on-device actor-learner: PPO with concurrent
  state-estimation (ppo_cse), CleanRL-style PPO with CaT
  (reference: go1_gym_learn/, algos/).
- ``wtw_tpu.parallel`` — multi-host scaling via jax.sharding Mesh +
  shard_map; envs sharded, learner replicated, grads psum'd.
- ``wtw_tpu.models``   — robot model specs (URDF-derived arrays) and
  neural nets (actor-critic + adaptation module, actuator nets).
- ``wtw_tpu.deploy``   — real-robot deployment over LCM (reference:
  go1_gym_deploy/).

Everything on the training path is pure functions over pytrees: ``vmap``
over the env axis, ``lax.scan`` over time, ``jit`` over rollout+update.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "/tmp/wtw_jax_cache"):
    """Persistent XLA compilation cache: restarts of the same program (e.g.
    exact-resume training sessions, bench re-runs) skip the 1-2 min TPU
    compile. OPT-IN via WTW_COMPILE_CACHE=1: the axon remote-AOT TPU path
    in this image stalls when executable serialization is requested."""
    import os
    if os.environ.get("WTW_COMPILE_CACHE") != "1":
        return
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
