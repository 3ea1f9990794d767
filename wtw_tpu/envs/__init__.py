from .legged_env import LeggedEnv, EnvState  # noqa: F401


def make_legged_env(cfg, robot=None, seed: int = 0, axis_name=None,
                    eval_terrain_cfg=None) -> LeggedEnv:
    """Build a LeggedEnv, generating terrain when cfg.terrain.mesh_type is
    'heightfield' (the analog of LeggedRobot.create_sim building Terrain +
    env origins, legged_robot.py:493-515, 1675-1714)."""
    from ..models import load_robot

    if robot is None:
        robot = load_robot(cfg.asset.robot)
    if cfg.terrain.mesh_type == "heightfield":
        from ..terrain import assign_env_origins, build_terrain, to_heightfield
        tm = build_terrain(cfg.terrain, seed=seed, eval_cfg=eval_terrain_cfg)
        origins, levels, types = assign_env_origins(
            tm, cfg.env.num_envs, cfg.terrain, seed=seed)
        return LeggedEnv(cfg, robot, heightfield=to_heightfield(tm),
                         env_origins=origins, axis_name=axis_name)
    return LeggedEnv(cfg, robot, axis_name=axis_name)
