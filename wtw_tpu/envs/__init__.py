from .legged_env import LeggedEnv, EnvState  # noqa: F401
