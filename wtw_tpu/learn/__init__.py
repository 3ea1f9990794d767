from .ppo_cse import PPOArgs, TrainState, make_train_fns  # noqa: F401
from .runner import Runner, RunnerArgs  # noqa: F401
