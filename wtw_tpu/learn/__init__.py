"""Learners.

Stack A (rsl_rl lineage, go1_gym_learn/):
- ppo_cse  — PPO with concurrent state estimation (the WTW flagship)
- ppo_rma  — RMA teacher/student with an env-factor encoder

Stack B (algos/, CleanRL lineage, CaT float dones):
- cat_ppo      — plain PPO with RunningMeanStd normalizers
- cat_ppo_plus — PPO + Q(s,a) head + zeroth-order action improvement
- cat_ppornn   — recurrent PPO with GRU actor/critic memories
- ddpg_demos   — DDPG expert + demo replay, vision distillation student
"""
from .ppo_cse import PPOArgs, TrainState, make_train_fns  # noqa: F401
from .runner import Runner, RunnerArgs  # noqa: F401
from . import cat_ppo, cat_ppo_plus, cat_ppornn, ppo_rma  # noqa: F401
