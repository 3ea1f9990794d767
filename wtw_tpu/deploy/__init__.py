"""Real-robot deployment over LCM (go1_gym_deploy/ equivalent).

- lcm_wire: from-scratch LCM wire protocol + UDP multicast pub/sub
- lcm_types: the four deployment message schemas
- state_estimator: telemetry -> policy inputs + RC command mapping
- agent: LCMAgent hardware env (sim-identical obs layout)
- command_profile: scripted / RC command sources
- runner: calibration + dead-man + emergency state machine
- policy: numpy inference from exported .npz weights

The robot-side C++ bridge lives in cpp/ (lcm_position_bridge.cpp), speaking
the same wire protocol at 500 Hz against the motor controller.
"""
from .agent import LCMAgent  # noqa: F401
from .command_profile import (ConstantAccelerationProfile,  # noqa: F401
                              ConstantVelocityProfile, RCControllerProfile)
from .lcm_types import (leg_control_data_lcmt,  # noqa: F401
                        pd_tau_targets_lcmt, rc_command_lcmt,
                        state_estimator_lcmt)
from .lcm_wire import LCM  # noqa: F401
from .policy import DeployedPolicy  # noqa: F401
from .runner import DeploymentRunner  # noqa: F401
from .state_estimator import StateEstimator  # noqa: F401
