from . import configs  # noqa: F401
from .ppo import PPOAgent, PPOConfig, PPOState  # noqa: F401
from .amp import AMPAgent  # noqa: F401
from .motion_lib import MotionLib  # noqa: F401
