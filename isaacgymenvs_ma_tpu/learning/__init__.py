from . import configs  # noqa: F401
from .ppo import PPOAgent, PPOConfig, PPOState  # noqa: F401
