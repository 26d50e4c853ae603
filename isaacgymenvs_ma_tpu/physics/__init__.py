from .engine import Control, PhysicsEngine, SimOutput, SimParams, SimState  # noqa: F401
