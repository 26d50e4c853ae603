from . import maths, rng  # noqa: F401
