from . import model  # noqa: F401
from .model import ModelBuilder, SceneModel  # noqa: F401
from .mjcf import load_mjcf  # noqa: F401
from .urdf import load_urdf  # noqa: F401
