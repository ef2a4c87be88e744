from . import synthetic  # noqa: F401
from .gt import build_scene_gt  # noqa: F401
