from .detector import SparseRCNN, paint_instance_masks  # noqa: F401
from .unet import SparseUNet  # noqa: F401
from .targets import SceneGT, rpn_targets, roi_targets  # noqa: F401
