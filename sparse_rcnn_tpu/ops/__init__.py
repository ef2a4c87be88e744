from . import coords, hierarchy, nms, pooling, roi, rulebook, sparse_conv, voxelize  # noqa: F401
