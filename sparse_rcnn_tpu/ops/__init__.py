from . import coords, rulebook, sparse_conv, voxelize  # noqa: F401
