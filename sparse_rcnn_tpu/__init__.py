"""sparse_rcnn_tpu — a TPU-native 3D instance-segmentation framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
``LeonhardFeiner/sparse_rcnn`` reference (see SURVEY.md; the read-only
reference mount was empty at survey time — SURVEY.md §0 — so parity targets
come from BASELINE.json's functional spec).

Pipeline: voxelize → sparse UNet backbone → region proposals → 3D RoI crop
→ per-instance mask + class heads, all with static shapes on device.
"""

from .sparse import SparseTensor, make_sparse_tensor

__version__ = "0.1.0"

__all__ = ["SparseTensor", "make_sparse_tensor", "__version__"]
