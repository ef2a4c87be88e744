"""Config cross-field validation + per-dataset extent sizing (SURVEY.md C23)."""

import pytest

from sparse_rcnn_tpu.config import derive_grid_extent, load_config

BB5 = {"widths": [32, 64, 96, 128, 160]}
RPN01 = {"rpn_scales": [0, 1]}


def _cfg(data=None, backbone=None, rpn=None):
    return load_config(overrides={
        "data": {"voxel_size": [0.02] * 3, **(data or {})},
        "model": {"backbone": {**BB5, **(backbone or {})},
                  "rpn": {**RPN01, **(rpn or {})}},
    })


def test_extent_derived_from_scene_bounds():
    cfg = _cfg(data={"scene_bounds": [10.0, 10.0, 3.2]},
               backbone={"dense_from_scale": 2})
    ext = cfg.model.backbone.grid_extent
    assert ext is not None
    down = 1 << 4
    for e, bound in zip(ext, (10.0, 10.0, 3.2)):
        assert e % down == 0
        assert e * 0.02 >= bound          # covers the bounds
    # z margin (1.1x, no rotation growth) is tighter than xy (1.3x rotation)
    assert ext[2] / (3.2 / 0.02) < ext[0] / (10.0 / 0.02)
    # pure function is also callable directly
    assert derive_grid_extent(cfg) == ext


def test_extent_coverage_validated_when_explicit():
    with pytest.raises(ValueError, match="undersized"):
        _cfg(data={"scene_bounds": [10.0, 10.0, 3.3]},
             backbone={"dense_from_scale": 2, "grid_extent": [512, 512, 160]})
    # exactly covering passes
    cfg = _cfg(data={"scene_bounds": [10.0, 10.0, 3.2]},
               backbone={"dense_from_scale": 2, "grid_extent": [512, 512, 160]})
    # (Optional[...] fields keep the YAML list type — compare by value)
    assert tuple(cfg.model.backbone.grid_extent) == (512, 512, 160)


def test_per_mode_dense_from_scale_validation():
    # train form alone is rejected (eval form must be declared)
    with pytest.raises(ValueError, match="dense_from_scale"):
        _cfg(backbone={"dense_from_scale_train": 3,
                       "grid_extent": [512, 512, 256]})
    # pooling downsample cannot convert across the boundary
    with pytest.raises(ValueError, match="downsample"):
        _cfg(backbone={"dense_from_scale": 2, "dense_from_scale_train": 3,
                       "grid_extent": [512, 512, 256],
                       "downsample": "maxpool"})
    # RPN bound binds on the MINIMUM of the two forms
    with pytest.raises(ValueError, match="RPN"):
        _cfg(backbone={"dense_from_scale": 1, "dense_from_scale_train": 3,
                       "grid_extent": [512, 512, 256]},
             rpn={"rpn_scales": [0, 2]})
    cfg = _cfg(backbone={"dense_from_scale": 2, "dense_from_scale_train": 3,
                         "grid_extent": [512, 512, 256]})
    assert cfg.model.backbone.dense_from_scale_train == 3


def test_capacities_validation():
    # happy path: explicit caps flow through scale_capacities verbatim
    cfg = _cfg(data={"voxel_capacity": 262144},
               backbone={"capacities": [262144, 190208, 48384, 11776, 2944]})
    assert cfg.scale_capacities() == (262144, 190208, 48384, 11776, 2944)
    # wrong length
    with pytest.raises(ValueError, match="entries for"):
        _cfg(data={"voxel_capacity": 262144},
             backbone={"capacities": [262144, 128]})
    # caps[0] must equal voxel_capacity (scale-0 rows come from voxelize)
    with pytest.raises(ValueError, match="voxel_capacity"):
        _cfg(data={"voxel_capacity": 262144},
             backbone={"capacities": [131072, 65536, 32768, 16384, 8192]})
    # non-multiple-of-128
    with pytest.raises(ValueError, match="multiple of 128"):
        _cfg(data={"voxel_capacity": 262144},
             backbone={"capacities": [262144, 100000, 48384, 11776, 2944]})
    # None still uses the capacity_factor decay
    cfg = _cfg(data={"voxel_capacity": 8192})
    assert cfg.scale_capacities()[0] == 8192
    assert all(c % 128 == 0 for c in cfg.scale_capacities())
