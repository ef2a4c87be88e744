"""Capacity/extent sizing tool (scripts/size_capacities.py).

Static shapes price every backbone sort/gather at the configured CAPACITY,
not the live site count; the tool measures per-scale occupancy over real
Loader batches and suggests tightened ``backbone.capacities`` (BASELINE.md
round-4 occupancy table: default decay left coarse scales ~4x oversized).
This drill runs the CLI in-process on a tiny synthetic config and checks
the report's invariants.
"""

import json
import sys

sys.path.insert(0, ".")


def _report(monkeypatch, capsys, args):
    from scripts import size_capacities as SC

    monkeypatch.setattr(sys, "argv", ["size_capacities.py", *args])
    SC.main()
    cap = capsys.readouterr()
    return json.loads(cap.out), cap.err


TINY = [
    "--set", "data.dataset=synthetic",
    "--set", "data.num_points=2048",
    "--set", "data.voxel_capacity=2048",
    "--set", "data.batch_size=2",
    "--set", "data.voxel_size=[0.1,0.1,0.1]",
    "--set", "model.backbone.widths=[8,16,24]",
]


def test_sizing_report(tmp_path, monkeypatch, capsys):
    rep, _ = _report(monkeypatch, capsys,
                     ["--config", "configs/config1_tiny_5cm.yaml",
                      *TINY, "--scenes", "3", "--margin", "1.25"])
    assert rep["scenes"] == 3
    assert len(rep["scales"]) == 3
    caps, prev_sites = [], None
    for row in rep["scales"]:
        # occupancy is consistent and suggestions respect the 128 quantum
        assert 0 < row["max_sites"] <= row["cap"]
        assert row["suggested"] % 128 == 0
        assert row["occupancy"] == round(row["max_sites"] / row["cap"], 3)
        caps.append(row["suggested"])
        # site counts shrink monotonically with scale (downsampling)
        if prev_sites is not None:
            assert row["max_sites"] <= prev_sites
        prev_sites = row["max_sites"]
    # scale 0 must keep the full voxel capacity (it holds every voxel)
    assert caps[0] == rep["scales"][0]["cap"]
    # suggested caps cover the measured maxima with the margin applied
    for row in rep["scales"][1:]:
        assert row["suggested"] >= row["max_sites"]
    # span report: 3 axes, positive, extent suggestion rounded to the
    # 2^(num_scales-1) divisibility the dense tail needs
    assert len(rep["max_span_cells"]) == 3
    down = 1 << 2
    for lo, span in zip(rep["suggested_extent_lower_bound"],
                        rep["max_span_cells"]):
        assert lo % down == 0 and lo >= span > 0
    assert rep["voxel_overflow"] == 0 and rep["hierarchy_overflow"] == 0


def test_sizing_saturation_flag(monkeypatch, capsys):
    """A scale whose measured max hits its cap must be flagged saturated
    (rows were dropped; the suggestion is only a lower bound)."""
    rep, err = _report(monkeypatch, capsys,
                       ["--config", "configs/config1_tiny_5cm.yaml", *TINY,
                        "--set", "model.backbone.capacities=[2048,128,128]",
                        "--scenes", "2"])
    assert any(r["saturated"] for r in rep["scales"][1:])
    assert "saturated" in err
