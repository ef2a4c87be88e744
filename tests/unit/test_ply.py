import numpy as np

from sparse_rcnn_tpu.data.ply import read_ply, vertices_xyz_rgb


def write_binary_ply(path, xyz, rgb, label=None):
    n = len(xyz)
    props = ["property float x", "property float y", "property float z",
             "property uchar red", "property uchar green", "property uchar blue"]
    dt = [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
          ("red", "u1"), ("green", "u1"), ("blue", "u1")]
    if label is not None:
        props.append("property ushort label")
        dt.append(("label", "<u2"))
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n" + "\n".join(props) + "\nend_header\n")
    arr = np.zeros(n, dtype=dt)
    arr["x"], arr["y"], arr["z"] = xyz.T
    arr["red"], arr["green"], arr["blue"] = rgb.T
    if label is not None:
        arr["label"] = label
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(arr.tobytes())


def test_read_binary_ply(tmp_path, rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    label = rng.integers(0, 40, 50).astype(np.uint16)
    p = tmp_path / "scene.ply"
    write_binary_ply(str(p), xyz, rgb, label)
    props = read_ply(str(p))
    np.testing.assert_allclose(props["x"], xyz[:, 0])
    np.testing.assert_array_equal(props["label"], label)
    pts, colors = vertices_xyz_rgb(props)
    np.testing.assert_allclose(pts, xyz)
    assert colors.min() >= -1.0 and colors.max() <= 1.0


def test_read_ascii_ply(tmp_path):
    content = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
end_header
0.0 1.0 2.0
3.5 4.5 5.5
-1 -2 -3
"""
    p = tmp_path / "a.ply"
    p.write_text(content)
    props = read_ply(str(p))
    np.testing.assert_allclose(props["x"], [0.0, 3.5, -1.0])
    np.testing.assert_allclose(props["z"], [2.0, 5.5, -3.0])
