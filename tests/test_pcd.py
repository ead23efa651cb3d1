"""PCD format-parity tests (reference loads any format via Open3D,
util/file.py:156-167; we ship self-contained ascii/binary/binary_compressed
readers)."""

import numpy as np

from smart_tree_tpu.data.file import _lzf_decompress, load_cloud, load_pcd_cloud


def _lzf_compress_literals(data: bytes) -> bytes:
    """Valid LZF stream using literal runs only (decompressor exercise)."""
    out = bytearray()
    for i in range(0, len(data), 32):
        chunk = data[i : i + 32]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _header(n, fields="x y z", size="4 4 4", type_="F F F", count="1 1 1",
            mode="binary"):
    return (
        f"# .PCD v0.7\nVERSION 0.7\nFIELDS {fields}\nSIZE {size}\n"
        f"TYPE {type_}\nCOUNT {count}\nWIDTH {n}\nHEIGHT 1\n"
        f"VIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA {mode}\n"
    ).encode()


def test_lzf_backref_roundtrip():
    # literal "abc" + backref (offset 2 -> ref 0, length field 4 -> 6 bytes)
    stream = bytes([0x02]) + b"abc" + bytes([0x80, 0x02])
    assert _lzf_decompress(stream, 9) == b"abcabcabc"


def test_pcd_binary(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    p = tmp_path / "c.pcd"
    with open(p, "wb") as f:
        f.write(_header(50))
        f.write(xyz.astype("<f4").tobytes())
    c = load_pcd_cloud(p)
    np.testing.assert_allclose(np.asarray(c.xyz), xyz, atol=1e-6)


def test_pcd_ascii_with_packed_rgb(tmp_path):
    xyz = np.asarray([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]], np.float32)
    packed = np.asarray([(255 << 16) | (128 << 8) | 1, (1 << 16) | (2 << 8) | 3],
                        np.uint32).view(np.float32)
    p = tmp_path / "c.pcd"
    with open(p, "wb") as f:
        f.write(_header(2, fields="x y z rgb", size="4 4 4 4",
                        type_="F F F F", count="1 1 1 1", mode="ascii"))
        for row, pk in zip(xyz, packed):
            f.write(f"{row[0]} {row[1]} {row[2]} {float(pk)!r}\n".encode())
    c = load_cloud(p)
    np.testing.assert_allclose(np.asarray(c.xyz), xyz, atol=1e-5)
    rgb = np.asarray(c.rgb)
    np.testing.assert_allclose(rgb[0], [255 / 255, 128 / 255, 1 / 255], atol=1e-6)


def test_pcd_binary_compressed(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(33, 3)).astype("<f4")
    soa = b"".join(xyz[:, i].tobytes() for i in range(3))
    comp = _lzf_compress_literals(soa)
    p = tmp_path / "c.pcd"
    with open(p, "wb") as f:
        f.write(_header(33, mode="binary_compressed"))
        f.write(np.asarray([len(comp), len(soa)], "<u4").tobytes())
        f.write(comp)
    c = load_pcd_cloud(p)
    np.testing.assert_allclose(np.asarray(c.xyz), xyz, atol=1e-6)


def test_pcd_nan_rows_dropped(tmp_path):
    xyz = np.asarray([[0, 0, 0], [np.nan, 0, 0], [1, 1, 1]], "<f4")
    p = tmp_path / "c.pcd"
    with open(p, "wb") as f:
        f.write(_header(3))
        f.write(xyz.tobytes())
    c = load_pcd_cloud(p)
    assert len(c.xyz) == 2


def test_xyz_pts_obj_loaders(tmp_path):
    """Text formats the reference reads via Open3D (util/file.py:156-167)."""
    from smart_tree_tpu.data.file import load_obj_cloud, load_xyz_cloud

    xyz = np.asarray([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]], np.float32)
    rgb255 = np.asarray([[255, 0, 0], [0, 128, 255]], np.float32)

    p = tmp_path / "c.xyz"
    np.savetxt(p, np.hstack([xyz, rgb255]))
    c = load_cloud(p)
    np.testing.assert_allclose(np.asarray(c.xyz), xyz, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.rgb), rgb255 / 255.0, atol=1e-6)

    # .pts with a leading count line and an intensity column
    p = tmp_path / "c.pts"
    with open(p, "w") as f:
        f.write("2\n")
        for row, col in zip(xyz, rgb255):
            f.write(" ".join(map(str, row)) + " 0.7 "
                    + " ".join(map(str, col)) + "\n")
    c = load_cloud(p)
    np.testing.assert_allclose(np.asarray(c.xyz), xyz, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.rgb), rgb255 / 255.0, atol=1e-6)

    # .obj vertices with per-vertex colors, plus faces/normals to skip
    p = tmp_path / "c.obj"
    with open(p, "w") as f:
        f.write("# comment\nvn 0 1 0\n")
        for row, col in zip(xyz, rgb255 / 255.0):
            f.write("v " + " ".join(map(str, row)) + " "
                    + " ".join(map(str, col)) + "\n")
        f.write("f 1 2 1\n")
    c = load_obj_cloud(p)
    np.testing.assert_allclose(np.asarray(c.xyz), xyz, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.rgb), rgb255 / 255.0, atol=1e-6)

    # bare xyz (no color) -> zero rgb, reference file.py:161-166
    p = tmp_path / "bare.xyz"
    np.savetxt(p, xyz)
    c = load_cloud(p)
    assert np.all(np.asarray(c.rgb) == 0)
