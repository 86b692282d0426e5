"""Native C++ IO runtime tests: builds the library and checks equivalence
with the pure-python readers."""
import numpy as np
import pytest

from egogaussian_tpu.utils import native_io


@pytest.fixture(scope="module")
def built():
    ok = native_io.build_native()
    if not ok or native_io.load_native() is None:
        pytest.skip("native toolchain unavailable")
    return True


def test_ply_roundtrip_native(built, tmp_path):
    names = ["x", "y", "z", "opacity"]
    cols = np.random.RandomState(0).randn(100, 4).astype(np.float32)
    path = str(tmp_path / "t.ply")
    assert native_io.write_ply_native(path, names, cols)
    props, n = native_io.read_ply_native(path)
    assert n == 100
    for i, name in enumerate(names):
        np.testing.assert_allclose(props[name], cols[:, i])


def test_ply_native_matches_python(built, tmp_path):
    from egogaussian_tpu.utils.ply import read_ply, write_ply

    names = [f"p{i}" for i in range(6)]
    cols = np.random.RandomState(1).randn(50, 6).astype(np.float32)
    path = str(tmp_path / "t2.ply")
    write_ply(path, names, cols)  # goes through native when built
    props, n = read_ply(path)
    assert n == 50
    np.testing.assert_allclose(props["p3"], cols[:, 3])


def test_colmap_points3d_native_matches_python(built, tmp_path):
    from tests.test_data import write_fake_colmap_bin
    from egogaussian_tpu.data.colmap import read_points3d_binary

    sparse = write_fake_colmap_bin(tmp_path)
    path = str(sparse / "points3D.bin")
    xyz_n, rgb_n, err_n = native_io.read_points3d_bin_native(path)
    xyz_p, rgb_p, err_p = read_points3d_binary(path)  # native-first; same
    np.testing.assert_allclose(xyz_n, xyz_p)
    np.testing.assert_allclose(rgb_n, rgb_p)
    # explicit expectations from the fixture
    np.testing.assert_allclose(xyz_n[2], [2, 4, 6])


def test_colmap_images_native(built, tmp_path):
    from tests.test_data import write_fake_colmap_bin

    sparse = write_fake_colmap_bin(tmp_path)
    ids, qvecs, tvecs, cam_ids, names = native_io.read_images_bin_native(
        str(sparse / "images.bin")
    )
    assert list(ids) == [1, 2]
    assert names == ["000001.jpg", "000002.jpg"]
    np.testing.assert_allclose(tvecs[1], [0.1, 0, 2.0])
    assert list(cam_ids) == [1, 1]
