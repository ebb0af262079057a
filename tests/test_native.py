"""Native host runtime (native/xr_host.cpp) vs pure-Python parity."""

import numpy as np
import pytest

from xrslam_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def test_png_load_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for mode, arr in [
        ("L", rng.integers(0, 256, (37, 53)).astype(np.uint8)),
        ("RGB", rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)),
    ]:
        p = str(tmp_path / f"t_{mode}.png")
        Image.fromarray(arr, mode=mode).save(p)
        out = native.png_load_gray(p)
        assert out is not None and out.dtype == np.float32
        if mode == "L":
            ref = arr.astype(np.float32) / 255.0
            assert np.allclose(out, ref, atol=1e-6)
        else:
            ref = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                   + 0.114 * arr[..., 2]) / 255.0
            assert np.abs(out - ref).max() < 2e-3  # PIL rounds differently
        assert out.shape == arr.shape[:2]


def test_png_16bit(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 65536, (20, 22)).astype(np.uint16)
    p = str(tmp_path / "t16.png")
    Image.fromarray(arr, mode="I;16").save(p)
    out = native.png_load_gray(p)
    if out is None:
        pytest.skip("PIL wrote a variant the decoder rejects")
    assert np.allclose(out, arr.astype(np.float32) / 65535.0, atol=1e-6)


def test_remap_matches_python():
    from xrslam_tpu.io.dataset import UndistortMap

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    remap = UndistortMap(K, np.array([-0.2, 0.05, 1e-3, -1e-3]), 64, 48)
    nat = native.remap_bilinear(img, remap.src_u, remap.src_v)
    assert nat is not None

    # pure-python path
    import xrslam_tpu.native as nmod
    saved = nmod._lib
    try:
        nmod._lib = None
        nmod._tried = True
        py = remap(img)
    finally:
        nmod._lib = saved
    assert np.allclose(nat, py, atol=1e-5)


def test_csv_loaders(tmp_path):
    imu = tmp_path / "imu.csv"
    imu.write_text("#timestamp [ns],w,w,w,a,a,a\n"
                   "1000000000,0.1,0.2,0.3,1,2,3\n"
                   "1005000000,0.4,0.5,0.6,4,5,6\n")
    t, w, a = native.imu_csv_load(str(imu))
    assert np.allclose(t, [1.0, 1.005])
    assert np.allclose(w[1], [0.4, 0.5, 0.6])
    assert np.allclose(a[0], [1, 2, 3])

    cam = tmp_path / "cam.csv"
    cam.write_text("#timestamp [ns],filename\n"
                   "2000000000,img_a.png\n2100000000,img_b.png\n")
    items = native.cam_csv_load(str(cam))
    assert items == [(2.0, "img_a.png"), (2.1, "img_b.png")]


def test_fuse_imu_interpolates():
    tg = np.array([0.0, 0.01, 0.02, 0.03])
    wg = np.stack([np.array([i, 0.0, 0.0]) for i in range(4)])
    ta = np.array([-0.01, 0.005, 0.015, 0.02, 0.05])
    aa = np.tile(np.array([[0.0, 0.0, 9.8]]), (5, 1))
    t, w, a = native.fuse_imu(tg, wg, ta, aa)
    # accel at -0.01 (before gyro) and 0.05 (after) are dropped
    assert np.allclose(t, [0.005, 0.015, 0.02])
    assert np.allclose(w[:, 0], [0.5, 1.5, 2.0])
    assert np.allclose(a[:, 2], 9.8)


def test_poisson_filter_matches_python():
    from xrslam_tpu.frontend.tracker import _poisson_accept

    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 200, (300, 2))
    lengths = rng.integers(0, 10, 300)
    keep = rng.uniform(size=300) > 0.2
    order = np.argsort(-lengths, kind="stable")

    nat = native.poisson_filter(pts, order, keep, 11.0)
    assert nat is not None

    import xrslam_tpu.native as nmod
    saved = nmod._lib
    try:
        nmod._lib = None
        nmod._tried = True
        py = _poisson_accept(pts, order, keep, 11.0)
    finally:
        nmod._lib = saved
    assert np.array_equal(nat, py)
    # spacing property holds
    acc = pts[nat]
    d = np.linalg.norm(acc[:, None] - acc[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 11.0
