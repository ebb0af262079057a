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


def test_capi_c_roundtrip(tmp_path):
    """The real C ABI: compile tests/data/capi_roundtrip.c against
    native/XRSLAM.h + libxr_capi.so (a true embedded-CPython consumer,
    no Python in the test program), run it on a tiny config, and check
    every result type round-trips (reference surface:
    xrslam-interface/include/XRSLAM.h:195-230)."""
    import os
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    natdir = os.path.join(repo, "native")
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler")
    r = subprocess.run(["make", "-C", natdir, "libxr_capi.so"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"libxr_capi.so build failed: {r.stderr[-400:]}")

    slam = tmp_path / "slam.yaml"
    slam.write_text(
        "%YAML:1.0\n"
        "sliding_window:\n  size: 8\n  subframe_size: 3\n"
        "feature_tracker:\n  min_keypoint_distance: 8.0\n"
        "  max_keypoint_detection: 40\n"
        "solver:\n  iteration_limit: 5\n")
    dev = tmp_path / "device.yaml"
    dev.write_text(
        "%YAML:1.0\n"
        "cam0:\n"
        "  resolution: [64, 48]\n"
        "  intrinsics: [60.0, 60.0, 32.0, 24.0]\n")

    exe = str(tmp_path / "capi_roundtrip")
    r = subprocess.run(
        [cc, os.path.join(repo, "tests", "data", "capi_roundtrip.c"),
         "-I", natdir, "-L", natdir, "-lxr_capi",
         f"-Wl,-rpath,{natdir}", "-o", exe],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    env = dict(os.environ)
    env.update(PYTHONPATH=repo, JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1",
               LD_LIBRARY_PATH=natdir)
    r = subprocess.run([exe, str(slam), str(dev)], capture_output=True,
                       text=True, env=env, timeout=600)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
    out = dict()
    for line in r.stdout.splitlines():
        parts = line.split()
        if parts and parts[0].startswith("CAPI_"):
            out[parts[0]] = parts[1:]
    assert "CAPI_OK" in out
    assert out["CAPI_VERSION"], out
    assert out["CAPI_STATE0"] == ["0"]  # INITIALIZING before any data
    assert out["CAPI_STATE1"] == ["0"]  # still initializing after 1 frame
    assert float(out["CAPI_FX"][0]) == 60.0
    assert float(out["CAPI_FX"][2]) == 24.0  # cy
    # one frame in: detection populated the feature slots, no landmarks
    assert int(out["CAPI_NFEATURES"][0]) > 0
    assert int(out["CAPI_NLANDMARKS"][0]) == 0
    assert float(out["CAPI_BIAS"][0]) == 0.0
