"""Dataset reader tests + the golden feature-track test on the two
EuRoC V1_01 images shipped with the reference (reference:
xrslam-test/test/src/test_feature_track.cpp — 164 detected / 161
tracked / FT_NO_TRANSLATION false with its OpenCV kernels; our XLA
kernels assert behavior-level bounds, not bit-identical counts)."""

import os

import numpy as np
import pytest

from xrslam_tpu.config import Config
from xrslam_tpu.core.map import FrameRec, PipelineMap
from xrslam_tpu.io.dataset import (
    DataType, UndistortMap, create_reader, load_gray,
)

REF_DATA = "/root/reference/xrslam-test/data"
IMG1 = os.path.join(REF_DATA, "1403715282262142976.png")
IMG2 = os.path.join(REF_DATA, "1403715282312143104.png")

EUROC_K = np.array([[458.654, 0, 367.215],
                    [0, 457.296, 248.375],
                    [0, 0, 1.0]])
EUROC_DIST = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])


# ---------------------------------------------------------------------------
# dataset reader on a synthetic on-disk mav0 layout
# ---------------------------------------------------------------------------

@pytest.fixture
def mini_euroc(tmp_path):
    from PIL import Image

    root = tmp_path / "seq" / "mav0"
    (root / "cam0" / "data").mkdir(parents=True)
    (root / "imu0").mkdir(parents=True)

    rng = np.random.default_rng(0)
    t0 = 1403715282262142976
    cam_rows = ["#timestamp [ns],filename"]
    for i in range(3):
        t = t0 + i * 50_000_000
        fn = f"{t}.png"
        img = (rng.uniform(0, 255, (48, 64))).astype(np.uint8)
        Image.fromarray(img).save(root / "cam0" / "data" / fn)
        cam_rows.append(f"{t},{fn}")
    (root / "cam0" / "data.csv").write_text("\n".join(cam_rows) + "\n")

    imu_rows = ["#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z"]
    for i in range(25):
        t = t0 - 10_000_000 + i * 5_000_000
        imu_rows.append(f"{t},0.01,0.02,-0.01,0.1,-0.2,9.8")
    (root / "imu0" / "data.csv").write_text("\n".join(imu_rows) + "\n")
    return str(root)


def test_euroc_reader_stream_order(mini_euroc):
    reader = create_reader("euroc://" + mini_euroc)
    assert reader.num_images == 3
    counts = {DataType.CAMERA: 0, DataType.GYROSCOPE: 0,
              DataType.ACCELEROMETER: 0}
    last_t = -np.inf
    while (kind := reader.next()) != DataType.END:
        if kind == DataType.CAMERA:
            t, img = reader.read_image()
            assert img.shape == (48, 64) and img.dtype == np.float32
            assert 0.0 <= img.min() and img.max() <= 1.0
        elif kind == DataType.GYROSCOPE:
            t, w = reader.read_gyroscope()
            assert w.shape == (3,)
        else:
            t, a = reader.read_accelerometer()
            assert np.isclose(a[2], 9.8)
        assert t >= last_t - 1e-12  # time-ordered merge
        last_t = t
        counts[kind] += 1
    assert counts[DataType.CAMERA] == 3
    assert counts[DataType.GYROSCOPE] == counts[DataType.ACCELEROMETER] == 25


def test_async_reader_matches_sync(mini_euroc):
    sync = create_reader("euroc://" + mini_euroc)
    asyn = create_reader("euroc://" + mini_euroc, async_=True)
    while True:
        k1, k2 = sync.next(), asyn.next()
        assert k1 == k2
        if k1 == DataType.END:
            break
        if k1 == DataType.CAMERA:
            (t1, i1), (t2, i2) = sync.read_image(), asyn.read_image()
            assert t1 == t2 and np.array_equal(i1, i2)
        elif k1 == DataType.GYROSCOPE:
            (t1, w1), (t2, w2) = sync.read_gyroscope(), asyn.read_gyroscope()
            assert t1 == t2 and np.array_equal(w1, w2)
        else:
            (t1, a1), (t2, a2) = (sync.read_accelerometer(),
                                  asyn.read_accelerometer())
            assert t1 == t2 and np.array_equal(a1, a2)


def test_undistort_identity():
    """Zero distortion must be (near-)identity resampling."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (40, 50)).astype(np.float32)
    remap = UndistortMap(EUROC_K, np.zeros(4), 50, 40)
    out = remap(img)
    assert np.allclose(out, img, atol=1e-5)


def test_undistort_straightens_lines():
    """A horizontal edge distorted by the EuRoC model must come back
    straight after undistortion (cv::undistort semantics)."""
    h, w = 480, 752
    fx, fy = EUROC_K[0, 0], EUROC_K[1, 1]
    cx, cy = EUROC_K[0, 2], EUROC_K[1, 2]
    k1, k2, p1, p2 = EUROC_DIST
    # synthesize a *distorted* image of a step edge at undistorted v=300
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    # invert distortion numerically for each pixel of the raw image
    x, y = (u - cx) / fx, (v - cy) / fy
    xu, yu = x.copy(), y.copy()
    for _ in range(20):
        r2 = xu * xu + yu * yu
        rad = 1 + k1 * r2 + k2 * r2 * r2
        xu = (x - (2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu))) / rad
        yu = (y - (p1 * (r2 + 2 * yu * yu) + 2 * p2 * xu * yu)) / rad
    v_undist = fy * yu + cy
    raw = (v_undist > 300).astype(np.float32)
    remap = UndistortMap(EUROC_K, EUROC_DIST, w, h)
    out = remap(raw)
    # the edge in the undistorted image should sit at v≈300 across u
    edge_rows = np.argmax(out > 0.5, axis=0)
    mid = edge_rows[100:-100]
    assert np.abs(mid - 300).max() <= 2


# ---------------------------------------------------------------------------
# golden feature-track on the reference's shipped EuRoC images
# ---------------------------------------------------------------------------

needs_ref_images = pytest.mark.skipif(
    not (os.path.exists(IMG1) and os.path.exists(IMG2)),
    reason="reference test images not available")


def _make_frame(t, K, capacity=256):
    return FrameRec(
        id=int(t * 1e3), t=t,
        q=np.array([1.0, 0, 0, 0]), p=np.zeros(3), v=np.zeros(3),
        bg=np.zeros(3), ba=np.zeros(3),
        q_bc=np.array([1.0, 0, 0, 0]), p_bc=np.zeros(3),
        q_bi=np.array([1.0, 0, 0, 0]), p_bi=np.zeros(3),
        K=K, sqrt_inv_cov2=np.eye(2),
        bearings=np.zeros((capacity, 3)),
        track_ids=np.full((capacity,), -1, dtype=np.int64),
    )


@needs_ref_images
@pytest.mark.slow
def test_feature_track_golden():
    from xrslam_tpu.frontend.tracker import KLTFeatureTracker

    cfg = Config(
        camera_intrinsic=EUROC_K,
        feature_tracker_max_keypoint_detection=200,
        feature_tracker_min_keypoint_distance=20.0,
    )
    remap = UndistortMap(EUROC_K, EUROC_DIST, 752, 480)
    img1 = remap(load_gray(IMG1))
    img2 = remap(load_gray(IMG2))

    tracker = KLTFeatureTracker(cfg, capacity=256)
    pmap = PipelineMap()

    f1 = _make_frame(0.0, EUROC_K)
    f1._image = img1
    pmap.attach_frame(f1)
    tracker.track_frame(pmap, f1)
    n_det = f1.n_keypoints()
    # reference's OpenCV GFTT finds 164 with the same spacing budget;
    # our Harris+NMS kernel must land in the same regime
    assert 120 <= n_det <= 200, n_det

    f2 = _make_frame(0.05, EUROC_K)
    f2._image = img2
    pmap.attach_frame(f2)
    tracker.track_frame(pmap, f2)

    tracked = sum(
        1 for k in np.nonzero(f2.track_ids >= 0)[0]
        if pmap.get_track(f2, int(k)) is not None
        and len(pmap.get_track(f2, int(k)).obs) >= 2)
    # reference keeps 161/164 (98%); require the strong majority
    assert tracked >= 0.75 * n_det, (tracked, n_det)
    assert not f2.no_translation  # camera translates between the frames
