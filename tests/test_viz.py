"""Visualization module tests (reference: InspectPainter taps +
xrslam-pc painter, headless stand-in)."""

import numpy as np

from xrslam_tpu.tools import viz
from xrslam_tpu.utils import inspection


def test_draw_overlay_marks_points():
    img = np.zeros((60, 80), dtype=np.float64)
    pts = np.array([[10.0, 20.0], [70.0, 50.0], [-5.0, 5.0]])  # last OOB
    out = viz.draw_overlay(img, pts, lengths=np.array([1, 12, 3]))
    assert out.shape == (60, 80, 3) and out.dtype == np.uint8
    # short track ring is red-ish, long is green-ish
    assert out[20 - 3, 10, 0] > 200 and out[20 - 3, 10, 1] < 60
    assert out[50 - 3, 70, 1] > 200 and out[50 - 3, 70, 0] < 60


def test_plot_trajectory(tmp_path):
    t = np.linspace(0, 2 * np.pi, 50)
    est = np.stack([np.cos(t), np.sin(t), 0 * t], axis=-1)
    gt = est + 0.01
    p = tmp_path / "traj.png"
    viz.plot_trajectory(str(p), est, gt)
    assert p.exists() and p.stat().st_size > 500


def test_overlay_writer_via_tap(tmp_path):
    w = viz.OverlayWriter(str(tmp_path))
    assert inspection.inspect_get(inspection.PAINTER_ENABLE)
    inspection.inspect(inspection.PAINTER_FRAME, {
        "image": np.zeros((40, 40)), "pts": np.array([[5.0, 5.0]]),
        "lengths": np.array([4]), "frame_id": 7, "t": 0.0,
    })
    w.close()
    assert (tmp_path / "frame_000007.png").exists()
    assert not inspection.inspect_get(inspection.PAINTER_ENABLE)
