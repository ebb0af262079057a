"""Live web viewer: HTTP surface + painter-tap frame overlay.

The interactive counterpart of tools/viz.py (reference liteviz GL
visualizer, xrslam-pc/player/src/visualizer.cpp) — here a stdlib HTTP
server publishing JSON state + PNG overlays to a self-contained page.
"""

import json
import urllib.request

import numpy as np


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_viewer_state_and_page():
    from xrslam_tpu.tools.live_viewer import LiveViewer

    v = LiveViewer(port=0, host="127.0.0.1", subscribe_painter=False)
    try:
        v.publish(pose_q=[1, 0, 0, 0], pose_p=[1.0, 2.0, 3.0],
                  landmarks=np.arange(12.0).reshape(4, 3),
                  stats={"fps": 12.5, "frame": 7})
        v.publish(pose_q=[1, 0, 0, 0], pose_p=[1.5, 2.0, 3.0])

        st, ct, body = _get(v.url)
        assert st == 200 and "text/html" in ct
        assert b"canvas" in body and b"/state.json" in body

        st, ct, body = _get(v.url + "state.json")
        assert st == 200 and "json" in ct
        s = json.loads(body)
        assert s["traj"] == [[1.0, 2.0, 3.0], [1.5, 2.0, 3.0]]
        assert s["pose"]["p"] == [1.5, 2.0, 3.0]
        assert len(s["landmarks"]) == 4
        assert s["stats"]["fps"] == 12.5

    finally:
        v.close()


def test_viewer_painter_frame_png():
    from xrslam_tpu.tools.live_viewer import LiveViewer
    from xrslam_tpu.utils import inspection

    v = LiveViewer(port=0, host="127.0.0.1")
    try:
        assert inspection.inspect_get(inspection.PAINTER_ENABLE) is True
        img = np.zeros((48, 64), dtype=np.uint8)
        img[10:20, 10:20] = 200
        inspection.inspect(inspection.PAINTER_FRAME, {
            "image": img, "pts": np.array([[12.0, 14.0], [40.0, 30.0]]),
            "lengths": np.array([2, 8]), "frame_id": 3, "t": 0.1,
        })
        st, ct, body = _get(v.url + "frame.png")
        assert st == 200 and ct == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

        st, _, body = _get(v.url + "state.json")
        assert json.loads(body)["frame_seq"] == 1
        prev = inspection.inspect_get(inspection.PAINTER_ENABLE)
        assert prev is True
    finally:
        v.close()
