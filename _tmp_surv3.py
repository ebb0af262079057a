import os, sys, importlib.util
import numpy as np

import xrslam_tpu.frontend.klt as klt_mod
orig = klt_mod.track_keypoints
def wrapped(*a, **kw):
    pts, st = orig(*a, **kw)
    print(f"  klt_ok={int(np.asarray(st).sum())}", file=sys.stderr, flush=True)
    return pts, st

spec = importlib.util.spec_from_file_location("old_tracker", "/tmp/old_tracker.py")
old_trk = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_trk)
old_trk.klt.track_keypoints = wrapped

import xrslam_tpu.api as api
api.KLTFeatureTracker = old_trk.KLTFeatureTracker

from xrslam_tpu.config import load_config
from xrslam_tpu.io.dataset import DataType, create_reader
d = "/tmp/xrslam_bench_seq"
config = load_config(os.path.join(d, "slam.yaml"), os.path.join(d, "device.yaml"))
slam = api.XRSLAM(config=config)
reader = create_reader("euroc://" + d + "/mav0", config, async_=False)
n = 0
while (kind := reader.next()) != DataType.END:
    if kind == DataType.GYROSCOPE:
        t, w = reader.read_gyroscope(); slam.push_sensor_data(api.SensorType.GYROSCOPE, t, w)
    elif kind == DataType.ACCELEROMETER:
        t, a = reader.read_accelerometer(); slam.push_sensor_data(api.SensorType.ACCELERATION, t, a)
    else:
        t, img = reader.read_image(); slam.push_sensor_data(api.SensorType.CAMERA, t, img)
        slam.run_one_frame()
        n += 1
        print(f"[{n}] {slam.pipeline.state}", file=sys.stderr, flush=True)
        if n >= 40 or slam.pipeline.swt is not None: break
print("done", n)
