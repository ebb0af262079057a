import os, sys
import numpy as np
from xrslam_tpu.config import load_config
from xrslam_tpu import api
from xrslam_tpu.io.dataset import DataType, create_reader
import xrslam_tpu.frontend.klt as klt_mod

orig = klt_mod.track_keypoints
state = {"n": 0}
def wrapped(*a, **kw):
    pts, st = orig(*a, **kw)
    print(f"  klt_ok={int(np.asarray(st).sum())}", file=sys.stderr, flush=True)
    return pts, st
klt_mod.track_keypoints = wrapped
import xrslam_tpu.frontend.tracker as trk
trk.klt.track_keypoints = wrapped

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
        if n >= 20: break
print("done", n)
