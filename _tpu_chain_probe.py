import os, dataclasses
import numpy as np
from xrslam_tpu.config import load_config
from xrslam_tpu.core.detail import VIOPipeline
from xrslam_tpu.frontend.tracker import KLTFeatureTracker
from xrslam_tpu.io.dataset import DataType, create_reader

ds = "/tmp/xrslam_bench_seq/f120_l500"
cfg = load_config(os.path.join(ds, "slam.yaml"), os.path.join(ds, "device.yaml"))
c = dataclasses.replace(cfg, worker_overlap=True, pipelined_writeback=True,
                        chained_frontend=True)
pipe = VIOPipeline(c, KLTFeatureTracker(c, capacity=256))
rd = create_reader("euroc://" + os.path.join(ds, "mav0"), c, async_=False)
k = 0
while (kind := rd.next()) != DataType.END:
    if kind == DataType.GYROSCOPE:
        t, w = rd.read_gyroscope(); pipe.track_gyroscope(t, w)
    elif kind == DataType.ACCELEROMETER:
        t, a = rd.read_accelerometer(); pipe.track_accelerometer(t, a)
    elif kind == DataType.CAMERA:
        t, img = rd.read_image(); pipe.track_camera_image(t, img)
        k += 1
        f = pipe.tracker.last_finished
        if f is not None and k % 4 == 0:
            n = int((f.track_ids >= 0).sum())
            lens = [len(tr.obs) for tr in pipe.tracker_map.tracks.values()]
            print(f"k={k:3d} ntrk={n:3d} maxlen={max(lens) if lens else 0:3d} "
                  f"no_trans={f.no_translation} state={pipe.state}")
        if k >= 100:
            break
pipe.flush()
