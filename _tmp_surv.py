import os, sys
if os.environ.get('FORCE_CPU'):
    os.environ['JAX_PLATFORMS']='cpu'
    os.environ['JAX_ENABLE_X64']='1'
    import jax
    jax.config.update('jax_platforms','cpu')
    jax.config.update('jax_enable_x64', True)
import numpy as np
from xrslam_tpu.config import load_config
from xrslam_tpu import api
from xrslam_tpu.io.dataset import DataType, create_reader
import xrslam_tpu.frontend.tracker as trk

# wrap _finish_track to report survival
orig_ft = trk.KLTFeatureTracker._finish_track
def patched(self, tracker_map, prev, frame, ctx, vals):
    st = np.asarray(vals["status"])
    n = ctx["n"]
    orig_ft(self, tracker_map, prev, frame, ctx, vals)
    n_acc = int((frame.track_ids >= 0).sum())
    lens = []
    for k in np.nonzero(frame.track_ids >= 0)[0]:
        tr = tracker_map.tracks.get(int(frame.track_ids[k]))
        if tr: lens.append(len(tr.obs))
    lens = np.array(lens) if lens else np.array([0])
    sk = vals.get("status_klt")
    sks = int(np.asarray(sk).sum()) if sk is not None else -1
    print(f"  klt_ok={sks} n_in={n} st_ok={int(st.sum())} accepted={n_acc} maxlen={lens.max()} n36={(lens>=36).sum()}", file=sys.stderr, flush=True)
trk.KLTFeatureTracker._finish_track = patched

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
        if n >= 42: break
print("done", n)
