import os, dataclasses, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", os.environ.get("X64", "0") == "1")
from xrslam_tpu.config import load_config
from xrslam_tpu.tools.make_dataset import render_dataset
from xrslam_tpu.tools.run_dataset import evaluate_ate, run_sequence

d = "/tmp/xr_chained_check"
if not os.path.exists(os.path.join(d, "slam.yaml")):
    render_dataset(d, n_frames=60, n_landmarks=500)
cfg = load_config(os.path.join(d, "slam.yaml"), os.path.join(d, "device.yaml"))
root = os.path.join(d, "mav0")
base = dataclasses.replace(cfg, worker_overlap=True, pipelined_writeback=True)
for name, c in [("standard", base),
                ("chained ", dataclasses.replace(base, chained_frontend=True))]:
    ts, _, ps = run_sequence("euroc://" + root, c, async_reader=False)
    print(f"{name}: tracked {len(ts)}  ate {evaluate_ate(root, ts, ps):.4f}")
