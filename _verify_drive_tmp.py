import os; os.environ["JAX_PLATFORMS"] = "cpu"; os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from xrslam_tpu.tools.make_dataset import render_dataset
from xrslam_tpu.tools.run_dataset import main

paths = render_dataset("/tmp/vseq", n_frames=60, n_landmarks=500)
print("=== drive 1: default config ===", flush=True)
main(["euroc://" + paths["root"],
      "--slam-config", paths["slam_yaml"],
      "--device-config", paths["device_yaml"],
      "--tum", "/tmp/v.tum", "--gt", "--sync"])

# drive 2: enable the camera-rate visual PnP path + backend decimation
slam2 = "/tmp/vseq_slam_pnp.yaml"
with open(paths["slam_yaml"]) as f:
    txt = f.read()
txt += "\nvisual_pnp:\n  enable: true\n  min_landmarks: 8\n"
txt += "sliding_window:\n  tracker_frequent: 2\n" if "sliding_window:" not in txt else ""
with open(slam2, "w") as f:
    f.write(txt)
print("=== drive 2: visual_pnp + tracker_frequent=2 ===", flush=True)
import re
# if slam yaml already has a sliding_window section, patch tracker_frequent into it
with open(slam2) as f:
    t2 = f.read()
if "tracker_frequent" not in t2 and "sliding_window:" in t2:
    t2 = t2.replace("sliding_window:", "sliding_window:\n  tracker_frequent: 2", 1)
    with open(slam2, "w") as f:
        f.write(t2)
main(["euroc://" + paths["root"],
      "--slam-config", slam2,
      "--device-config", paths["device_yaml"],
      "--tum", "/tmp/v2.tum", "--gt", "--sync"])
