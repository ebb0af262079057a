import os; os.environ["JAX_PLATFORMS"] = "cpu"; os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from xrslam_tpu.tools.run_dataset import main

slam, dev = "/tmp/vseq/slam.yaml", "/tmp/vseq/device.yaml"
root = "euroc:///tmp/vseq/mav0"

def variant(name, patch_freq2=False, pnp=False):
    p = f"/tmp/vseq_slam_{name}.yaml"
    with open(slam) as f:
        t = f.read()
    if patch_freq2:
        t = t.replace("sliding_window:", "sliding_window:\n  tracker_frequent: 2", 1)
    if pnp:
        t += "\nvisual_pnp:\n  enable: true\n"
    with open(p, "w") as f:
        f.write(t)
    print(f"=== {name} ===", flush=True)
    main([root, "--slam-config", p, "--device-config", dev,
          "--tum", f"/tmp/v_{name}.tum", "--gt", "--sync"])

variant("freq2_nopnp", patch_freq2=True)
variant("pnp_freq1", pnp=True)
