import os, sys, time
os.environ["XR_TRACE_FETCH"] = "1"
import dataclasses
from xrslam_tpu.config import load_config
from xrslam_tpu.tools.run_dataset import run_sequence
from xrslam_tpu.utils import fetch as F

ds_dir = "/tmp/xrslam_bench_seq/f120_l500"
config = load_config(os.path.join(ds_dir, "slam.yaml"),
                     os.path.join(ds_dir, "device.yaml"))
config = dataclasses.replace(config, worker_overlap=True,
                             pipelined_writeback=True, parsac_flag=True)
uri = "euroc://" + os.path.join(ds_dir, "mav0")
run_sequence(uri, config, async_reader=False)
F.trace_events(reset=True)
t0 = time.perf_counter()
run_sequence(uri, config, async_reader=False)
print(f"fps={120/(time.perf_counter()-t0):.2f}", file=sys.stderr)
ev = F.trace_events(reset=True)
fm = [i for i, (l, a, b) in enumerate(ev) if l.startswith("frame:")]
lo, hi = fm[100], fm[103]
t_base = ev[lo][1]
for l, a, b in ev[lo:hi]:
    print(f"{(a-t_base)*1e3:9.2f} {(b-t_base)*1e3:9.2f} {(b-a)*1e3:8.2f}  {l}")
