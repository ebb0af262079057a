"""Real data-parallel multi-sequence evaluation.

Renders N DISTINCT synthetic EuRoC-layout sequences (different seeds →
different trajectories/landmark fields), then drives them two ways:

1. sequential — full pipelines one after another (the reference's
   benchmark driver loop, xrslam-pc/player/src/main.cpp:116-169, run
   once per sequence);
2. lockstep data-parallel — all N pipelines advance frame-by-frame
   together; each frame, every sequence on the (majority) subframe path
   contributes its fused localize+refine solve to ONE
   `solve_chained_batch` dispatch over the data (sequence) axis
   (SURVEY §2.3 data-parallel row; the batch axis is the same axis
   `parallel.sharded.solve_batch_sharded` shards over a device mesh on
   multi-chip hardware). Frontends stay interleaved on host.

Records aggregate frames/s for both modes + per-sequence ATEs.

Usage: python -m xrslam_tpu.tools.multiseq [--n 4] [--frames 90]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


class ChainedSolveBroker:
    """Collects prepare_fused_subframe contexts from N lockstepped
    trackers and dispatches them as one batched program per (l_opts,
    s_opts) group, padding each group to the fleet size so exactly ONE
    batched executable exists per opts signature."""

    def __init__(self, fleet: int):
        self.fleet = fleet
        self.pending = []
        self.batched_calls = 0
        self.solo_equiv = 0

    def submit(self, swt, ctx):
        self.pending.append((swt, ctx))

    def flush(self):
        from xrslam_tpu.estimation.solver import solve_chained_batch

        if not self.pending:
            return
        groups = {}
        for swt, ctx in self.pending:
            groups.setdefault((ctx["l_opts"], ctx["s_opts"]), []).append(
                (swt, ctx))
        self.pending = []
        for (l_opts, s_opts), items in groups.items():
            n = len(items)
            self.solo_equiv += n
            # pad to the fleet size: one executable per opts signature
            padded = items + [items[-1]] * (self.fleet - n)
            grab = lambda key: tuple(c[key] for _, c in padded)
            s2s = np.asarray([c["s2"] for _, c in padded], np.int32)
            outs = solve_chained_batch(
                grab("l_state"), grab("l_data"), l_opts,
                grab("s_state"), grab("s_data"), s_opts, jnp.asarray(s2s))
            self.batched_calls += 1
            for (swt, ctx), st2 in zip(items, outs):
                swt.finish_fused_subframe(ctx, st2)


def _make_pipes(dirs, configs):
    from xrslam_tpu.core.detail import VIOPipeline
    from xrslam_tpu.frontend.tracker import KLTFeatureTracker
    from xrslam_tpu.io.dataset import create_reader

    pipes, readers = [], []
    for d, cfg in zip(dirs, configs):
        pipes.append(VIOPipeline(cfg, KLTFeatureTracker(cfg)))
        readers.append(create_reader("euroc://" + os.path.join(d, "mav0"),
                                     cfg, async_=False))
    return pipes, readers


def _step_until_frame(pipe, reader) -> bool:
    """Feed sensor events until one camera frame is processed."""
    from xrslam_tpu.io.dataset import DataType

    while (kind := reader.next()) != DataType.END:
        if kind == DataType.GYROSCOPE:
            t, w = reader.read_gyroscope()
            pipe.track_gyroscope(t, w)
        elif kind == DataType.ACCELEROMETER:
            t, a = reader.read_accelerometer()
            pipe.track_accelerometer(t, a)
        elif kind == DataType.DEPTH:
            t, d = reader.read_depth()
        else:
            t, img = reader.read_image()
            pipe.track_camera_image(t, img)
            return True
    return False


def _collect_pose(pipe, est):
    if pipe.state == "tracking":
        t, q, p, v, bg, ba = pipe.swt.get_latest_state()
        est.append((t, np.asarray(p, dtype=float).copy()))


def run(n_seq=4, n_frames=90, out_dir="/tmp/xrslam_multiseq"):
    from xrslam_tpu.config import load_config
    from xrslam_tpu.tools.make_dataset import render_dataset
    from xrslam_tpu.tools.run_dataset import evaluate_ate

    # distinct seeds -> distinct trajectories/landmark fields; chosen
    # from seeds whose scenes initialize and track (a VI scene can be
    # legitimately degenerate for ANY estimator — e.g. seed 18 never
    # gathers an init baseline, seed 25 diverges in every mode)
    seeds = [3, 5, 11, 32, 7, 13, 21, 29]
    dirs, configs = [], []
    for s in range(n_seq):
        d = os.path.join(out_dir, f"seq{s}_f{n_frames}")
        if not os.path.exists(os.path.join(d, "slam.yaml")):
            render_dataset(d, n_frames=n_frames, n_landmarks=500,
                           seed=seeds[s % len(seeds)])
        dirs.append(d)
        configs.append(load_config(os.path.join(d, "slam.yaml"),
                                   os.path.join(d, "device.yaml")))

    def drive(batched: bool, passes: int = 2):
        res = None
        for _ in range(passes):  # pass 1 warms the jit caches
            pipes, readers = _make_pipes(dirs, configs)
            broker = ChainedSolveBroker(n_seq) if batched else None
            ests = [[] for _ in pipes]
            alive = [True] * len(pipes)
            frames = 0
            t0 = time.perf_counter()
            while any(alive):
                for i, (p, r) in enumerate(zip(pipes, readers)):
                    if not alive[i]:
                        continue
                    if broker and p.swt is not None:
                        p.swt.solve_broker = broker
                    alive[i] = _step_until_frame(p, r)
                    if alive[i]:
                        frames += 1
                if broker:
                    broker.flush()
                for i, p in enumerate(pipes):
                    if alive[i]:
                        _collect_pose(p, ests[i])
            dt = time.perf_counter() - t0
            res = (ests, frames, dt,
                   broker.batched_calls if broker else 0,
                   broker.solo_equiv if broker else 0)
            # fresh readers per pass
            readers = None
        return res

    seq_ests, seq_frames, seq_dt, _, _ = drive(False)
    bat_ests, bat_frames, bat_dt, calls, solo_equiv = drive(True)

    def ates(ests):
        out = []
        for d, est in zip(dirs, ests):
            if len(est) < 10:
                out.append(float("nan"))
                continue
            ts = np.asarray([e[0] for e in est])
            ps = np.stack([e[1] for e in est])
            out.append(float(evaluate_ate(os.path.join(d, "mav0"), ts, ps)))
        return out

    return {
        "note": ("Round-4 REAL data-parallel multi-sequence drive: "
                 f"{n_seq} DISTINCT rendered sequences (seeds differ -> "
                 "different trajectories + landmark fields), full "
                 "pipelines, lockstep frames; fused subframe solves "
                 "batched per frame into solve_chained_batch on the "
                 "data axis vs the sequential per-sequence sweep."),
        "sequences": n_seq,
        "frames_per_seq": n_frames,
        "sequential": {"frames": seq_frames, "wall_s": round(seq_dt, 2),
                       "agg_fps": round(seq_frames / seq_dt, 2),
                       "ate_rmse_m": ates(seq_ests)},
        "batched": {"frames": bat_frames, "wall_s": round(bat_dt, 2),
                    "agg_fps": round(bat_frames / bat_dt, 2),
                    "ate_rmse_m": ates(bat_ests),
                    "batched_dispatches": calls,
                    "solo_solves_replaced": solo_equiv},
        "speedup": round(seq_dt / bat_dt, 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--frames", type=int, default=90)
    args = ap.parse_args(argv)
    print(json.dumps(run(args.n, args.frames)))


if __name__ == "__main__":
    main()
