#!/usr/bin/env python
"""Profile one train step of an arch on the TPU and print the top self-time
ops (VERDICT.md round-1 next #6/#7: quantify the early-level lane-padding
cost and the NewModel-Wavelet gap with a real profile, not guesses).

Usage:
    python experiments/profile_arch.py -a NewModel --use-dwt Wavelet \
        --batch 8 --size 256 [--steps 5] [--out /tmp/prof]

Writes a jax.profiler trace then parses the xplane with
tensorboard_plugin_profile and prints a per-op self-time table.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(arch: str, size: int, batch: int, use_dwt: str, steps: int,
        out: str, remat: bool = True):
    import jax

    from underwater_image_restoration_tpu.train.benchlib import TrainStepBench

    kw = {}
    if arch.startswith("New"):
        kw["use_dwt"] = use_dwt
    bench = TrainStepBench(arch, size, batch, remat=remat, **kw)

    thr = bench.best_throughput(steps=steps, windows=1)
    print(f"throughput: {thr:.1f} img/s ({batch / thr * 1e3:.2f} ms/step)")

    with jax.profiler.trace(out):
        jax.block_until_ready(bench.run(steps)["loss"])
    print(f"trace -> {out}")
    return out


def parse_trace(out: str, top: int = 40):
    """Print per-op self time from the xplane protobuf."""
    paths = sorted(glob.glob(os.path.join(
        out, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        print("no xplane found under", out)
        return
    path = paths[-1]
    # (tensorboard_plugin_profile 2.13 is protobuf-incompatible with this
    # environment's protobuf 5.x — parse the xplane directly)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        evs = {}
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                d, n = evs.get(name, (0, 0))
                evs[name] = (d + ev.duration_ps, n + 1)
        rows = sorted(evs.items(), key=lambda kv: -kv[1][0])[:top]
        tot = sum(d for d, _ in evs.values())
        print(f"== plane {plane.name}: {len(evs)} op names, "
              f"total {tot / 1e12 * 1e3:.2f} ms (all lines)")
        for name, (d, n) in rows:
            print(f"{d / 1e9:10.3f} ms  {100 * d / max(tot, 1):5.1f}%  "
                  f"x{n:<5d} {name[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-a", "--arch", default="NewModel")
    p.add_argument("--use-dwt", default="Wavelet")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--out", default="")
    p.add_argument("--parse-only", action="store_true")
    p.add_argument("--top", type=int, default=40)
    a = p.parse_args()
    out = a.out or f"/tmp/prof_{a.arch}_{a.use_dwt}_{a.size}_{a.batch}"
    if not a.parse_only:
        run(a.arch, a.size, a.batch, a.use_dwt, a.steps, out,
            remat=not a.no_remat)
    parse_trace(out, a.top)


if __name__ == "__main__":
    main()
