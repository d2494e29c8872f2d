"""Weak-scaling efficiency of the data-parallel batch codec.

BASELINE.md asks for measured scaling at 1 chip / 1 host / N hosts
(>= 80% efficiency).  This harness measures weak scaling of the
flagship device path (YCoCg + 8x8 DCT + subbands + deadzone, the
BASELINE config-2 transform) over a 1-D data mesh: each device gets a
fixed number of frames, so perfect scaling is flat wall time as the
mesh grows.

Caveats recorded with the results:
* On virtual CPU devices (JAX_PLATFORMS=cpu +
  `jax.config.update("jax_num_cpu_devices", n)`) all "devices" share
  the host's cores, so weak-scaling efficiency measures XLA's
  cross-device scheduling overhead, not hardware scaling — useful as a
  regression canary for the sharding mechanism only.
* On a real multi-chip slice the same script measures true ICI scaling
  (no collectives in this path, so the ceiling is per-chip throughput).

Usage:
    python benchmarks/scaling.py [--frames-per-dev 4] [--hw 512]
Writes benchmarks/scaling.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-per-dev", type=int, default=4)
    ap.add_argument("--hw", type=int, default=512, help="frame height=width")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force CPU with this many virtual devices (0 = use "
                         "the ambient platform/devices)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu_devices:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vcf_tpu.config import CodecConfig
    from vcf_tpu.io.images import test_image
    from vcf_tpu.parallel.mesh import BatchCodec, make_mesh, shard_batch

    n_dev_total = len(jax.devices())
    hw = args.hw
    base = test_image(hw, hw, seed=7).astype(np.uint8)
    platform = jax.devices()[0].platform

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev_total]
    rows = []
    for n in sizes:
        mesh = make_mesh(n)
        codec = BatchCodec(CodecConfig(), mesh=mesh)
        n_frames = n * args.frames_per_dev
        frames = np.stack([np.roll(base, 3 * i, 0) for i in range(n_frames)])
        x = shard_batch(frames, mesh)

        def roundtrip():
            planes = codec.encode_device(x)
            rec = codec.decode_device(planes)
            # force a scalar readback: block_until_ready is unreliable
            # under the axon tunnel (docs/PERF_NOTES.md)
            return int(jnp.sum(rec[0, 0, 0].astype(jnp.int32)))

        for _ in range(4):  # warm the executable (PERF_NOTES: first runs slow)
            roundtrip()
        t0 = time.perf_counter()
        for _ in range(args.reps):
            roundtrip()
        dt = (time.perf_counter() - t0) / args.reps
        gbps = frames.nbytes / dt / 1e9
        rows.append({"devices": n, "frames": n_frames, "s": round(dt, 4),
                     "gbps": round(gbps, 3), "_gbps_raw": gbps})

    base_gbps = rows[0]["_gbps_raw"]
    for r in rows:
        # efficiency from unrounded throughputs (ADVICE r1)
        r["weak_scaling_eff"] = round(
            r.pop("_gbps_raw") / (base_gbps * r["devices"]), 3)

    out = {
        "metric": "weak-scaling efficiency, data-parallel codec roundtrip",
        "platform": platform,
        "virtual_devices": bool(args.cpu_devices) or platform == "cpu",
        "frame": f"{hw}x{hw}x3 uint8",
        "rows": rows,
        "value": rows[-1]["weak_scaling_eff"],
        "unit": "fraction of linear",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
