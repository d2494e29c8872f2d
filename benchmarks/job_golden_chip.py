"""Real-chip smoke gate (VERDICT r4 next #7): decode every golden
fixture ON THE REAL TPU and check RMSE against the CPU-recorded
expectations within the documented +-1-quantization-index tolerance
(CLAUDE.md: the fused kernels and XLA disagree on ~0.4% of indexes by
+-1 on real silicon, so digests cannot be asserted — RMSE bounds can).
Also round-trips each config chip-encode -> chip-decode.

Run through the chipserver:

    cp benchmarks/job_golden_chip.py /tmp/chipjobs/NN_golden.py
    cat /tmp/chipjobs/NN_golden.py.out   # expect GOLDEN_CHIP_OK

Run once per round before the BENCH capture; record the pass in
docs/PERF_NOTES.md.
"""

import json
import os
import sys

for m in [k for k in sys.modules
          if k.startswith("vcf_tpu") or k == "test_golden"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax

assert jax.default_backend() == "tpu", jax.devices()

from test_golden import CONFIGS, _input, _paths  # noqa: E402
from vcf_tpu import Codec, CodeStream, metrics  # noqa: E402

# |rmse_chip - rmse_cpu| bound: a +-1 index knife edge on 0.4% of
# coefficients moves pixel rmse by well under 0.15 at these sizes
RMSE_TOL = 0.15

img = _input()
expect = json.load(open("/root/repo/benchmarks/golden_chip_expect.json"))
failures = []
for name, cfg in sorted(CONFIGS.items()):
    sp, _ = _paths(name)
    if not os.path.exists(sp) or name not in expect:
        print(f"{name}: SKIP (no fixture)")
        continue
    try:
        rec = Codec(cfg).decode(CodeStream.from_file(sp))
        r = float(metrics.rmse(img, rec))
        ok = abs(r - expect[name]["rmse"]) <= RMSE_TOL
        # chip round trip: encode here, decode here
        cs2 = Codec(cfg).encode(img)
        rec2 = Codec(cfg).decode(CodeStream.from_bytes(cs2.to_bytes()))
        r2 = float(metrics.rmse(img, rec2))
        ok2 = abs(r2 - expect[name]["rmse"]) <= RMSE_TOL
        print(f"{name}: decode rmse {r:.4f} (cpu {expect[name]['rmse']}) "
              f"{'OK' if ok else 'FAIL'}; roundtrip rmse {r2:.4f} "
              f"{'OK' if ok2 else 'FAIL'}")
        if not (ok and ok2):
            failures.append(name)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {e!r}")
        failures.append(name)

if failures:
    raise SystemExit(f"GOLDEN_CHIP_FAIL: {failures}")
print("GOLDEN_CHIP_OK")
