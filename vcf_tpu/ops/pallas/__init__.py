"""Pallas TPU kernels for the hot codec ops.

Explicit VMEM-blocked kernels for the compute-critical paths
(BASELINE north star: "Pallas kernels for block-transform,
quantization, motion search, and bit-pack inner loops"):

* fused_dct_quantize / fused_dequantize_idct — the whole per-plane
  transform+quantize hot loop in one kernel (vcf_tpu/ops/pallas/dct_kernel.py)
* sad_search — full-search block motion estimation
  (vcf_tpu/ops/pallas/sad_kernel.py)

Every kernel has an XLA reference implementation in vcf_tpu/ops; the
`CodecConfig.use_pallas` flag selects the implementation, and
equivalence is enforced by tests (tests/test_pallas.py runs both in
interpreter mode on CPU).
"""

from vcf_tpu.ops.pallas.dct_kernel import (
    fused_dct_quantize,
    fused_dct_quantize_any,
    fused_dequantize_idct,
    fused_dequantize_idct_any,
)
from vcf_tpu.ops.pallas.sad_kernel import sad_search

__all__ = ["fused_dct_quantize", "fused_dct_quantize_any",
           "fused_dequantize_idct", "fused_dequantize_idct_any",
           "sad_search"]
