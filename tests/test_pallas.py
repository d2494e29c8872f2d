"""Pallas kernels vs XLA reference ops (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vcf_tpu.ops import dct as dct_ops
from vcf_tpu.ops import motion
from vcf_tpu.ops import quantize as q_ops
from vcf_tpu.ops.pallas import (
    fused_dct_quantize,
    fused_dequantize_idct,
    sad_search,
)


class TestFusedDCT:
    def test_encode_matches_xla(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-128, 127, (3, 64, 128)).astype(np.float32)
        k_pal = np.asarray(
            fused_dct_quantize(jnp.asarray(x), b=8, qss=32, offset=128, interpret=True)
        )
        coeff = dct_ops.analyze(jnp.asarray(x.transpose(1, 2, 0)), 8)
        k_ref = np.asarray(
            (q_ops.deadzone_quantize(coeff, 32) + 128).astype(jnp.uint8)
        ).transpose(2, 0, 1)
        np.testing.assert_array_equal(k_pal, k_ref)

    def test_decode_matches_xla(self):
        rng = np.random.default_rng(1)
        k = rng.integers(100, 157, (3, 64, 128)).astype(np.uint8)
        y_pal = np.asarray(
            fused_dequantize_idct(jnp.asarray(k), b=8, qss=32, offset=128, interpret=True)
        )
        coeff = q_ops.deadzone_dequantize(
            jnp.asarray(k.transpose(1, 2, 0).astype(np.int32)) - 128, 32
        )
        y_ref = np.asarray(dct_ops.synthesize(coeff, 8)).transpose(2, 0, 1)
        np.testing.assert_allclose(y_pal, y_ref, atol=1e-3)

    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(-100, 100, (3, 32, 256)).astype(np.float32)
        k = fused_dct_quantize(jnp.asarray(x), b=8, qss=8, offset=128, interpret=True)
        y = fused_dequantize_idct(k, b=8, qss=8, offset=128, interpret=True)
        # deadzone error <= qss per coefficient; rmse well under qss
        err = float(jnp.sqrt(jnp.mean((y - jnp.asarray(x)) ** 2)))
        assert err < 8.0

    def test_nonstandard_block(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(-100, 100, (1, 32, 64)).astype(np.float32)
        k = fused_dct_quantize(jnp.asarray(x), b=4, qss=16, offset=128, interpret=True)
        coeff = dct_ops.analyze(jnp.asarray(x.transpose(1, 2, 0)), 4)
        k_ref = np.asarray(
            (q_ops.deadzone_quantize(coeff, 16) + 128).astype(jnp.uint8)
        ).transpose(2, 0, 1)
        np.testing.assert_array_equal(np.asarray(k), k_ref)


class TestSADKernel:
    def test_matches_xla_full_search(self):
        rng = np.random.default_rng(0)
        big = rng.integers(0, 255, (80, 96), np.uint8).astype(np.float32)
        ref = big[8:72, 8:88]
        cur = big[11:75, 3:83]
        mv_p, sad_p = sad_search(
            jnp.asarray(ref), jnp.asarray(cur), m=16, s=8, interpret=True
        )
        mv_x, sad_x = motion.full_search(jnp.asarray(ref), jnp.asarray(cur), m=16, s=8)
        np.testing.assert_array_equal(np.asarray(mv_p), np.asarray(mv_x))
        np.testing.assert_allclose(np.asarray(sad_p), np.asarray(sad_x), atol=1e-1)


def test_sad_search_vmap_interpret():
    """sad_search under vmap (the GOP-batched IPP path) matches
    full_search per batch element."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vcf_tpu.ops import motion
    from vcf_tpu.ops.pallas.sad_kernel import sad_search

    rng = np.random.default_rng(0)
    refs = jnp.asarray(rng.integers(0, 255, (2, 32, 64)).astype(np.float32))
    curs = jnp.asarray(np.roll(np.asarray(refs), (0, 3, -2), (0, 1, 2)))
    mv_p, sad_p = jax.vmap(
        lambda r, c: sad_search(r, c, 16, 4, interpret=True))(refs, curs)
    mv_f, sad_f = jax.vmap(
        lambda r, c: motion.full_search(r, c, 16, 4))(refs, curs)
    np.testing.assert_allclose(np.asarray(sad_p), np.asarray(sad_f), rtol=1e-5)


def test_ipp_make_search_selects_pallas(monkeypatch):
    """IPPCodec routes ME through the Pallas kernel on TPU when it fits
    VMEM (VERDICT r1 item 5)."""
    import jax
    from vcf_tpu.config import CodecConfig, VideoConfig
    from vcf_tpu.video.ipp import IPPCodec

    codec = IPPCodec(VideoConfig(), CodecConfig(use_pallas=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert codec._make_search(288, 352).kind == "pallas_sad"  # CIF fits
    # > VMEM untiled -> the row-tiled kernel (r3; was lax_full in r2)
    assert codec._make_search(1088, 1920).kind == "pallas_sad_tiled"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert codec._make_search(288, 352).kind == "lax_full"
    codec2 = IPPCodec(VideoConfig(fast_search=True),
                      CodecConfig(use_pallas=True))
    assert codec2._make_search(288, 352).kind == "three_step"
