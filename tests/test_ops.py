"""Unit tests for device-side ops: color, dct, quantize, vq."""

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from vcf_tpu.ops import color, dct, quantize, vq


class TestColor:
    def test_ycocg_roundtrip_float(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-128, 127, (16, 16, 3)).astype(np.float32)
        y = color.ycocg_forward(jnp.asarray(x))
        rec = color.ycocg_inverse(y)
        np.testing.assert_allclose(np.asarray(rec), x, atol=1e-3)

    def test_ycocg_r_lossless_ints(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 256, (32, 32, 3)).astype(np.int16)
        y = color.ycocg_r_forward(jnp.asarray(x))
        rec = color.ycocg_r_inverse(y)
        np.testing.assert_array_equal(np.asarray(rec), x.astype(np.int32))

    def test_ycrcb_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
        rec = color.ycrcb_inverse(color.ycrcb_forward(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(rec), x, atol=1e-2)

    def test_cdct_orthonormal(self):
        assert np.allclose(color.CDCT_FWD @ color.CDCT_FWD.T, np.eye(3), atol=1e-6)

    def test_ycocg_gray_maps_to_luma(self):
        x = jnp.full((4, 4, 3), 100.0)
        y = color.ycocg_forward(x)
        np.testing.assert_allclose(np.asarray(y[..., 0]), 100.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y[..., 1:]), 0.0, atol=1e-4)


class TestDCT:
    @pytest.mark.parametrize("b", [2, 4, 8, 16])
    def test_orthonormal(self, b):
        d = dct.dct_matrix(b)
        np.testing.assert_allclose(d @ d.T, np.eye(b), atol=1e-5)

    @pytest.mark.parametrize("b", [4, 8, 16])
    def test_roundtrip(self, b):
        rng = np.random.default_rng(0)
        x = rng.uniform(-128, 127, (32, 64, 3)).astype(np.float32)
        y = dct.analyze(jnp.asarray(x), b)
        rec = dct.synthesize(y, b)
        np.testing.assert_allclose(np.asarray(rec), x, atol=1e-3)

    def test_dc_coefficient(self):
        # constant block -> all energy in DC = B * value (orthonormal)
        b = 8
        x = jnp.full((8, 8, 1), 10.0)
        y = np.asarray(dct.analyze(x, b))
        assert abs(y[0, 0, 0] - 10.0 * b) < 1e-3
        assert np.abs(y).sum() - abs(y[0, 0, 0]) < 1e-3

    def test_subband_permutation_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(32, 40, 3)).astype(np.float32))
        s = dct.to_subbands(x, 8)
        rec = dct.from_subbands(s, 8)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))

    def test_subband_layout(self):
        # DC coefficients of all blocks land in the top-left subband
        b = 4
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(16, 16, 1)).astype(np.float32))
        coeff = dct.analyze(x, b)
        sub = np.asarray(dct.to_subbands(coeff, b))
        coeff = np.asarray(coeff)
        for by in range(4):
            for bx in range(4):
                assert sub[by, bx, 0] == coeff[by * b, bx * b, 0]

    def test_pad_roundtrip(self):
        x = jnp.asarray(np.arange(61 * 45 * 3).reshape(61, 45, 3).astype(np.float32))
        p = dct.pad_centered(x, 8)
        assert p.shape == (64, 48, 3)
        rec = dct.unpad_centered(p, (61, 45, 3))
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))

    def test_perceptual_scale_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        y = dct.perceptual_scale(x, 8)
        rec = dct.perceptual_scale(y, 8, inverse=True)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), rtol=1e-5)

    def test_resamplers_pinned_to_cv2_goldens(self):
        """VERDICT r3 #9: the pure-numpy table resamplers are pinned
        against stored cv2.resize outputs (tests/golden/
        cv2_resize_tables.npz): area bit-exact, linear within ±1 of the
        IPP-dispatched cv2 build that generated the vectors."""
        import pathlib

        golden = np.load(
            pathlib.Path(__file__).parent / "golden" / "cv2_resize_tables.npz"
        )
        tables = {"luma": dct.JPEG_LUMA_QT.astype(np.uint8),
                  "chroma": dct.JPEG_CHROMA_QT.astype(np.uint8)}
        for b in (2, 3, 4, 5, 6, 7):
            for tag, src in tables.items():
                np.testing.assert_array_equal(
                    dct.resize_area_u8(src, b), golden[f"area_{tag}_{b}"],
                    err_msg=f"area b={b} {tag}",
                )
        for b in (9, 16, 32):
            for tag, src in tables.items():
                diff = np.abs(
                    dct.resize_linear_u8(src, b).astype(int)
                    - golden[f"linear_{tag}_{b}"].astype(int)
                )
                assert diff.max() <= 1, f"linear b={b} {tag}: {diff.max()}"

    def test_perceptual_tables_no_cv2(self):
        import sys

        for b in (2, 4, 8, 16, 32):
            dct.perceptual_tables.__wrapped__(b)
        import vcf_tpu.ops.dct as m

        assert "cv2" not in m.__dict__  # no module-level cv2
        src = open(m.__file__).read()
        assert "import cv2" not in src


class TestDeadzone:
    def test_trunc_toward_zero(self):
        x = jnp.asarray([-65.0, -64.0, -31.9, -1.0, 0.0, 1.0, 31.9, 64.0, 65.0])
        k = np.asarray(quantize.deadzone_quantize(x, 32))
        np.testing.assert_array_equal(k, [-2, -2, 0, 0, 0, 0, 0, 2, 2])

    def test_dequantize(self):
        k = jnp.asarray([-2, 0, 3])
        y = np.asarray(quantize.deadzone_dequantize(k, 32))
        np.testing.assert_array_equal(y, [-64.0, 0.0, 96.0])

    def test_deadzone_is_double_width(self):
        # values in (-qss, qss) all map to 0
        x = jnp.arange(-31, 32).astype(jnp.float32)
        k = np.asarray(quantize.deadzone_quantize(x, 32))
        assert (k == 0).all()


class TestLloydMax:
    def test_levels_count(self):
        assert quantize.lloydmax_levels(32, -2048, 2047) == 128
        assert quantize.lloydmax_levels(1, 0, 255) == 256

    def test_roundtrip_improves_with_training(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.normal(0, 50, (64, 64, 3)).astype(np.float32)
        )
        levels = quantize.lloydmax_train(x.astype(jnp.int32), qss=64, q_min=-256, q_max=255)
        k = quantize.lloydmax_quantize(x, levels)
        y = quantize.lloydmax_dequantize(k, levels)
        err_lm = float(jnp.mean((y - x) ** 2))
        # against uniform quantizer at same level count
        k_u = quantize.deadzone_quantize(x, 64)
        y_u = quantize.deadzone_dequantize(k_u, 64)
        err_u = float(jnp.mean((y_u - x) ** 2))
        assert err_lm < err_u

    def test_indexes_in_range(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 50, (32, 32, 3)).astype(np.float32))
        levels = quantize.lloydmax_train(x.astype(jnp.int32), qss=32, q_min=-256, q_max=255)
        k = np.asarray(quantize.lloydmax_quantize(x, levels))
        assert k.min() >= 0 and k.max() < levels.shape[1]


class TestVQ:
    def test_kmeans_clusters_separable_data(self):
        rng = np.random.default_rng(0)
        a = rng.normal((0, 0), 0.1, (100, 2))
        b = rng.normal((10, 10), 0.1, (100, 2))
        x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
        centers, labels = vq.kmeans(jax.random.PRNGKey(0), x, 2, iters=10)
        centers = np.asarray(centers)
        labels = np.asarray(labels)
        # one centroid near each cluster; energy-sorted so (0,0) first
        assert np.allclose(centers[0], [0, 0], atol=0.5)
        assert np.allclose(centers[1], [10, 10], atol=0.5)
        assert (labels[:100] == 0).all() and (labels[100:] == 1).all()

    def test_blocks_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(16, 24, 3)).astype(np.float32))
        blocks = vq.image_to_blocks(x, 4)
        assert blocks.shape == (4 * 6, 48)
        rec = vq.blocks_to_image(blocks, 16, 24, 4, 3)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))
