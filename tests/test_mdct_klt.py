"""KLT and MDCT transform tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vcf_tpu import Codec, CodecConfig, CodeStream, metrics
from vcf_tpu.ops import klt, mdct


class TestKLT:
    def test_weights_orthonormal(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32))
        blocks = klt.channel_blocks(img, 4)
        w = np.asarray(klt.train_weights(blocks))
        for c in range(3):
            np.testing.assert_allclose(w[c] @ w[c].T, np.eye(16), atol=1e-4)

    def test_forward_inverse(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.normal(size=(32, 48, 3)).astype(np.float32))
        blocks = klt.channel_blocks(img, 8)
        w = klt.train_weights(blocks)
        rec = klt.inverse(klt.forward(blocks, w), w)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(blocks), atol=1e-3)

    def test_blocks_roundtrip(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.normal(size=(16, 24, 3)).astype(np.float32))
        blocks = klt.channel_blocks(img, 4)
        rec = klt.channel_unblocks(blocks, 16, 24, 4)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(img))

    def test_energy_compaction_beats_random(self):
        # KLT on correlated data concentrates variance in leading coeffs
        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:64, 0:64] / 64.0
        img = (
            np.sin(2 * np.pi * (xx + 0.5 * yy))[..., None] * 10
            + rng.normal(size=(64, 64, 1)) * 0.1
        )
        img3 = jnp.asarray(np.repeat(img, 3, axis=2).astype(np.float32))
        blocks = klt.channel_blocks(img3, 4)
        w = klt.train_weights(blocks)
        coeff = np.asarray(klt.forward(blocks, w))
        var = coeff[0].var(axis=0)
        assert var[0] > var[8:].mean() * 10

    def test_pipeline_roundtrip(self, img_small):
        cfg = CodecConfig(spatial="klt", qss=16, entropy="zlib")
        codec = Codec(cfg)
        cs = codec.encode(img_small)
        assert "weights" in cs
        rec = Codec(cfg).decode(CodeStream.from_bytes(cs.to_bytes()))
        assert metrics.rmse(img_small, rec) < 10.0


class TestMDCT:
    @pytest.mark.parametrize("n", [4, 8, 16])
    def test_tdac_1d(self, n):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 8, 1)).astype(np.float32))
        c = mdct.mdct_axis(x, n, 0)
        assert c.shape == (64 + n, 8, 1)
        rec = mdct.imdct_axis(c, n, 0, 64)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)

    def test_tdac_2d(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(48, 40, 3)).astype(np.float32))
        c = mdct.analyze(x, 8)
        assert c.shape == (56, 48, 3)
        rec = mdct.synthesize(c, 8, (48, 40))
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)

    def test_window_princen_bradley(self):
        n = 8
        t = np.arange(2 * n)
        w = np.sin(np.pi / (2 * n) * (t + 0.5))
        np.testing.assert_allclose(w**2 + np.roll(w, n) ** 2, 1.0, atol=1e-12)

    def test_pipeline_roundtrip(self, img_small):
        cfg = CodecConfig(spatial="mdct", qss=16, entropy="zlib")
        codec = Codec(cfg)
        cs = codec.encode(img_small)
        rec = Codec(cfg).decode(CodeStream.from_bytes(cs.to_bytes()))
        assert metrics.rmse(img_small, rec) < 10.0

    def test_mdct_smoother_than_dct_at_high_qss(self, img512):
        # lapped basis avoids blocking; both should round-trip reasonably
        cfg = CodecConfig(spatial="mdct", qss=64, entropy="zlib")
        rec = Codec(cfg).decode(Codec(cfg).encode(img512))
        assert metrics.rmse(img512, rec) < 25.0


class TestMDCTScale:
    """Range parity with the reference's empirical mdct_scale_factor
    (src/2D-MDCT.py:406-421, applied at :524 and re-multiplied :648)."""

    @staticmethod
    def _ref_mdct_analyze_1d(signal, n):
        """Transcription of the reference MDCT semantics
        (src/2D-MDCT.py:105-127,155-207): unnormalized cosine matrix over
        sine-windowed 50%-overlap blocks of a symmetric-extended signal;
        L inputs -> L coefficients."""
        l = len(signal)
        padded = np.pad(signal, (n, n), mode="symmetric")
        t = np.arange(2 * n)
        window = np.sin(np.pi * (t + 0.5) / (2 * n))
        n0 = (n + 1) / 2
        k = np.arange(n)
        cmat = np.cos(np.pi / n * (t[None, :] + n0) * (k[:, None] + 0.5))
        out = np.zeros(l)
        for bi in range(l // n):
            block = padded[bi * n : bi * n + 2 * n] * window
            out[bi * n : (bi + 1) * n] = cmat @ block
        return out

    def _ref_scaled_2d(self, img, n, quantizer):
        """Separable 2D reference MDCT divided by mdct_scale_factor —
        the reference's quantizer input (2D-MDCT.py:247-275,524)."""
        rows = np.stack([self._ref_mdct_analyze_1d(r, n) for r in img])
        cols = np.stack(
            [self._ref_mdct_analyze_1d(c, n) for c in rows.T]
        ).T
        return cols / mdct.mdct_scale_factor(n, quantizer)

    @pytest.mark.parametrize("n,quantizer", [(8, "deadzone"), (8, "lloydmax"),
                                             (16, "deadzone"), (32, "deadzone")])
    def test_quantizer_input_matches_reference_range(self, n, quantizer):
        rng = np.random.default_rng(7)
        h = w = 4 * n
        img = rng.normal(scale=40.0, size=(h, w)).astype(np.float64)
        ref = self._ref_scaled_2d(img, n, quantizer)
        ours = np.asarray(
            mdct.analyze(jnp.asarray(img[..., None], jnp.float32), n)
        )[..., 0] * mdct.coeff_scale(n, quantizer)
        # our transform emits one extra boundary frame per axis (exact
        # PR); the shared region [0:h, 0:w] covers identical frames
        np.testing.assert_allclose(ours[:h, :w], ref, rtol=2e-3, atol=0.5)

    def test_scale_factor_values(self):
        # documented factors (2D-MDCT.py:406-421)
        assert mdct.mdct_scale_factor(8, "lloydmax") == pytest.approx(8 / 1.5)
        assert mdct.mdct_scale_factor(8, "deadzone") == pytest.approx(4.0)
        assert mdct.mdct_scale_factor(32, "deadzone") == pytest.approx(8.0)
        assert mdct.mdct_scale_factor(16, "deadzone") == pytest.approx(
            4.0 + ((16 - 8) / 24) * 4.0)

    def test_rd_comparable_to_dct_at_default_flags(self, img512):
        # the point of the scale: MDCT path RD at default flags is in the
        # same regime as the DCT path (VERDICT r1 item 3)
        dct_cfg = CodecConfig(entropy="zlib")
        mdct_cfg = CodecConfig(spatial="mdct", entropy="zlib")
        rec_d = Codec(dct_cfg).decode(Codec(dct_cfg).encode(img512))
        cs_m = Codec(mdct_cfg).encode(img512)
        rec_m = Codec(mdct_cfg).decode(cs_m)
        rmse_d = metrics.rmse(img512, rec_d)
        rmse_m = metrics.rmse(img512, rec_m)
        assert rmse_m < 2.5 * rmse_d + 2.0
