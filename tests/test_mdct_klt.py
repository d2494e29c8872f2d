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
