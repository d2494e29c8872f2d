"""Interleaved rANS: butterfly routing, numpy/JAX equivalence, codec."""

import numpy as np
import jax.numpy as jnp
import pytest

from vcf_tpu.entropy import rans, get


def _skewed(shape, seed=0, sigma=4.0):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(128, sigma, shape).round(), 0, 255).astype(np.uint8)


class TestButterfly:
    @pytest.mark.parametrize("seed", range(5))
    def test_compact_expand_random(self, seed):
        rng = np.random.default_rng(seed)
        s = int(rng.choice([8, 17, 64, 300]))
        flags = rng.random(s) < rng.random()
        vals = rng.integers(0, 10000, s).astype(np.int32)
        out = np.asarray(rans.butterfly_compact(jnp.asarray(vals), jnp.asarray(flags)))
        c = int(flags.sum())
        np.testing.assert_array_equal(out[:c], vals[flags])
        chunk = rng.integers(0, 10000, s).astype(np.uint32)
        out2 = np.asarray(rans.butterfly_expand(jnp.asarray(chunk), jnp.asarray(flags)))
        expect = np.zeros(s, np.uint32)
        expect[np.nonzero(flags)[0]] = chunk[:c]
        np.testing.assert_array_equal(out2, expect)


class TestQuantizeFreqs:
    def test_sums_to_pow2(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            counts = rng.integers(0, 1000, 256)
            f = rans.quantize_freqs(counts)
            assert f.sum() == 1 << rans.K_PROB
            assert (f[counts > 0] >= 1).all()
            assert (f[counts == 0] == 0).all()

    def test_single_symbol(self):
        counts = np.zeros(256, np.int64)
        counts[7] = 100
        f = rans.quantize_freqs(counts)
        assert f[7] == 1 << rans.K_PROB


class TestNumpyReference:
    @pytest.mark.parametrize("s,l", [(1, 64), (8, 100), (32, 57)])
    def test_roundtrip(self, s, l):
        data = _skewed((s, l), seed=s)
        freqs = rans.quantize_freqs(np.bincount(data.reshape(-1), minlength=256))
        words, states = rans.np_encode(data, freqs)
        out = rans.np_decode(words, states, freqs, s, l)
        np.testing.assert_array_equal(out, data)


class TestJaxMatchesNumpy:
    @pytest.mark.parametrize("s,l", [(8, 64), (16, 123), (64, 50)])
    def test_encode_identical(self, s, l):
        data = _skewed((s, l), seed=l)
        freqs = rans.quantize_freqs(np.bincount(data.reshape(-1), minlength=256))
        cums = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.uint32)
        w_ref, st_ref = rans.np_encode(data, freqs)
        words, n_words, states = rans.jax_encode(
            jnp.asarray(data), jnp.asarray(freqs.astype(np.uint32)),
            jnp.asarray(cums),
        )
        n_words = int(n_words)
        assert n_words == w_ref.size
        np.testing.assert_array_equal(np.asarray(words)[:n_words], w_ref)
        np.testing.assert_array_equal(np.asarray(states), st_ref)

    @pytest.mark.parametrize("s,l", [(8, 64), (32, 77)])
    def test_decode_identical(self, s, l):
        data = _skewed((s, l), seed=7 * l)
        freqs = rans.quantize_freqs(np.bincount(data.reshape(-1), minlength=256))
        cums = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.uint32)
        words, states = rans.np_encode(data, freqs)
        wp = np.concatenate([words, np.zeros(s + 16, np.uint16)])
        out = rans.jax_decode(
            jnp.asarray(wp), jnp.int32(0), jnp.asarray(states),
            jnp.asarray(freqs.astype(np.uint32)), jnp.asarray(cums), l,
        )
        np.testing.assert_array_equal(np.asarray(out), data)


class TestRANSCodec:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_roundtrip(self, dtype):
        rng = np.random.default_rng(3)
        peak = 255 if dtype == np.uint8 else 4095
        arr = rng.integers(0, peak + 1, (45, 37, 3)).astype(dtype)
        codec = get("rans")
        payload, side = codec.encode(arr)
        rec = codec.decode(payload, side)
        np.testing.assert_array_equal(rec, arr)
        assert rec.dtype == arr.dtype

    def test_beats_huffman_on_skewed(self):
        data = _skewed((256, 256), seed=5, sigma=2.0)
        p_r, s_r = get("rans").encode(data)
        p_h, s_h = get("huffman").encode(data)
        total_r = len(p_r) + sum(len(v) for v in s_r.values())
        total_h = len(p_h) + sum(len(v) for v in s_h.values())
        # sub-bit-per-symbol coding: rANS beats Huffman's 1-bit floor
        assert total_r < total_h

    def test_pipeline_integration(self, img_small):
        from vcf_tpu import Codec, CodecConfig

        cfg = CodecConfig(entropy="rans", qss=32)
        cfg_z = CodecConfig(entropy="zlib", qss=32)
        rec = Codec(cfg).decode(Codec(cfg).encode(img_small))
        rec_z = Codec(cfg_z).decode(Codec(cfg_z).encode(img_small))
        np.testing.assert_array_equal(rec, rec_z)


class TestSparseRANS:
    def test_pack_unpack_flags(self):
        rng = np.random.default_rng(1)
        flags = rng.random(8 * 321) < 0.1
        packed = np.asarray(rans.pack_flags(jnp.asarray(flags)))
        np.testing.assert_array_equal(packed, np.packbits(flags))
        back = np.asarray(rans.unpack_flags(jnp.asarray(packed)))
        np.testing.assert_array_equal(back, flags)

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    @pytest.mark.parametrize("sparsity", [0.0, 0.5, 0.97, 1.0])
    def test_roundtrip(self, dtype, sparsity):
        rng = np.random.default_rng(9)
        peak = 255 if dtype == np.uint8 else 4095
        arr = rng.integers(1, peak + 1, (93, 41, 3)).astype(dtype)
        arr[rng.random(arr.shape) < sparsity] = 128
        codec = get("srans")
        payload, side = codec.encode(arr)
        rec = codec.decode(payload, side)
        np.testing.assert_array_equal(rec, arr)
        assert rec.dtype == arr.dtype

    def test_beats_dense_rans_on_sparse(self):
        # clustered sparsity, like subband-ordered DCT planes: the gain
        # comes from flag bytes capturing 8-neighbor correlation
        rng = np.random.default_rng(4)
        arr = np.full((512, 512), 128, np.uint8)
        hits = np.zeros(arr.shape, bool)
        hits[:128, :128] = rng.random((128, 128)) < 0.6
        arr[hits] = rng.integers(120, 137, hits.sum()).astype(np.uint8)
        size = {}
        for name in ("rans", "srans"):
            p, s = get(name).encode(arr)
            size[name] = len(p) + sum(len(v) for v in s.values())
        assert size["srans"] < size["rans"]

    def test_pipeline_integration(self, img_small):
        from vcf_tpu import Codec, CodecConfig

        cfg = CodecConfig(entropy="srans", qss=32)
        cfg_z = CodecConfig(entropy="zlib", qss=32)
        rec = Codec(cfg).decode(Codec(cfg).encode(img_small))
        rec_z = Codec(cfg_z).decode(Codec(cfg_z).encode(img_small))
        np.testing.assert_array_equal(rec, rec_z)
