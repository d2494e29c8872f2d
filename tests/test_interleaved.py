"""Interleaved multi-stream device Huffman tests (run on CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vcf_tpu.entropy import get
from vcf_tpu.entropy import interleaved as I
from vcf_tpu.entropy.huffman import canonical_codes, code_lengths_from_counts


def _skewed(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(128, 4, n).round(), 0, 255).astype(np.uint8)


class TestDeviceStreams:
    @pytest.mark.parametrize("n_streams,n", [(8, 1000), (64, 8192), (256, 100_000)])
    def test_roundtrip_exact(self, n_streams, n):
        data = _skewed(n)
        dh = I.DeviceHuffman(n_streams)
        packed, total_bits, lengths, meta = dh.encode(jnp.asarray(data))
        out = np.asarray(dh.decode(packed, lengths, meta))
        np.testing.assert_array_equal(out, data)

    def test_compresses(self):
        data = _skewed(200_000)
        dh = I.DeviceHuffman(64)
        packed, total_bits, lengths, meta = dh.encode(jnp.asarray(data))
        compressed_bytes = int(((np.asarray(total_bits) + 7) // 8).sum())
        assert compressed_bytes < data.nbytes * 0.6

    def test_matches_reference_bit_count(self):
        # per-stream bit total == sum of code lengths of its symbols
        data = _skewed(4096, seed=3)
        dh = I.DeviceHuffman(16)
        packed, total_bits, lengths, meta = dh.encode(jnp.asarray(data))
        l = meta["l"]
        padded = np.pad(data, (0, 16 * l - data.size))
        streams = padded.reshape(l, 16).T
        expect = lengths[streams].astype(np.int64).sum(axis=1)
        np.testing.assert_array_equal(np.asarray(total_bits), expect)

    def test_stream_bytes_match_scalar_packer(self):
        """Each interleaved stream must be bit-identical to the scalar
        canonical packer run on that stream's symbols."""
        from vcf_tpu.entropy.huffman import pack_codes

        data = _skewed(2048, seed=5)
        n_streams = 8
        dh = I.DeviceHuffman(n_streams)
        packed, total_bits, lengths, meta = dh.encode(jnp.asarray(data))
        codes = canonical_codes(lengths)
        l = meta["l"]
        padded = np.pad(data, (0, n_streams * l - data.size))
        streams = padded.reshape(l, n_streams).T
        packed_np = np.asarray(packed)
        for s in range(n_streams):
            expect = pack_codes(streams[s], codes, lengths)
            nb = (int(np.asarray(total_bits)[s]) + 7) // 8
            assert packed_np[s, :nb].tobytes() == expect


class TestCodecWrapper:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_roundtrip(self, dtype):
        rng = np.random.default_rng(1)
        peak = 255 if dtype == np.uint8 else 4095
        arr = rng.integers(0, peak + 1, (45, 37, 3)).astype(dtype)
        codec = get("ihuff")
        payload, side = codec.encode(arr)
        rec = codec.decode(payload, side)
        np.testing.assert_array_equal(rec, arr)
        assert rec.dtype == arr.dtype

    def test_pipeline_integration(self, img_small):
        from vcf_tpu import Codec, CodecConfig, metrics

        cfg = CodecConfig(entropy="ihuff", qss=32)
        cfg_z = CodecConfig(entropy="zlib", qss=32)
        rec = Codec(cfg).decode(Codec(cfg).encode(img_small))
        rec_z = Codec(cfg_z).decode(Codec(cfg_z).encode(img_small))
        np.testing.assert_array_equal(rec, rec_z)


class TestScanEmissionV2:
    def test_matches_scalar_packer(self):
        from vcf_tpu.entropy.huffman import pack_codes

        data = _skewed(50_000, seed=11)
        s_streams = 32
        l, padded = I.plan_streams(data.size, s_streams)
        flat = np.pad(data, (0, padded - data.size))
        syms = flat.reshape(l, s_streams).T
        counts = np.bincount(flat, minlength=256)
        lengths = code_lengths_from_counts(counts, I.MAX_LEN)
        codes = canonical_codes(lengths)
        slots, valid, total_bits = I.encode_streams_v2(
            jnp.asarray(syms),
            jnp.asarray(codes.astype(np.uint32)),
            jnp.asarray(lengths.astype(np.int32)),
        )
        streams = I.compact_slots_host(np.asarray(slots), np.asarray(valid))
        for s in range(s_streams):
            assert streams[s] == pack_codes(syms[s], codes, lengths), f"stream {s}"
        expect_bits = lengths[syms].astype(np.int64).sum(1)
        np.testing.assert_array_equal(np.asarray(total_bits), expect_bits)

    def test_lookup256(self):
        rng = np.random.default_rng(3)
        table = rng.integers(0, 1 << 19, 256).astype(np.int32)
        x = rng.integers(0, 256, (257, 3)).astype(np.uint8)
        out = np.asarray(I.lookup256(jnp.asarray(x), jnp.asarray(table)))
        np.testing.assert_array_equal(out, table[x])
