"""Entropy codec round-trip tests (lossless by definition)."""

import numpy as np
import pytest

from vcf_tpu import entropy
from vcf_tpu import native


def _random_image(dtype, shape=(37, 53, 3), seed=0, peak=None):
    rng = np.random.default_rng(seed)
    peak = peak or (255 if dtype == np.uint8 else 4095)
    # correlated data so compressors actually compress
    base = rng.integers(0, peak + 1, shape).astype(np.int64)
    smooth = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    return smooth.astype(dtype)


ALL_CODECS = ["zlib", "pnm", "png", "tiff", "huffman", "cbahc", "cbaac"]


@pytest.mark.parametrize("name", ALL_CODECS)
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_roundtrip(name, dtype):
    codec = entropy.get(name)
    arr = _random_image(dtype)
    payload, side = codec.encode(arr)
    rec = codec.decode(payload, side)
    np.testing.assert_array_equal(rec, arr)
    assert rec.dtype == arr.dtype


@pytest.mark.parametrize("name", ["zlib", "png", "tiff", "huffman"])
def test_compresses_smooth_data(name):
    codec = entropy.get(name)
    arr = np.tile(np.arange(64, dtype=np.uint8), (64, 4)).reshape(64, 256)
    arr = np.stack([arr] * 3, axis=-1)
    payload, side = codec.encode(arr)
    total = len(payload) + sum(len(v) for v in side.values())
    assert total < arr.nbytes * 0.8


def test_huffman_single_symbol():
    codec = entropy.get("huffman")
    arr = np.zeros((16, 16), dtype=np.uint8)
    payload, side = codec.encode(arr)
    rec = codec.decode(payload, side)
    np.testing.assert_array_equal(rec, arr)


def test_huffman_python_native_agree():
    """Python fallback and native runtime produce identical streams."""
    if not native.available():
        pytest.skip("native runtime unavailable")
    from vcf_tpu.entropy import huffman as h

    arr = _random_image(np.uint8, (31, 17, 3), seed=4)
    flat = arr.reshape(-1)
    counts = np.bincount(flat, minlength=256)
    lengths = h.code_lengths_from_counts(counts, h.MAX_CODE_LEN_U8)
    codes = h.canonical_codes(lengths)
    py_payload = h.pack_chunked(flat, codes, lengths)
    nat_payload = native.huffman_encode8(flat, lengths, h.CHUNK_SYMS)
    assert py_payload == nat_payload
    py_dec = h.unpack_chunked(nat_payload, flat.size, lengths)
    nat_dec = native.huffman_decode8(py_payload, flat.size, lengths)
    np.testing.assert_array_equal(py_dec, flat)
    np.testing.assert_array_equal(nat_dec, flat)
    # uint16 single-stream path
    arr16 = _random_image(np.uint16, (13, 9, 3), seed=7)
    flat16 = arr16.reshape(-1)
    counts16 = np.bincount(flat16, minlength=65536)
    lengths16 = h.code_lengths_from_counts(counts16, h.MAX_CODE_LEN_U16)
    codes16 = h.canonical_codes(lengths16)
    py16 = h.pack_codes(flat16, codes16, lengths16)
    nat16 = native.huffman_encode(flat16, codes16, lengths16)
    assert py16 == nat16
    np.testing.assert_array_equal(
        native.huffman_decode(py16, flat16.size, lengths16), flat16
    )


def test_cbaac_python_native_agree():
    if not native.available():
        pytest.skip("native runtime unavailable")
    from vcf_tpu.entropy import cbaac

    data = _random_image(np.uint8, (16, 16), seed=5).reshape(-1)
    for order in (0, 1, 2):
        py_stream = cbaac._py_rc_encode(data, order)
        nat_stream = native.rc_encode(data, order)
        assert py_stream == nat_stream, f"order {order}"
        np.testing.assert_array_equal(
            cbaac._py_rc_decode(nat_stream, data.size, order), data
        )
        np.testing.assert_array_equal(
            native.rc_decode(py_stream, data.size, order), data
        )


def test_cbahc_python_native_agree():
    if not native.available():
        pytest.skip("native runtime unavailable")
    from vcf_tpu.entropy import cbahc

    data = _random_image(np.uint8, (8, 8), seed=6).reshape(-1)
    for order in (0, 1):
        py_stream = cbahc._py_encode(data, order)
        nat_stream = native.cbahc_encode(data, order)
        assert py_stream == nat_stream, f"order {order}"
        np.testing.assert_array_equal(
            cbahc._py_decode(nat_stream, data.size, order), data
        )
        np.testing.assert_array_equal(
            native.cbahc_decode(py_stream, data.size, order), data
        )


def test_adaptive_coders_beat_raw_on_skewed_data():
    rng = np.random.default_rng(0)
    data = rng.choice(
        np.arange(8, dtype=np.uint8), p=[0.6, 0.2, 0.1, 0.04, 0.03, 0.02, 0.005, 0.005],
        size=(64, 64),
    )
    for name in ("cbaac", "cbahc", "huffman"):
        codec = entropy.get(name)
        payload, side = codec.encode(data)
        total = len(payload) + sum(len(v) for v in side.values())
        assert total < data.nbytes * 0.5, name


def test_cbaac_tiled_roundtrip():
    from vcf_tpu.entropy.cbaac import CBAACCodec

    rng = np.random.default_rng(9)
    arr = _random_image(np.uint8, (64, 64, 3), seed=9)
    single = CBAACCodec(order=1, tiles=1)
    tiled = CBAACCodec(order=1, tiles=4)
    p1, _ = single.encode(arr)
    p4, _ = tiled.encode(arr)
    np.testing.assert_array_equal(tiled.decode(p4, {}), arr)
    np.testing.assert_array_equal(single.decode(p1, {}), arr)
    # tiling costs a little rate (per-tile model restart) but not much
    assert len(p4) < len(p1) * 1.2


class TestHuffmanRLE:
    """Zero-run extension (entropy/huffman.py rle_encode/rle_decode):
    sparse planes must beat the order-0 1-bit/symbol floor
    (src/Huffman.py:27-56 role; VERDICT r2 weak item 7)."""

    def test_rle_roundtrip_property(self):
        from vcf_tpu.entropy.huffman import rle_encode, rle_decode

        rng = np.random.default_rng(11)
        for density in (0.0, 0.02, 0.3, 0.97, 1.0):
            flat = np.where(rng.random(5000) < density,
                            rng.integers(0, 256, 5000),
                            128).astype(np.uint8)
            for z in (128, 0, int(flat[0])):
                ext = rle_encode(flat, z)
                out = rle_decode(ext.astype(np.int32), z, flat.size)
                np.testing.assert_array_equal(out, flat)

    def test_rle_edge_cases(self):
        from vcf_tpu.entropy.huffman import rle_encode, rle_decode

        for flat in (
            np.zeros(0, np.uint8),
            np.zeros(1 << 17, np.uint8),          # one run > 2^16
            np.full(7, 9, np.uint8),
            np.array([1, 2, 3], np.uint8),        # no runs at all
            np.array([0, 1, 0, 0, 1, 0], np.uint8),
        ):
            ext = rle_encode(flat, 0)
            np.testing.assert_array_equal(
                rle_decode(ext.astype(np.int32), 0, flat.size), flat)

    def test_sparse_plane_beats_one_bit_floor(self):
        rng = np.random.default_rng(12)
        n = 256 * 256
        flat = np.full(n, 128, np.uint8)
        hot = rng.choice(n, size=n // 20, replace=False)   # 95% zeros
        flat[hot] = rng.integers(0, 256, hot.size).astype(np.uint8)
        codec = entropy.get("huffman")
        payload, side = codec.encode(flat.reshape(256, 256))
        total_bits = 8 * (len(payload) + sum(len(v) for v in side.values()))
        # 5% uniform-random literals alone cost 0.4 bits/px; the plain
        # order-0 code rates 1.40 here — the run extension must land
        # well under the 1-bit/symbol floor
        assert total_bits / n < 1.0
        out = codec.decode(payload, side)
        np.testing.assert_array_equal(out.reshape(-1), flat)

    def test_dense_plane_keeps_plain_path(self):
        # near-uniform data must not regress through the RLE branch
        arr = _random_image(np.uint8, (64, 64), seed=13)
        codec = entropy.get("huffman")
        payload, side = codec.encode(arr)
        np.testing.assert_array_equal(codec.decode(payload, side), arr)


def test_cbahc_legacy_v1_stream_decodes():
    """Pre-r5 CBAHC streams (no sentinel, unframed payload) must keep
    decoding (review fix r5: the tiles byte was added with a 0xFF
    sentinel + version so the old <BBIB> header stays parseable)."""
    import struct
    from vcf_tpu.entropy.cbahc import CBAHCCodec, _encode_stream

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (24, 16), np.uint8)
    # hand-build a legacy stream: raw unframed payload + old header
    payload = _encode_stream(arr.reshape(-1), 1)
    meta = struct.pack(f"<BBIB{arr.ndim}I", 8, 1, len(payload),
                       arr.ndim, *arr.shape)
    out = CBAHCCodec(order=1).decode(payload, {"adaptive_huffman_tree": meta})
    np.testing.assert_array_equal(out, arr)
