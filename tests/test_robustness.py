"""Robustness: corrupted/malformed streams must raise, not return
garbage (the reference swallows corruption, e.g. CBAAC returns a 10x10
zero image, src/CBAAC.py:99-103 — SURVEY §7.3 lists that as a quirk
NOT to reproduce)."""

import numpy as np
import pytest

from vcf_tpu import Codec, CodecConfig, CodeStream
from vcf_tpu.codestream import PAYLOAD


class TestContainer:
    def test_bad_magic(self):
        with pytest.raises(ValueError, match="not a vcf_tpu codestream"):
            CodeStream.from_bytes(b"XXXX" + b"\x00" * 32)

    def test_bad_version(self):
        cs = CodeStream()
        cs.payload = b"x"
        blob = bytearray(cs.to_bytes())
        blob[4] = 99  # version field
        with pytest.raises(ValueError, match="unsupported codestream version"):
            CodeStream.from_bytes(bytes(blob))

    def test_segment_type_check(self):
        cs = CodeStream()
        with pytest.raises(TypeError):
            cs["x"] = 123  # not bytes

    def test_missing_payload(self):
        cs = CodeStream()
        with pytest.raises(KeyError):
            _ = cs.payload


class TestEntropyValidation:
    def test_entropy_rejects_float(self):
        from vcf_tpu.entropy import get

        with pytest.raises(TypeError, match="uint8/uint16"):
            get("huffman").encode(np.zeros((4, 4), np.float32))

    def test_png_rejects_garbage(self):
        from vcf_tpu.entropy.png import read_png

        with pytest.raises(ValueError, match="not a PNG"):
            read_png(b"garbage bytes here")

    def test_tiff_rejects_garbage(self):
        from vcf_tpu.entropy.tiff import read_tiff

        with pytest.raises(ValueError, match="not a TIFF"):
            read_tiff(b"garbage bytes here")

    def test_truncated_huffman_raises(self, img_small):
        cfg = CodecConfig(entropy="huffman", qss=32)
        cs = Codec(cfg).encode(img_small)
        cs2 = CodeStream.from_bytes(cs.to_bytes())
        cs2[PAYLOAD] = cs2.payload[: len(cs2.payload) // 4]  # truncate
        with pytest.raises(Exception):
            Codec(cfg).decode(cs2)


class TestDecodeSideValidation:
    def test_missing_sidecar_raises(self, img_small):
        cfg = CodecConfig(entropy="huffman", qss=32)
        cs = Codec(cfg).encode(img_small)
        stripped = CodeStream()
        stripped.payload = cs.payload  # drop huffman_tree + shape
        with pytest.raises(Exception):
            Codec(cfg).decode(stripped)


class TestRANSStreamValidation:
    """Truncation/corruption on the r4 stream families must raise or
    produce a detectable mismatch, never crash the process."""

    def test_truncated_grans_payload_raises_or_differs(self, img_small):
        cfg = CodecConfig(entropy="grans", qss=32)
        cs = Codec(cfg).encode(img_small)
        cs2 = CodeStream.from_bytes(cs.to_bytes())
        cs2[PAYLOAD] = cs2.payload[: max(2, len(cs2.payload) // 4)]
        try:
            out = Codec(cfg).decode(cs2)
            # n_words in the sidecar exceeds the payload: frombuffer
            # must have raised; if a decoder ever pads instead, the
            # reconstruction must not silently equal the original
            ok = np.array_equal(out, Codec(cfg).decode(cs))
            assert not ok
        except Exception:
            pass

    def test_missing_grans_model_raises(self, img_small):
        cfg = CodecConfig(entropy="grans", qss=32)
        cs = Codec(cfg).encode(img_small)
        stripped = CodeStream()
        stripped.payload = cs.payload
        with pytest.raises(Exception):
            Codec(cfg).decode(stripped)

    def test_corrupt_cgrans_sidecar_raises(self):
        from vcf_tpu.entropy.rans import CtxRANSCodec

        rng = np.random.default_rng(6)
        runs = np.repeat(rng.integers(120, 137, size=(3, 512)), 64,
                         axis=1)[:, :24576]
        planes = runs.reshape(3, 128, 192).transpose(1, 2, 0)[None].astype(
            np.uint8)
        c = CtxRANSCodec()
        c.MIN_SYMBOLS = 0
        p, s = c.encode(planes)
        blob = bytearray(s["cgrans_model"])
        blob[5:9] = (10 ** 9).to_bytes(4, "little")   # absurd lane count
        with pytest.raises(Exception):
            c.decode(p, {"cgrans_model": bytes(blob)})


class TestGdwtStreamValidation:
    """Truncation/corruption on the r5 DWT device-entropy format must
    raise or produce a detectable mismatch, never crash the process."""

    def _stream(self, entropy="grans"):
        from vcf_tpu.io import test_image as make_img

        img = make_img(128, 96, seed=3)
        cfg = CodecConfig(spatial="dwt", qss=16, dwt_levels=2,
                          entropy=entropy)
        return img, cfg, Codec(cfg).encode(img)

    def test_truncated_words_raises_or_differs(self):
        img, cfg, cs = self._stream()
        cs2 = CodeStream.from_bytes(cs.to_bytes())
        cs2["gdwt_words"] = cs2["gdwt_words"][: max(
            2, len(cs2["gdwt_words"]) // 4)]
        try:
            out = Codec(cfg).decode(cs2)
            assert not np.array_equal(out, Codec(cfg).decode(cs))
        except Exception:
            pass

    def test_missing_model_raises(self):
        img, cfg, cs = self._stream()
        cs2 = CodeStream.from_bytes(cs.to_bytes())
        del cs2._segments["gdwt_model"]
        with pytest.raises(Exception):
            Codec(cfg).decode(cs2)

    def test_bad_model_version_raises(self):
        img, cfg, cs = self._stream()
        cs2 = CodeStream.from_bytes(cs.to_bytes())
        blob = bytearray(cs2["gdwt_model"])
        blob[0] = 99
        cs2["gdwt_model"] = bytes(blob)
        with pytest.raises(Exception):
            Codec(cfg).decode(cs2)
