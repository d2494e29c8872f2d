"""Container conformance: our self-contained TIFF/PNG writers and
readers interoperate with the independent readers/writers present in
this environment (cv2, imageio/PIL) — VERDICT r1 item 10.

The reference writes containers via tifffile/Pillow (src/TIFF.py:29,
src/PNG.py); conformance to the published formats is what makes our
streams drop-in replacements.
"""

import io

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import imageio.v3 as iio  # noqa: E402

from vcf_tpu.entropy.png import PNGCodec  # noqa: E402
from vcf_tpu.entropy.tiff import TIFFCodec  # noqa: E402
from vcf_tpu.io.images import test_image  # noqa: E402


def _imgs():
    rgb8 = test_image(45, 61, seed=9).astype(np.uint8)
    rng = np.random.default_rng(4)
    u16 = rng.integers(0, 65536, size=(23, 37), dtype=np.uint16)
    gray8 = rng.integers(0, 256, size=(19, 29), dtype=np.uint8)
    return rgb8, u16, gray8


class TestOursReadByIndependents:
    def test_png_rgb8_cv2_and_imageio(self):
        rgb8, _, _ = _imgs()
        payload, _ = PNGCodec().encode(rgb8)
        dec_cv = cv2.imdecode(np.frombuffer(payload, np.uint8),
                              cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(dec_cv[..., ::-1], rgb8)  # BGR
        dec_iio = iio.imread(payload, extension=".png")
        np.testing.assert_array_equal(dec_iio, rgb8)

    def test_png_gray16_cv2_and_imageio(self):
        _, u16, _ = _imgs()
        payload, _ = PNGCodec().encode(u16)
        dec_cv = cv2.imdecode(np.frombuffer(payload, np.uint8),
                              cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(dec_cv, u16)
        dec_iio = iio.imread(payload, extension=".png")
        np.testing.assert_array_equal(dec_iio, u16)

    def test_png_gray8_imageio(self):
        _, _, gray8 = _imgs()
        payload, _ = PNGCodec().encode(gray8)
        np.testing.assert_array_equal(
            iio.imread(payload, extension=".png"), gray8)

    def test_tiff_rgb8_cv2_and_imageio(self):
        rgb8, _, _ = _imgs()
        payload, _ = TIFFCodec().encode(rgb8)
        dec_cv = cv2.imdecode(np.frombuffer(payload, np.uint8),
                              cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(dec_cv[..., ::-1], rgb8)
        dec_iio = iio.imread(payload, extension=".tiff")
        np.testing.assert_array_equal(dec_iio, rgb8)

    def test_tiff_gray16_imageio(self):
        _, u16, _ = _imgs()
        payload, _ = TIFFCodec().encode(u16)
        dec_iio = iio.imread(payload, extension=".tiff")
        np.testing.assert_array_equal(dec_iio, u16)


class TestIndependentsReadByOurs:
    @pytest.mark.parametrize("arr_idx,ext", [(0, ".png"), (1, ".png"),
                                             (2, ".png")])
    def test_imageio_png_read_by_ours(self, arr_idx, ext):
        arr = _imgs()[arr_idx]
        payload = iio.imwrite("<bytes>", arr, extension=ext)
        dec = PNGCodec().decode(payload, {})
        np.testing.assert_array_equal(dec.squeeze(), arr.squeeze())

    def test_cv2_png_read_by_ours(self):
        rgb8, _, _ = _imgs()
        ok, buf = cv2.imencode(".png", rgb8[..., ::-1])
        assert ok
        dec = PNGCodec().decode(buf.tobytes(), {})
        np.testing.assert_array_equal(dec, rgb8)

    @pytest.mark.parametrize("arr_idx", [0, 1])
    def test_imageio_tiff_read_by_ours(self, arr_idx):
        arr = _imgs()[arr_idx]
        payload = iio.imwrite("<bytes>", arr, extension=".tiff")
        dec = TIFFCodec().decode(payload, {})
        np.testing.assert_array_equal(dec.squeeze(), arr.squeeze())

    def test_cv2_tiff_read_by_ours(self):
        rgb8, _, _ = _imgs()
        ok, buf = cv2.imencode(".tiff", rgb8[..., ::-1])
        assert ok
        dec = TIFFCodec().decode(buf.tobytes(), {})
        np.testing.assert_array_equal(dec, rgb8)
