"""Block 2D DCT and subband reordering (device-side).

Capabilities of the reference's `DCT2D.block_DCT` package
(`analyze_image`, `synthesize_image`, `get_subbands`, `get_blocks`;
used at src/2D-DCT.py:17-20): per-channel block-wise orthonormal 2D
DCT-II, and a permutation that gathers coefficient (u, v) of every
block into subband (u, v).

TPU-first design: the separable 2D DCT of all blocks at once is two
batched matmuls with the BxB orthonormal DCT matrix — this keeps the
work on the MXU with static shapes.  The subband permutation is a pure
reshape/transpose, which XLA fuses into the surrounding copy.

Layout conventions (channel-last images `(H, W, C)`, H and W already
multiples of the block size B):

    blocks view      : (H//B, B, W//B, B, C)
    subband layout   : out[u*(H//B)+by, v*(W//B)+bx, c]
                         = coeff[by*B+u, bx*B+v, c]
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix D: y = D @ x transforms one length-n signal."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] /= np.sqrt(2.0)
    return m.astype(np.float32)


def _to_blocks(img: jnp.ndarray, b: int) -> jnp.ndarray:
    h, w, c = img.shape
    return img.reshape(h // b, b, w // b, b, c)


def _from_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    nby, b, nbx, b2, c = blocks.shape
    return blocks.reshape(nby * b, nbx * b2, c)


def analyze(img: jnp.ndarray, b: int) -> jnp.ndarray:
    """Blockwise forward 2D DCT-II of a (H, W, C) image; H, W % b == 0.

    Equivalent of DCT2D.block_DCT.analyze_image (src/2D-DCT.py:303).
    """
    d = jnp.asarray(dct_matrix(b))
    x = _to_blocks(img.astype(jnp.float32), b)
    # rows: contract the first intra-block axis; cols: the second.
    y = jnp.einsum("ur,yrxsc->yuxsc", d, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("vs,yuxsc->yuxvc", d, y, precision=jax.lax.Precision.HIGHEST)
    return _from_blocks(y)


def synthesize(coeff: jnp.ndarray, b: int) -> jnp.ndarray:
    """Blockwise inverse 2D DCT (transpose of `analyze`)."""
    d = jnp.asarray(dct_matrix(b))
    y = _to_blocks(coeff.astype(jnp.float32), b)
    x = jnp.einsum("ur,yuxvc->yrxvc", d, y, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("vs,yrxvc->yrxsc", d, x, precision=jax.lax.Precision.HIGHEST)
    return _from_blocks(x)


def to_subbands(coeff: jnp.ndarray, b: int) -> jnp.ndarray:
    """Gather coefficient (u, v) of all blocks into subband (u, v)
    (equivalent of DCT2D.block_DCT.get_subbands, src/2D-DCT.py:333-336)."""
    h, w, c = coeff.shape
    x = coeff.reshape(h // b, b, w // b, b, c)          # (by, u, bx, v, c)
    x = x.transpose(1, 0, 3, 2, 4)                       # (u, by, v, bx, c)
    return x.reshape(h, w, c)


def from_subbands(sub: jnp.ndarray, b: int) -> jnp.ndarray:
    """Inverse of `to_subbands` (equivalent of get_blocks)."""
    h, w, c = sub.shape
    x = sub.reshape(b, h // b, b, w // b, c)             # (u, by, v, bx, c)
    x = x.transpose(1, 0, 3, 2, 4)                       # (by, u, bx, v, c)
    return x.reshape(h, w, c)


# ---------------------------------------------------------------------------
# Padding (reference: src/2D-DCT.py:187-229 pad_and_center_to_multiple_of_
# block_size / remove_padding — centered zero pad, extra to bottom/right).
# ---------------------------------------------------------------------------

def padded_shape(shape, b: int):
    h, w = shape[0], shape[1]
    return (-(-h // b) * b, -(-w // b) * b) + tuple(shape[2:])


def pad_centered(img: jnp.ndarray, b: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    th, tw = -(-h // b) * b, -(-w // b) * b
    ph, pw = th - h, tw - w
    pads = [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)]
    pads += [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, pads)


def unpad_centered(img: jnp.ndarray, original_shape) -> jnp.ndarray:
    h, w = original_shape[0], original_shape[1]
    ph, pw = img.shape[0] - h, img.shape[1] - w
    top, left = ph // 2, pw // 2
    return img[top : top + h, left : left + w]


# ---------------------------------------------------------------------------
# Perceptual (JPEG-table) coefficient pre-scaling (reference:
# src/2D-DCT.py:63-90 tables, :313-327 apply).  Coefficients are *scaled*
# before quantization by table/max(table) per channel class and unscaled on
# decode.  Tables are resized to BxB with area/linear interpolation.
# ---------------------------------------------------------------------------

JPEG_LUMA_QT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
JPEG_CHROMA_QT = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


@functools.lru_cache(maxsize=None)
def perceptual_tables(b: int):
    """(luma, chroma) BxB scale tables in [~0.08, 1].  The reference resizes
    the uint8 JPEG tables with cv2 (INTER_AREA if b<8 else INTER_LINEAR) and
    divides by the max entry (121 luma / 99 chroma); we reproduce the resize
    with an equivalent area/bilinear resampler to avoid a cv2 dependency on
    the device path."""
    import cv2  # available in this environment; host-side, cached

    inter = cv2.INTER_AREA if b < 8 else cv2.INTER_LINEAR
    luma = cv2.resize(JPEG_LUMA_QT.astype(np.uint8), (b, b), interpolation=inter)
    chroma = cv2.resize(JPEG_CHROMA_QT.astype(np.uint8), (b, b), interpolation=inter)
    luma = luma.astype(np.float32) / 121.0
    chroma = chroma.astype(np.float32) / 99.0
    return luma, chroma


def perceptual_scale(coeff: jnp.ndarray, b: int, inverse: bool = False) -> jnp.ndarray:
    """Multiply (or divide) block-layout coefficients by the per-frequency
    perceptual tables; channel 0 uses the luma table, channels 1-2 chroma."""
    luma, chroma = perceptual_tables(b)
    table = jnp.stack(
        [jnp.asarray(luma), jnp.asarray(chroma), jnp.asarray(chroma)], axis=-1
    )  # (b, b, 3)
    h, w, c = coeff.shape
    x = coeff.reshape(h // b, b, w // b, b, c)
    t = table[None, :, None, :, :]
    x = x / t if inverse else x * t
    return x.reshape(h, w, c)
