"""Decode-side denoising filters (device-side JAX).

Capability parity with the reference's L3 filter layer:
  * gaussian  — cv2.GaussianBlur(img, (s, s), 0)    (src/gaussian_blur.py:56)
  * nlm       — cv2.fastNlMeansDenoisingColored     (src/NLM.py:50-53)
  * bm3d      — bm3d_rgb(img/255, sigma/255)        (src/BM3D.py:42-54)

TPU-first implementations: Gaussian blur is a separable depthwise
convolution; NLM is vectorized over the search window as a sum of
shifted-patch distances (one fused XLA program, no per-pixel loops);
BM3D is approximated by a two-stage collaborative shrinkage: a DCT
hard-threshold pass followed by an NLM-weighted Wiener-like pass — a
documented approximation (the reference's exact BM3D binary package is
not reproducible bit-for-bit; SURVEY §2.3 allows "JAX BM3D ... or
documented approximation").
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from vcf_tpu.ops import dct as dct_ops


def gaussian_kernel_1d(size: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics: sigma<=0 -> 0.3*((size-1)*0.5-1)+0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("size",))
def gaussian_blur(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable Gaussian blur with reflect-101 borders (cv2 default)."""
    k = jnp.asarray(gaussian_kernel_1d(size))
    x = img.astype(jnp.float32)
    pad = size // 2
    # rows
    xp = jnp.pad(x, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
    idx = jnp.arange(x.shape[0])[:, None] + jnp.arange(size)[None, :]
    x = jnp.einsum("s,hswc->hwc", k, xp[idx])
    # cols
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    idx = jnp.arange(x.shape[1])[:, None] + jnp.arange(size)[None, :]
    x = jnp.einsum("s,hwsc->hwc", k, xp[:, idx])
    return x


@functools.partial(jax.jit, static_argnames=("template", "search"))
def nlm(img: jnp.ndarray, h: float, template: int = 7, search: int = 21) -> jnp.ndarray:
    """Non-local means, vectorized over the search window.

    For every offset d in the search window, the patch distance field is
    a box filter of the squared pixel difference between the image and
    its shifted copy; weights are exp(-dist / h^2).  This evaluates all
    offsets as one big elementwise program — HBM-bandwidth bound, no
    gathers.
    """
    x = img.astype(jnp.float32)
    hh, ww, c = x.shape
    t_rad = template // 2
    s_rad = search // 2
    pad = s_rad + t_rad
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")

    box = jnp.ones((template, template, 1, 1), jnp.float32) / (template * template)

    def box_filter(v):
        # v: (H+2t, W+2t, C) -> valid box mean (H, W, C)
        return jax.lax.conv_general_dilated(
            v[None], box, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=1,
        )[0]

    offsets = [
        (dy, dx)
        for dy in range(-s_rad, s_rad + 1)
        for dx in range(-s_rad, s_rad + 1)
    ]

    center = xp[pad : pad + hh, pad : pad + ww]
    num = jnp.zeros_like(x)
    den = jnp.zeros((hh, ww, 1), jnp.float32)
    h2 = h * h
    for dy, dx in offsets:
        shifted_ext = xp[
            pad + dy - t_rad : pad + dy + hh + t_rad,
            pad + dx - t_rad : pad + dx + ww + t_rad,
        ]
        center_ext = xp[pad - t_rad : pad + hh + t_rad, pad - t_rad : pad + ww + t_rad]
        d2 = box_filter(jnp.mean((shifted_ext - center_ext) ** 2, axis=-1, keepdims=True))
        wgt = jnp.exp(-d2 / h2)
        num = num + wgt * xp[pad + dy : pad + dy + hh, pad + dx : pad + dx + ww]
        den = den + wgt
    return num / den


def bm3d_approx(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Two-stage BM3D-flavored shrinkage (documented approximation):
    stage 1 = blockwise DCT hard-thresholding at 2.7*sigma;
    stage 2 = NLM pass guided by the stage-1 estimate."""
    x = img.astype(jnp.float32)
    b = 8
    padded = dct_ops.pad_centered(x, b)
    coeff = dct_ops.analyze(padded, b)
    thresh = 2.7 * sigma
    # keep DC intact per block
    h, w, c = coeff.shape
    blocks = coeff.reshape(h // b, b, w // b, b, c)
    mask = jnp.abs(blocks) >= thresh
    mask = mask.at[:, 0, :, 0, :].set(True)
    blocks = jnp.where(mask, blocks, 0.0)
    est = dct_ops.synthesize(blocks.reshape(h, w, c), b)
    est = dct_ops.unpad_centered(est, x.shape)
    out = nlm(est, h=max(sigma * 0.6, 1.0), template=7, search=11)
    return out


def get(config):
    """Return a host-callable filter fn(uint8 image) -> uint8 image."""
    name = config.filter

    if name == "gaussian":
        size = config.filter_size

        def run(img):
            out = gaussian_blur(jnp.asarray(img), size)
            return np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)

        return run
    if name == "nlm":
        h, t, s = config.nlm_h, config.nlm_template, config.nlm_search

        def run(img):
            out = nlm(jnp.asarray(img), h, t, s)
            return np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)

        return run
    if name == "bm3d":
        sigma = config.bm3d_sigma

        def run(img):
            out = bm3d_approx(jnp.asarray(img), sigma)
            return np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)

        return run
    raise ValueError(f"unknown filter {name!r}")
