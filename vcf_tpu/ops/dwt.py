"""2D dyadic discrete wavelet transform (device-side).

Capability parity with the reference's 2D-DWT stage
(src/2D-DWT.py, backed by `DWT2D.color_dyadic_DWT` / PyWavelets):
multilevel per-channel dyadic decomposition with `-l` levels and `-w`
wavelet (default db5), per-subband quantization, and **each subband
written as its own codestream** — LL stored as uint16 (+128), detail
subbands as uint8 (+128) (src/2D-DWT.py:162-200).

TPU-first implementation.  PyWavelets is not available in this
environment, so the filter banks are constructed from scratch:

* `haar`, `dbN` (Daubechies, N=1..10) — orthonormal lowpass by
  spectral factorization of the Daubechies polynomial (minimum phase);
  validated by orthonormality and vanishing-moment tests
  (tests/test_dwt.py).
* `bior2.2` / `legall53` — the CDF 5/3 (JPEG2000) biorthogonal pair.

Boundary handling is periodization: subband sizes halve exactly at
every level and all shapes stay static under jit.  Analysis is
`sum_j h[j] * roll(x, -(j+shift))` downsampled by 2; synthesis is the
circular convolution of the zero-upsampled bands with the synthesis
filters at the phase that gives perfect reconstruction (for orthonormal
banks this is exactly the adjoint of the analysis operator).  Rolls and
adds are pure VPU/HBM work that XLA fuses per level.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vcf_tpu.codestream import CodeStream, PAYLOAD
from vcf_tpu.ops import color as color_ops
from vcf_tpu.ops import dct as dct_ops


# ---------------------------------------------------------------------------
# Filter construction
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def daubechies_lowpass(p: int) -> np.ndarray:
    """Orthonormal Daubechies lowpass filter of order p (length 2p).

    Spectral factorization: roots of the Daubechies half-band
    polynomial P(y) = sum_{k<p} C(p-1+k, k) y^k are mapped to z-roots
    of z + 1/z = 2 - 4y keeping |z| < 1 (minimum phase), then
    h(z) ~ (1+z)^p * prod(z - z_k), normalized to sum = sqrt(2).
    """
    if p == 1:
        return np.array([1.0, 1.0]) / math.sqrt(2.0)
    coeffs = [math.comb(p - 1 + k, k) for k in range(p)]
    yroots = np.roots(coeffs[::-1])
    zroots = []
    for y in yroots:
        bq = 2.0 - 4.0 * y
        disc = np.sqrt(bq * bq - 4.0 + 0j)
        z1, z2 = (bq + disc) / 2.0, (bq - disc) / 2.0
        zroots.append(z1 if abs(z1) < 1.0 else z2)
    poly = np.array([1.0 + 0j])
    for _ in range(p):
        poly = np.convolve(poly, [1.0, 1.0])
    for zk in zroots:
        poly = np.convolve(poly, [1.0, -zk])
    h = np.real(poly)
    h *= math.sqrt(2.0) / h.sum()
    return h


class Bank:
    """Analysis/synthesis filters + periodization phases (see
    tests/test_dwt.py for the perfect-reconstruction check)."""

    def __init__(self, dec_lo, dec_hi, rec_lo, rec_hi,
                 shift_lo=0, shift_hi=0, phase_lo=0, phase_hi=0):
        self.dec_lo = np.asarray(dec_lo, np.float32)
        self.dec_hi = np.asarray(dec_hi, np.float32)
        self.rec_lo = np.asarray(rec_lo, np.float32)
        self.rec_hi = np.asarray(rec_hi, np.float32)
        self.shift_lo, self.shift_hi = shift_lo, shift_hi
        self.phase_lo, self.phase_hi = phase_lo, phase_hi


@functools.lru_cache(maxsize=None)
def get_bank(name: str) -> Bank:
    if name == "haar":
        name = "db1"
    if name.startswith("db"):
        p = int(name[2:])
        h = daubechies_lowpass(p)
        g = np.array([(-1) ** k for k in range(len(h))]) * h[::-1]
        # orthonormal: synthesis = adjoint of analysis (same filters,
        # zero phases)
        return Bank(h, g, h, g)
    if name in ("bior2.2", "legall53"):
        s2 = math.sqrt(2.0)
        dec_lo = np.array([-1, 2, 6, 2, -1], np.float64) / 8.0 * s2
        dec_hi = np.array([-1, 2, -1], np.float64) / 2.0 / s2
        rec_lo = np.array([1, 2, 1], np.float64) / 2.0 / s2
        rec_hi = np.array([-1, -2, 6, -2, -1], np.float64) / 8.0 * s2
        # PR phases found analytically/numerically (tests/test_dwt.py)
        return Bank(dec_lo, dec_hi, rec_lo, rec_hi,
                    shift_lo=-2, shift_hi=0, phase_lo=-1, phase_hi=-1)
    raise ValueError(f"unknown wavelet {name!r}")


# ---------------------------------------------------------------------------
# Periodized single-axis filter bank
# ---------------------------------------------------------------------------

def _down_axis(x, filt: np.ndarray, shift: int, axis: int):
    """a[k] = sum_j f[j] * x[(2k + j + shift) mod n] along `axis`."""
    z = None
    for j, fj in enumerate(filt.tolist()):
        term = jnp.roll(x, -(j + shift), axis=axis) * fj
        z = term if z is None else z + term
    idx = jnp.arange(0, x.shape[axis], 2)
    return jnp.take(z, idx, axis=axis)


def _up_axis(a, filt: np.ndarray, phase: int, axis: int, n: int):
    """y[m] += sum_j f[j] * a_up[(m - j - phase) mod n], a_up[2k]=a[k]."""
    am = jnp.moveaxis(a, axis, 0)
    up = jnp.zeros((n,) + am.shape[1:], am.dtype).at[::2].set(am)
    up = jnp.moveaxis(up, 0, axis)
    y = None
    for j, fj in enumerate(filt.tolist()):
        term = jnp.roll(up, j + phase, axis=axis) * fj
        y = term if y is None else y + term
    return y


def analyze_level(x, bank: Bank):
    lo = _down_axis(x, bank.dec_lo, bank.shift_lo, 0)
    hi = _down_axis(x, bank.dec_hi, bank.shift_hi, 0)
    ll = _down_axis(lo, bank.dec_lo, bank.shift_lo, 1)
    lh = _down_axis(lo, bank.dec_hi, bank.shift_hi, 1)
    hl = _down_axis(hi, bank.dec_lo, bank.shift_lo, 1)
    hh = _down_axis(hi, bank.dec_hi, bank.shift_hi, 1)
    return ll, (lh, hl, hh)


def synthesize_level(ll, details, bank: Bank, out_hw):
    lh, hl, hh = details
    h_out, w_out = out_hw
    lo = (_up_axis(ll, bank.rec_lo, bank.phase_lo, 1, w_out)
          + _up_axis(lh, bank.rec_hi, bank.phase_hi, 1, w_out))
    hi = (_up_axis(hl, bank.rec_lo, bank.phase_lo, 1, w_out)
          + _up_axis(hh, bank.rec_hi, bank.phase_hi, 1, w_out))
    return (_up_axis(lo, bank.rec_lo, bank.phase_lo, 0, h_out)
            + _up_axis(hi, bank.rec_hi, bank.phase_hi, 0, h_out))


def analyze(x, wavelet: str, levels: int):
    """[LL_L, (LH,HL,HH)_L, ..., (LH,HL,HH)_1] like pywt.wavedec2 /
    the reference's list layout (src/2D-DWT.py:113-136)."""
    bank = get_bank(wavelet)
    details = []
    cur = x
    for _ in range(levels):
        cur, d = analyze_level(cur, bank)
        details.append(d)
    return [cur] + details[::-1]


def synthesize(decomp, wavelet: str):
    bank = get_bank(wavelet)
    cur = decomp[0]
    for details in decomp[1:]:
        out_hw = (details[0].shape[0] * 2, details[0].shape[1] * 2)
        cur = synthesize_level(cur, details, bank, out_hw)
    return cur


# ---------------------------------------------------------------------------
# Pipeline flow (invoked from vcf_tpu.pipeline.Codec)
# ---------------------------------------------------------------------------

class DWT:
    def __init__(self, wavelet: str, levels: int):
        self.wavelet = wavelet
        self.levels = levels
        self._analyze = jax.jit(
            functools.partial(analyze, wavelet=wavelet, levels=levels)
        )
        self._synthesize = jax.jit(functools.partial(synthesize, wavelet=wavelet))

    def subband_names(self) -> List[str]:
        """Coarsest-first, matching the reference's stream naming
        `{fn}_LL_{L}`, `{fn}_{LH|HL|HH}_{r}` (src/2D-DWT.py:162-200)."""
        names = [f"LL_{self.levels}"]
        for lvl in range(self.levels, 0, -1):
            names += [f"LH_{lvl}", f"HL_{lvl}", f"HH_{lvl}"]
        return names

    def flatten(self, decomp):
        flat = [decomp[0]]
        for d in decomp[1:]:
            flat.extend(d)
        return flat

    def unflatten(self, flat):
        decomp = [flat[0]]
        for i in range(self.levels):
            decomp.append(tuple(flat[1 + 3 * i : 4 + 3 * i]))
        return decomp

    def encode(self, codec, img: np.ndarray) -> CodeStream:
        cfg = codec.config
        fwd, _ = color_ops.get(cfg.color if cfg.color != "ycocg_r" else "ycocg")
        soff = codec.spatial_offset

        padded = dct_ops.pad_centered(
            jnp.asarray(img, jnp.float32), 1 << self.levels
        )
        ct = fwd(padded - soff)
        flat = self.flatten(self._analyze(ct))
        names = self.subband_names()

        cs = CodeStream()
        cs.put_shape(img.shape)
        for i, (name, band) in enumerate(zip(names, flat)):
            k, qside = codec._quantize(band)
            # LL as uint16, details as uint8, both +128 (src/2D-DWT.py:162-200)
            stored = (k + 128).astype(np.uint16 if i == 0 else np.uint8)
            payload, side = codec.entropy_codec.encode(stored)
            cs[name] = payload
            for sname, blob in side.items():
                cs[f"{name}.{sname}"] = blob
            for sname, arr in qside.items():
                cs.put_array(f"{name}.q_{sname}", arr)
        cs.put_json(PAYLOAD, {
            "subbands": names, "levels": self.levels, "wavelet": self.wavelet,
        })
        return cs

    def decode(self, codec, cs: CodeStream) -> np.ndarray:
        cfg = codec.config
        _, inv = color_ops.get(cfg.color if cfg.color != "ycocg_r" else "ycocg")
        soff = codec.spatial_offset

        meta = cs.get_json(PAYLOAD)
        names = meta["subbands"]
        shape = cs.get_shape()

        flat = []
        for name in names:
            side = {
                sname.split(".", 1)[1]: cs[sname]
                for sname in cs
                if sname.startswith(f"{name}.")
                and not sname.split(".", 1)[1].startswith("q_")
            }
            stored = codec.entropy_codec.decode(cs[name], side)
            qside = {
                sname.split(".q_", 1)[1]: cs.get_array(sname)
                for sname in cs
                if sname.startswith(f"{name}.q_")
            }
            k = stored.astype(np.int32)
            if stored.dtype == np.uint16:
                # undo the uint16 wrap of negative LL indexes
                k = np.where(k >= 32768, k - 65536, k)
            k = k - 128
            band = codec._dequantize(k, qside, k.shape)
            flat.append(jnp.asarray(band, jnp.float32))
        ct = self._synthesize(self.unflatten(flat))
        y = inv(ct) + soff
        y = dct_ops.unpad_centered(y, shape)
        return np.asarray(jnp.clip(jnp.round(y), 0, 255)).astype(np.uint8)
