"""Codec pipeline: explicit functional composition of the six stages.

The reference composes stages by dynamic class inheritance over argv
(SURVEY §1); here a `Codec` is built from a `CodecConfig` and compiles
the whole device path (color transform + spatial transform + quantizer)
into one jitted XLA program per image shape.  Entropy coding and
container serialization happen on the host.

Pipeline flows (mirroring the reference's layer entry points):

* entropy-only          (src/PNG.py, src/TIFF.py, ... `encode()`)
* quantize-only         (src/deadzone.py `encode()`)
* color + quantize      (src/YCoCg.py `encode()`, src/no_spatial_transform.py)
* spatial transform     (src/2D-DCT.py `encode_fn()` and friends)
* VQ / palette VQ       (src/VQ.py, src/color-VQ.py)

Decode runs the mirror image and finishes with the decode-side filter
hook (src/2D-DCT.py:461) before the final uint8 clip.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vcf_tpu import entropy
from vcf_tpu.codestream import CodeStream, PAYLOAD
from vcf_tpu.config import CodecConfig
from vcf_tpu.ops import color as color_ops
from vcf_tpu.ops import dct as dct_ops
from vcf_tpu.ops import quantize as q_ops
from vcf_tpu.ops import vq as vq_ops
from vcf_tpu.utils.timing import StageTimer, timed_stage


class Codec:
    """Still-image codec for one `CodecConfig`."""

    def __init__(self, config: CodecConfig):
        self.config = config
        self.entropy_codec = entropy.get(config.entropy, config)
        self._filter = None  # built lazily (decode-side only)
        #: per-stage wall times of the last encode/decode (SURVEY §5:
        #: first-class timing, absent in the reference)
        self.last_timings = None
        cfg = config

        # Spatial-domain offset: the reference subtracts 128 before the
        # spatial transform iff the quantizer is deadzone, and adds 128 to
        # the quantization indexes (src/2D-DCT.py:107-110,292,348).
        self.spatial_offset = 128 if cfg.quantizer == "deadzone" else 0
        # Per-channel offsets for no-spatial color pipelines
        # (src/YCoCg.py:28-31 etc.).
        self.color_offsets = color_ops.offsets(cfg.color, cfg.quantizer)

        self._build_device_fns()

    # ------------------------------------------------------------------
    # Device function construction
    # ------------------------------------------------------------------
    def _build_device_fns(self):
        cfg = self.config
        b = cfg.block_size
        fwd, inv = color_ops.get(cfg.color if cfg.color != "ycocg_r" else "ycocg")

        if cfg.spatial == "dct":
            soff = self.spatial_offset

            def analyze(img_u8):
                x = img_u8.astype(jnp.float32) - soff
                ct = fwd(x)
                coeff = dct_ops.analyze(ct, b)
                if cfg.perceptual:
                    coeff = dct_ops.perceptual_scale(coeff, b)
                if cfg.subbands:
                    coeff = dct_ops.to_subbands(coeff, b)
                return coeff

            def synthesize(coeff):
                if cfg.subbands:
                    coeff = dct_ops.from_subbands(coeff, b)
                if cfg.perceptual:
                    coeff = dct_ops.perceptual_scale(coeff, b, inverse=True)
                ct = dct_ops.synthesize(coeff, b)
                y = inv(ct) + soff
                return y

            self._analyze = jax.jit(analyze)
            self._synthesize = jax.jit(synthesize)
        elif cfg.spatial == "dwt":
            from vcf_tpu.ops import dwt as dwt_ops

            self._dwt = dwt_ops.DWT(cfg.wavelet, cfg.dwt_levels)
        elif cfg.spatial == "klt":
            from vcf_tpu.ops import klt as klt_ops

            self._klt = klt_ops
        elif cfg.spatial == "mdct":
            from vcf_tpu.ops import mdct as mdct_ops

            self._mdct = mdct_ops.MDCT(cfg.block_size)
        elif cfg.spatial == "lbt":
            from vcf_tpu.ops import lbt as lbt_ops

            self._lbt = lbt_ops

        # quantizer device fns (shared by flows that quantize a float image)
        if cfg.quantizer == "deadzone":
            self._q = jax.jit(functools.partial(q_ops.deadzone_quantize, qss=cfg.qss))
            self._dq = jax.jit(functools.partial(q_ops.deadzone_dequantize, qss=cfg.qss))
        elif cfg.quantizer == "lloydmax":
            self._lm_train = jax.jit(
                functools.partial(
                    q_ops.lloydmax_train, qss=cfg.qss, q_min=cfg.q_min, q_max=cfg.q_max
                )
            )
            self._q = jax.jit(q_ops.lloydmax_quantize)
            self._dq = jax.jit(q_ops.lloydmax_dequantize)

    # ------------------------------------------------------------------
    # Quantizer stage over a float decomposition (shared helper)
    # ------------------------------------------------------------------
    def _quantize(self, decom: jnp.ndarray) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        cfg = self.config
        if cfg.quantizer == "deadzone":
            return np.asarray(self._q(decom)), {}
        if cfg.quantizer == "lloydmax":
            levels = self._lm_train(jnp.round(decom).astype(jnp.int32))
            k = self._q(decom, levels)
            return np.asarray(k), {"levels": np.asarray(levels)}
        if cfg.quantizer == "vq":
            h, w, c = decom.shape
            bs = cfg.vq_block_size
            # pad to block multiple like the spatial path
            padded = dct_ops.pad_centered(decom, bs)
            blocks = vq_ops.image_to_blocks(padded, bs)
            key = jax.random.PRNGKey(cfg.seed)
            codebook, labels = vq_ops.kmeans(key, blocks, cfg.vq_clusters)
            lh, lw = padded.shape[0] // bs, padded.shape[1] // bs
            k = np.asarray(labels, dtype=np.int32).reshape(lh, lw)
            return k, {"codebook": np.asarray(codebook, dtype=np.float32)}
        if cfg.quantizer == "none":
            return np.asarray(jnp.round(decom).astype(jnp.int32)), {}
        raise ValueError(f"quantizer {cfg.quantizer} not usable in this flow")

    def _dequantize(
        self, k: np.ndarray, side: Dict[str, np.ndarray], decom_shape
    ) -> jnp.ndarray:
        cfg = self.config
        if cfg.quantizer == "deadzone":
            return self._dq(jnp.asarray(k))
        if cfg.quantizer == "lloydmax":
            return self._dq(jnp.asarray(k), jnp.asarray(side["levels"]))
        if cfg.quantizer == "vq":
            bs = cfg.vq_block_size
            codebook = jnp.asarray(side["codebook"])
            blocks = codebook[jnp.asarray(k.reshape(-1), dtype=jnp.int32)]
            ph, pw = dct_ops.padded_shape(decom_shape, bs)[:2]
            img = vq_ops.blocks_to_image(blocks, ph, pw, bs, decom_shape[2])
            return dct_ops.unpad_centered(img, decom_shape)
        if cfg.quantizer == "none":
            return jnp.asarray(k, dtype=jnp.float32)
        raise ValueError(f"quantizer {cfg.quantizer} not usable in this flow")

    # ------------------------------------------------------------------
    # Encode / decode entry points
    # ------------------------------------------------------------------
    def encode(self, img: np.ndarray) -> CodeStream:
        img = np.asarray(img)
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"expected (H, W, 3) image, got {img.shape}")
        cfg = self.config
        self.last_timings = StageTimer()
        if cfg.quantizer == "colorvq":
            return self._encode_colorvq(img)
        if cfg.spatial == "dct":
            return self._encode_spatial(img)
        if cfg.spatial in ("dwt", "klt", "mdct", "lbt"):
            return self._encode_spatial_ext(img)
        if cfg.color != "none":
            return self._encode_color(img)
        if cfg.quantizer != "none":
            return self._encode_quant(img)
        return self._encode_entropy_only(img)

    def decode(self, cs: CodeStream) -> np.ndarray:
        cfg = self.config
        self.last_timings = StageTimer()
        if cfg.quantizer == "colorvq":
            out = self._decode_colorvq(cs)
        elif cfg.spatial == "dct":
            out = self._decode_spatial(cs)
        elif cfg.spatial in ("dwt", "klt", "mdct", "lbt"):
            out = self._decode_spatial_ext(cs)
        elif cfg.color != "none":
            out = self._decode_color(cs)
        elif cfg.quantizer != "none":
            out = self._decode_quant(cs)
        else:
            out = self._decode_entropy_only(cs)
        return self._apply_filter(out)

    # ------------------------------------------------------------------
    # Flow: entropy only (src/PNG.py / src/TIFF.py encode/decode)
    # ------------------------------------------------------------------
    def _encode_entropy_only(self, img: np.ndarray) -> CodeStream:
        cs = CodeStream()
        payload, side = self.entropy_codec.encode(img.astype(np.uint8))
        cs[PAYLOAD] = payload
        for name, blob in side.items():
            cs[name] = blob
        return cs

    def _decode_entropy_only(self, cs: CodeStream) -> np.ndarray:
        side = {name: cs[name] for name in cs if name != PAYLOAD}
        return self.entropy_codec.decode(cs.payload, side)

    # ------------------------------------------------------------------
    # Flow: quantize only (src/deadzone.py encode/decode: int16 in,
    # uint8 indexes, y = k*qss out)
    # ------------------------------------------------------------------
    def _encode_quant(self, img: np.ndarray) -> CodeStream:
        decom = jnp.asarray(img, dtype=jnp.float32)
        k, qside = self._quantize(decom)
        cs = CodeStream()
        self._store_indexes(cs, k, qside, offset=0, dtype=np.uint8)
        cs.put_shape(img.shape)
        return cs

    def _decode_quant(self, cs: CodeStream) -> np.ndarray:
        shape = cs.get_shape()
        k, qside = self._load_indexes(cs, offset=0, signed=False)
        y = self._dequantize(k, qside, shape)
        return np.asarray(jnp.clip(jnp.round(y), 0, 255)).astype(np.uint8)

    # ------------------------------------------------------------------
    # Flow: color transform + quantize (src/YCoCg.py encode/decode)
    # ------------------------------------------------------------------
    def _encode_color(self, img: np.ndarray) -> CodeStream:
        cfg = self.config
        fwd, _ = color_ops.get(cfg.color)
        x = jnp.asarray(img, dtype=jnp.int16 if cfg.color == "ycocg_r" else jnp.float32)
        ct = fwd(x)
        ct = ct + jnp.asarray(self.color_offsets, dtype=ct.dtype)
        k, qside = self._quantize(ct.astype(jnp.float32))
        cs = CodeStream()
        # the reference casts these indexes to uint16 (src/YCoCg.py:53);
        # negative chroma indexes wrap and unwrap on decode
        self._store_indexes(cs, k, qside, offset=0, dtype=np.uint16)
        cs.put_shape(img.shape)
        return cs

    def _decode_color(self, cs: CodeStream) -> np.ndarray:
        cfg = self.config
        _, inv = color_ops.get(cfg.color)
        shape = cs.get_shape()
        k, qside = self._load_indexes(cs, offset=0, signed=True)
        ct = self._dequantize(k, qside, shape)
        ct = ct - jnp.asarray(self.color_offsets, dtype=ct.dtype)
        y = inv(ct)
        return np.asarray(jnp.clip(jnp.round(y), 0, 255)).astype(np.uint8)

    # ------------------------------------------------------------------
    # Flow: block-DCT spatial pipeline (src/2D-DCT.py encode_fn/decode_fn)
    # ------------------------------------------------------------------
    def _encode_spatial(self, img: np.ndarray) -> CodeStream:
        cfg = self.config
        b = cfg.block_size
        t = self.last_timings
        with timed_stage(t, "device:analyze+quantize"):
            padded = dct_ops.pad_centered(jnp.asarray(img, dtype=jnp.float32), b)
            decom = self._analyze(padded)
            k, qside = self._quantize(decom)
        cs = CodeStream()
        with timed_stage(t, "host:entropy"):
            self._store_indexes(cs, k, qside, offset=self.spatial_offset, dtype=np.uint8)
        cs.put_shape(img.shape)
        return cs

    def _decode_spatial(self, cs: CodeStream) -> np.ndarray:
        cfg = self.config
        t = self.last_timings
        shape = cs.get_shape()
        padded_shape = dct_ops.padded_shape(shape, cfg.block_size)
        with timed_stage(t, "host:entropy"):
            k, qside = self._load_indexes(cs, offset=self.spatial_offset, signed=True)
        with timed_stage(t, "device:dequantize+synthesize"):
            decom = self._dequantize(k, qside, padded_shape)
            y = self._synthesize(decom)
            y = dct_ops.unpad_centered(y, shape)
            out = np.asarray(jnp.clip(jnp.round(y), 0, 255)).astype(np.uint8)
        return out

    # ------------------------------------------------------------------
    # Flow: extended spatial transforms (dwt/klt/mdct/lbt) — implemented
    # in their ops modules; they reuse _quantize/_dequantize hooks.
    # ------------------------------------------------------------------
    def _encode_spatial_ext(self, img: np.ndarray) -> CodeStream:
        cfg = self.config
        if cfg.spatial == "dwt":
            return self._dwt.encode(self, img)
        if cfg.spatial == "klt":
            return self._klt.encode(self, img)
        if cfg.spatial == "mdct":
            return self._mdct.encode(self, img)
        if cfg.spatial == "lbt":
            return self._lbt.encode(self, img)
        raise NotImplementedError(cfg.spatial)

    def _decode_spatial_ext(self, cs: CodeStream) -> np.ndarray:
        cfg = self.config
        if cfg.spatial == "dwt":
            return self._dwt.decode(self, cs)
        if cfg.spatial == "klt":
            return self._klt.decode(self, cs)
        if cfg.spatial == "mdct":
            return self._mdct.decode(self, cs)
        if cfg.spatial == "lbt":
            return self._lbt.decode(self, cs)
        raise NotImplementedError(cfg.spatial)

    # ------------------------------------------------------------------
    # Flow: palette VQ (src/color-VQ.py — color transform + quantizer in one)
    # ------------------------------------------------------------------
    def _encode_colorvq(self, img: np.ndarray) -> CodeStream:
        cfg = self.config
        pixels = jnp.asarray(img, dtype=jnp.float32).reshape(-1, 3)
        key = jax.random.PRNGKey(cfg.seed)
        palette, labels = vq_ops.kmeans(key, pixels, cfg.colorvq_clusters)
        h, w, _ = img.shape
        k = np.asarray(labels, dtype=np.int32).reshape(h, w)
        dtype = np.uint8 if cfg.colorvq_clusters <= 256 else np.uint16
        cs = CodeStream()
        payload, side = self.entropy_codec.encode(k.astype(dtype))
        cs[PAYLOAD] = payload
        for name, blob in side.items():
            cs[name] = blob
        cs.put_array("centroids", np.asarray(palette, dtype=np.float32))
        cs.put_shape(img.shape)
        return cs

    def _decode_colorvq(self, cs: CodeStream) -> np.ndarray:
        side = {
            name: cs[name]
            for name in cs
            if name not in (PAYLOAD, "centroids", "shape")
        }
        k = self.entropy_codec.decode(cs.payload, side).astype(np.int32)
        palette = cs.get_array("centroids")
        out = palette[k.reshape(-1)].reshape(k.shape + (3,))
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    # ------------------------------------------------------------------
    # Index <-> entropy plumbing
    # ------------------------------------------------------------------
    def _store_indexes(
        self,
        cs: CodeStream,
        k: np.ndarray,
        qside: Dict[str, np.ndarray],
        offset: int,
        dtype,
    ) -> None:
        cfg = self.config
        if cfg.quantizer == "vq":
            stored = k.astype(np.uint16)  # label map (src/VQ.py labels uint16)
        elif cfg.quantizer == "deadzone" and dtype == np.uint8:
            # the reference constructs Deadzone_Quantizer(Q_step,
            # min_val=0, max_val=255) (src/deadzone.py:64): saturating
            # indexes CLAMP to the quantizer support, they do not wrap
            # through the uint8 cast (SURVEY §7.3 watch item)
            stored = np.clip(k + offset, 0, 255).astype(dtype)
        else:
            stored = (k + offset).astype(dtype)  # wraps like the reference casts
        payload, side = self.entropy_codec.encode(stored)
        cs[PAYLOAD] = payload
        for name, blob in side.items():
            cs[name] = blob
        for name, arr in qside.items():
            cs.put_array(f"q_{name}", arr)

    def _load_indexes(self, cs: CodeStream, offset: int, signed: bool):
        reserved = {PAYLOAD, "shape", "bopt"}
        side = {
            name: cs[name]
            for name in cs
            if name not in reserved and not name.startswith("q_")
        }
        stored = self.entropy_codec.decode(cs.payload, side)
        qside = {
            name[2:]: cs.get_array(name) for name in cs if name.startswith("q_")
        }
        cfg = self.config
        if cfg.quantizer == "vq":
            return stored.astype(np.int32), qside
        if signed and stored.dtype == np.uint16:
            # undo the uint16 wrap of negative indexes (src/YCoCg.py:53
            # casts to uint16; int16 view restores the sign)
            k = stored.astype(np.int32)
            k = np.where(k >= 32768, k - 65536, k) - offset
        else:
            k = stored.astype(np.int32) - offset
        return k, qside

    # ------------------------------------------------------------------
    # Decode-side filter hook (src/2D-DCT.py:461, src/no_filter.py,
    # src/gaussian_blur.py, src/NLM.py, src/BM3D.py)
    # ------------------------------------------------------------------
    def _apply_filter(self, img: np.ndarray) -> np.ndarray:
        cfg = self.config
        if cfg.filter == "none":
            return img
        if self._filter is None:
            from vcf_tpu.ops import filters

            self._filter = filters.get(cfg)
        return self._filter(img)
