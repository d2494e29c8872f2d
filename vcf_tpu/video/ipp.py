"""IPP hybrid video codec: GOP-structured I+P coding with block motion
compensation.

Capability parity with src/IPP_DCT.py: GOPs of `-G` frames, the first
intra-coded, the rest predicted from the *reconstructed* previous frame
(closed loop, :569-570); full-search or three-step block ME on luma
(:225-244, :159-204); MC residual shifted +128 and clipped to uint8
(:550-560); optional per-block intra/inter RDO on luma with a heuristic
rate model and lambda `-R` (:265-342, :441-544); MV field + mode maps +
per-frame metadata in the codestream (:663-687).

TPU-first redesign of the closed loop (SURVEY §7.3): the reference
round-trips every frame through temp PNG files and the full entropy
stack (encode_decode_proxy, :595-626); here the in-loop reconstruction
is transform -> quantize -> dequantize -> inverse entirely on device —
mathematically identical to entropy round-tripping, since entropy
coding is lossless — and the entropy stage packs the stored index
planes once at the end.  ME is the vectorized `ops.motion` search, not
a thread pool.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vcf_tpu.codestream import CodeStream, PAYLOAD
from vcf_tpu.config import CodecConfig, VideoConfig
from vcf_tpu.ops import color as color_ops
from vcf_tpu.ops import dct as dct_ops
from vcf_tpu.ops import motion
from vcf_tpu.ops import quantize as q_ops
from vcf_tpu import entropy


class IPPCodec:
    """Currently supports the dct + deadzone still pipeline in the loop
    (the reference's namesake IPP_DCT configuration); other spatial
    stages plug in once their fused device paths exist."""

    def __init__(self, video_config: VideoConfig, codec_config: CodecConfig):
        if codec_config.spatial != "dct" or codec_config.quantizer != "deadzone":
            raise NotImplementedError(
                "IPPCodec requires the dct+deadzone still pipeline"
            )
        self.vcfg = video_config
        self.ccfg = codec_config
        self.entropy_codec = entropy.get(codec_config.entropy, codec_config)
        self._build()

    def _build(self):
        cfg = self.ccfg
        b, qss = cfg.block_size, cfg.qss
        fwd, inv = color_ops.get(cfg.color if cfg.color != "ycocg_r" else "ycocg")

        def enc(img_f32):
            x = img_f32 - 128.0
            coeff = dct_ops.analyze(fwd(x), b)
            if cfg.subbands:
                coeff = dct_ops.to_subbands(coeff, b)
            k = q_ops.deadzone_quantize(coeff, qss)
            return (k + 128).astype(jnp.uint8)

        def dec(k_u8):
            k = k_u8.astype(jnp.int32) - 128
            coeff = q_ops.deadzone_dequantize(k, qss)
            if cfg.subbands:
                coeff = dct_ops.from_subbands(coeff, b)
            y = inv(dct_ops.synthesize(coeff, b)) + 128.0
            return jnp.clip(jnp.round(y), 0.0, 255.0)

        def intra_step(frame_u8):
            """I-frame: returns (index plane, reconstruction)."""
            k = enc(frame_u8.astype(jnp.float32))
            return k, dec(k)

        m, s = self.vcfg.me_block, self.vcfg.search_range

        def inter_step(ref_recon, frame_u8):
            """P-frame: ME on luma + MC residual coding.
            Returns (index plane, mv, recon)."""
            cur = frame_u8.astype(jnp.float32)
            ref_l = motion.to_luma(ref_recon.astype(jnp.uint8))
            cur_l = motion.to_luma(frame_u8)
            if self.vcfg.fast_search:
                mv, _ = motion.three_step_search(ref_l, cur_l, m, s)
            else:
                mv, _ = motion.full_search(ref_l, cur_l, m, s)
            pred = motion.compensate(ref_recon, mv, m, pad=max(s, 8))
            residual = jnp.clip(cur - pred + 128.0, 0.0, 255.0)
            k = enc(residual)
            res_rec = dec(k) - 128.0
            recon = jnp.clip(pred + res_rec, 0.0, 255.0)
            return k, mv, recon

        self._intra_step = jax.jit(intra_step)
        self._inter_step = jax.jit(inter_step)

        # RDO helpers (per-block intra/inter decision on luma,
        # src/IPP_DCT.py:265-342): cost = D + lambda*R with the rate
        # modeled as sum(log2(|k|+1)) + 1 bits per coefficient.
        d8 = jnp.asarray(dct_ops.dct_matrix(m))

        def block_cost(luma_blocks):
            """(nb, m, m) pixel blocks -> (distortion, rate) per block."""
            c = jnp.einsum("ur,nrs->nus", d8, luma_blocks,
                           precision=jax.lax.Precision.HIGHEST)
            c = jnp.einsum("vs,nus->nuv", d8, c,
                           precision=jax.lax.Precision.HIGHEST)
            k = q_ops.deadzone_quantize(c, qss)
            y = q_ops.deadzone_dequantize(k, qss)
            dist = jnp.sum((y - c) ** 2, axis=(1, 2))
            rate = jnp.sum(jnp.log2(jnp.abs(k).astype(jnp.float32) + 1.0) + 1.0,
                           axis=(1, 2))
            return dist, rate

        def rdo_modes(cur_l, pred_l, lam):
            """Per-block mode decision: True = inter."""
            h, w = cur_l.shape
            nby, nbx = h // m, w // m

            def blocks(x):
                return x.reshape(nby, m, nbx, m).transpose(0, 2, 1, 3).reshape(-1, m, m)

            cur_b = blocks(cur_l - 128.0)
            res_b = blocks(cur_l - pred_l)
            d_i, r_i = block_cost(cur_b)
            d_p, r_p = block_cost(res_b)
            inter = (d_p + lam * r_p) <= (d_i + lam * r_i)
            return inter.reshape(nby, nbx)

        self._rdo_modes = jax.jit(rdo_modes)

    # ------------------------------------------------------------------
    def encode(self, frames: np.ndarray) -> CodeStream:
        vcfg = self.vcfg
        frames = np.asarray(frames)[: vcfg.n_frames]
        n, h, w, _ = frames.shape
        b = self.ccfg.block_size
        if h % b or w % b:
            raise ValueError(
                f"IPP frames must be multiples of the DCT block size {b}"
            )
        m = vcfg.me_block
        if h % m or w % m:
            raise ValueError(f"frame size must be a multiple of ME block {m}")

        kinds: List[str] = []
        planes: List[np.ndarray] = []
        mvs: Dict[str, np.ndarray] = {}
        modes: Dict[str, np.ndarray] = {}
        ref = None
        for i in range(n):
            frame = jnp.asarray(frames[i])
            if i % vcfg.gop_size == 0:
                k, recon = self._intra_step(frame)
                kinds.append("I")
            else:
                if vcfg.rdo_lambda > 0:
                    k, mv, recon, mode = self._encode_p_rdo(ref, frame)
                    modes[f"modes_{i:04d}"] = np.asarray(mode)
                else:
                    k, mv, recon = self._inter_step(ref, frame)
                mvs[f"mv_{i:04d}"] = np.asarray(mv)
                kinds.append("P")
            planes.append(np.asarray(k))
            ref = recon

        cs = CodeStream()
        for i, plane in enumerate(planes):
            payload, side = self.entropy_codec.encode(plane)
            cs[f"f{i:04d}"] = payload
            for name, blob in side.items():
                cs[f"f{i:04d}.{name}"] = blob
        for name, arr in {**mvs, **modes}.items():
            cs.put_array(name, arr)
        cs.put_json(PAYLOAD, {
            "mode": "ipp", "n_frames": int(n), "kinds": kinds,
            "frame_shape": [int(s) for s in frames.shape[1:]],
            "gop": vcfg.gop_size, "me_block": m,
            "search_range": vcfg.search_range,
            "rdo": vcfg.rdo_lambda,
        })
        return cs

    def _encode_p_rdo(self, ref, frame):
        """P-frame with per-block intra/inter RDO (reassembles a mixed
        source image: inter blocks carry residual+128, intra blocks the
        original pixels; the mode map rides in the stream)."""
        vcfg = self.vcfg
        m = vcfg.me_block
        cur = frame.astype(jnp.float32)
        ref_l = motion.to_luma(ref.astype(jnp.uint8))
        cur_l = motion.to_luma(frame)
        if vcfg.fast_search:
            mv, _ = motion.three_step_search(ref_l, cur_l, m, vcfg.search_range)
        else:
            mv, _ = motion.full_search(ref_l, cur_l, m, vcfg.search_range)
        pred = motion.compensate(ref, mv, m, pad=max(vcfg.search_range, 8))
        pred_l = motion.to_luma(pred.astype(jnp.uint8))
        inter_mask = self._rdo_modes(cur_l, pred_l, vcfg.rdo_lambda)  # (nby, nbx)

        mask_full = jnp.repeat(jnp.repeat(inter_mask, m, 0), m, 1)[..., None]
        residual = jnp.clip(cur - pred + 128.0, 0.0, 255.0)
        src = jnp.where(mask_full, residual, cur)
        k = self._intra_step_plane(src)
        rec_mixed = self._decode_plane(k)
        recon = jnp.where(
            mask_full, jnp.clip(pred + (rec_mixed - 128.0), 0.0, 255.0), rec_mixed
        )
        return k, mv, recon, np.asarray(inter_mask)

    # device helpers reused by RDO path
    @functools.cached_property
    def _intra_step_plane(self):
        cfg = self.ccfg
        b, qss = cfg.block_size, cfg.qss
        fwd, _ = color_ops.get(cfg.color if cfg.color != "ycocg_r" else "ycocg")

        @jax.jit
        def run(img_f32):
            coeff = dct_ops.analyze(fwd(img_f32 - 128.0), b)
            if cfg.subbands:
                coeff = dct_ops.to_subbands(coeff, b)
            k = q_ops.deadzone_quantize(coeff, qss)
            return (k + 128).astype(jnp.uint8)

        return run

    @functools.cached_property
    def _decode_plane(self):
        cfg = self.ccfg
        b, qss = cfg.block_size, cfg.qss
        _, inv = color_ops.get(cfg.color if cfg.color != "ycocg_r" else "ycocg")

        @jax.jit
        def run(k_u8):
            k = k_u8.astype(jnp.int32) - 128
            coeff = q_ops.deadzone_dequantize(k, qss)
            if cfg.subbands:
                coeff = dct_ops.from_subbands(coeff, b)
            y = inv(dct_ops.synthesize(coeff, b)) + 128.0
            return jnp.clip(jnp.round(y), 0.0, 255.0)

        return run

    # ------------------------------------------------------------------
    def decode(self, cs: CodeStream) -> np.ndarray:
        meta = cs.get_json(PAYLOAD)
        n = meta["n_frames"]
        kinds = meta["kinds"]
        m = meta["me_block"]
        s = meta["search_range"]
        rdo = meta.get("rdo", 0)

        out = []
        ref = None
        for i in range(n):
            side = {
                name.split(".", 1)[1]: cs[name]
                for name in cs
                if name.startswith(f"f{i:04d}.")
            }
            plane = self.entropy_codec.decode(cs[f"f{i:04d}"], side)
            dec = self._decode_plane(jnp.asarray(plane))
            if kinds[i] == "I":
                recon = dec
            else:
                mv = jnp.asarray(cs.get_array(f"mv_{i:04d}"))
                pred = motion.compensate(ref, mv, m, pad=max(s, 8))
                if rdo and f"modes_{i:04d}" in cs:
                    inter_mask = jnp.asarray(cs.get_array(f"modes_{i:04d}"))
                    mask_full = jnp.repeat(jnp.repeat(inter_mask, m, 0), m, 1)[..., None]
                    recon = jnp.where(
                        mask_full,
                        jnp.clip(pred + (dec - 128.0), 0.0, 255.0),
                        dec,
                    )
                else:
                    recon = jnp.clip(pred + (dec - 128.0), 0.0, 255.0)
            out.append(np.asarray(recon).astype(np.uint8))
            ref = recon
        return np.stack(out)
