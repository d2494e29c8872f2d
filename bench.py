"""Benchmark: encode+decode throughput of the flagship pipeline.

Measures the BASELINE.json headline config (config 2): YCoCg + 8x8
block-DCT + subbands + deadzone(32) + Huffman on 1080p frames, on the
real chip.  The pipeline is chunked and double-buffered: device
compute and device<->host transfers of chunk i overlap the host
entropy coding of chunk i-1 (JAX dispatch is async; the host side runs
in a worker thread).

Reports aggregate encode+decode throughput in GB/s of input pixels
processed (uint8 RGB bytes), against the per-chip share of the
north-star target (1 GB/s aggregate on a v5e-16 slice => 62.5 MB/s
per chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}
"""

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def build_codec(cfg):
    import jax
    import jax.numpy as jnp
    from vcf_tpu.ops import color as color_ops
    from vcf_tpu.ops import dct as dct_ops
    from vcf_tpu.ops import quantize as q_ops

    b, qss = cfg.block_size, cfg.qss
    fwd, inv = color_ops.get(cfg.color)

    def encode_one(img_u8):
        x = img_u8.astype(jnp.float32) - 128.0
        ct = fwd(x)
        coeff = dct_ops.analyze(ct, b)
        if cfg.subbands:
            coeff = dct_ops.to_subbands(coeff, b)
        k = q_ops.deadzone_quantize(coeff, qss)
        return (k + 128).astype(jnp.uint8)

    def decode_one(k_u8):
        k = k_u8.astype(jnp.int32) - 128
        coeff = q_ops.deadzone_dequantize(k, qss)
        if cfg.subbands:
            coeff = dct_ops.from_subbands(coeff, b)
        ct = dct_ops.synthesize(coeff, b)
        y = inv(ct) + 128.0
        return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)

    return (
        jax.jit(jax.vmap(encode_one)),
        jax.jit(jax.vmap(decode_one)),
    )


def main():
    import jax

    from vcf_tpu.io.images import test_image
    from vcf_tpu.config import CodecConfig
    from vcf_tpu.entropy import get as get_entropy

    n_frames, chunk = 16, 4
    h, w = 1080, 1920
    frames = np.stack(
        [test_image(1088, 1920, seed=i)[:1080] for i in range(n_frames)]
    )

    cfg = CodecConfig(entropy="huffman")
    enc_fn, dec_fn = build_codec(cfg)
    huff = get_entropy("huffman", cfg)
    n_chunks = n_frames // chunk
    chunks = [frames[i * chunk : (i + 1) * chunk] for i in range(n_chunks)]

    def encode_all():
        """HtoD + device encode (async) overlapped with host Huffman."""
        devs = [enc_fn(jax.device_put(c)) for c in chunks]  # async dispatch
        payloads = []
        with ThreadPoolExecutor(2) as ex:
            futs = []
            for d in devs:
                planes = jax.device_get(d)  # sync: DtoH chunk i
                futs.append(ex.submit(huff.encode, planes))
            payloads = [f.result() for f in futs]
        return payloads, devs[0].shape

    def decode_all(payloads, plane_shape):
        recs = []
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(huff.decode, p, s) for p, s in payloads]
            devs = []
            for f in futs:
                planes = f.result()
                devs.append(dec_fn(jax.device_put(planes)))  # async dispatch
            recs = [jax.device_get(d) for d in devs]
        return np.concatenate(recs)

    # warm up (compile both directions + build native lib)
    payloads, plane_shape = encode_all()
    recon = decode_all(payloads, plane_shape)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        payloads, plane_shape = encode_all()
    t_encode = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(reps):
        recon = decode_all(payloads, plane_shape)
    t_decode = (time.perf_counter() - t0) / reps

    gbps = frames.nbytes / (t_encode + t_decode) / 1e9
    err = float(np.sqrt(np.mean((recon.astype(np.float64) - frames) ** 2)))
    compressed = sum(
        len(p) + sum(len(v) for v in side.values()) for p, side in payloads
    )
    bpp = compressed * 8 / (n_frames * h * w)

    baseline_per_chip = 1.0 / 16  # GB/s: per-chip share of 1 GB/s on v5e-16
    result = {
        "metric": "encode+decode GB/s per chip (1080p, DCT+deadzone+Huffman)",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / baseline_per_chip, 3),
        "detail": {
            "encode_s": round(t_encode, 4),
            "decode_s": round(t_decode, 4),
            "rmse": round(err, 3),
            "bpp": round(bpp, 4),
            "frames": n_frames,
            "devices": len(jax.devices()),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
