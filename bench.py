"""Benchmark: encode+decode throughput of the flagship pipeline.

BASELINE.json headline config (config 2 at 1080p): YCoCg + 8x8
block-DCT + subbands + deadzone(32), measured on the real chip as a
COMPLETE codec — entropy stage included — with every stage resident in
HBM (interleaved rANS, entropy/rans.py: encode and decode are XLA
programs; the codestream never leaves the device).

Why device-resident is the headline (docs/PERF_NOTES.md): this
environment reaches the chip through a tunnel whose host<->device link
runs at 10-60 MB/s (~100x slower than real PCIe), so any host-to-host
number measures the tunnel, not the codec.  The tunnel-bound
host-to-host figure for the pipelined host-Huffman path is still
reported in `detail.host_to_host_gbps`.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}
vs_baseline is against the per-chip share (1/16 GB/s) of the
BASELINE.json north star (>1 GB/s aggregate on v5e-16).
"""

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

WARMUP = 4  # first executions of a fresh executable are ~5x slow (PERF_NOTES)


def build_transform_fns(cfg, h, w):
    import jax
    import jax.numpy as jnp
    from vcf_tpu.ops import color as color_ops
    from vcf_tpu.ops import dct as dct_ops
    from vcf_tpu.ops import quantize as q_ops

    b, qss = cfg.block_size, cfg.qss
    fwd, inv = color_ops.get(cfg.color)
    use_pallas = cfg.use_pallas and h % 32 == 0

    def encode_one(img_u8):
        x = img_u8.astype(jnp.float32) - 128.0
        ct = fwd(x)
        if use_pallas:
            from vcf_tpu.ops.pallas import fused_dct_quantize

            k_img = fused_dct_quantize(
                ct.transpose(2, 0, 1), b=b, qss=qss, offset=128
            ).transpose(1, 2, 0)
        else:
            coeff = dct_ops.analyze(ct, b)
            k_img = jnp.clip(
                q_ops.deadzone_quantize(coeff, qss) + 128, 0, 255
            ).astype(jnp.uint8)
        if cfg.subbands:
            k_img = dct_ops.to_subbands(k_img, b)
        return k_img

    def decode_one(k_u8):
        k_img = k_u8
        if cfg.subbands:
            k_img = dct_ops.from_subbands(k_img, b)
        if use_pallas:
            from vcf_tpu.ops.pallas import fused_dequantize_idct

            ct = fused_dequantize_idct(
                k_img.transpose(2, 0, 1), b=b, qss=qss, offset=128
            ).transpose(1, 2, 0)
        else:
            coeff = q_ops.deadzone_dequantize(k_img.astype(jnp.int32) - 128, qss)
            ct = dct_ops.synthesize(coeff, b)
        y = inv(ct) + 128.0
        return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)

    return jax.vmap(encode_one), jax.vmap(decode_one)


def main():
    import jax
    import jax.numpy as jnp

    from vcf_tpu.io.images import test_image
    from vcf_tpu.config import CodecConfig
    from vcf_tpu.entropy import get as get_entropy
    from vcf_tpu.entropy import rans as rans_mod

    import os

    # defaults: 1080p batch (32-row aligned; metrics on the 1080 crop);
    # env knobs exist only for CPU smoke-testing the bench itself
    n_frames = int(os.environ.get("BENCH_FRAMES", 8))
    h = int(os.environ.get("BENCH_H", 1088))
    w = int(os.environ.get("BENCH_W", 1920))
    base = test_image(h, w, seed=3).astype(np.uint8)
    frames = np.stack(
        [np.roll(base, (7 * i, 13 * i), (0, 1)) for i in range(n_frames)]
    )

    cfg = CodecConfig(entropy="rans")
    enc_t, dec_t = build_transform_fns(cfg, h, w)

    # ---- full device-resident codec: transform+quant+rANS in HBM ---------
    n_syms = n_frames * h * w * 3
    s_streams = rans_mod.RANSCodec._pick_streams(n_syms, 65536)
    l_steps = n_syms // s_streams
    # model trained once on the first frame's quantized planes (static
    # side info, replicated in a real deployment)
    k0 = np.asarray(jax.jit(enc_t)(jnp.asarray(frames[:1])))
    freqs = rans_mod.quantize_freqs(
        np.bincount(k0.reshape(-1), minlength=256), min_all=True
    )
    cums = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.uint32)
    f_j = jnp.asarray(freqs.astype(np.uint32))
    c_j = jnp.asarray(cums)

    @jax.jit
    def encode_full(frames_dev):
        planes = enc_t(frames_dev)
        syms = planes.reshape(l_steps, s_streams).T
        words, n_words, states = rans_mod.jax_encode(syms, f_j, c_j)
        return words, n_words, states

    @jax.jit
    def decode_full(words_padded, states):
        syms = rans_mod.jax_decode(
            words_padded, jnp.int32(0), states, f_j, c_j, l_steps
        )
        planes = syms.T.reshape(n_frames, h, w, 3)
        return dec_t(planes)

    frames_dev = jax.device_put(frames)
    for _ in range(WARMUP):
        words, n_words, states = encode_full(frames_dev)
        nw = int(n_words)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        words, n_words, states = encode_full(frames_dev)
        nw = int(n_words)
    t_enc = (time.perf_counter() - t0) / reps

    # ---- sparse device codec (flag bitplane + compacted nonzeros) --------
    # Same transform; entropy = jax_sparse_encode/decode (one XLA program
    # each).  Models + capacity trained on the first frame's statistics.
    k0_flat = k0.reshape(-1)
    zero_sym = np.uint8(np.bincount(k0_flat, minlength=256).argmax())
    nz0 = k0_flat[k0_flat != zero_sym]
    frac_nz = max(nz0.size / k0_flat.size, 1e-4)
    s_sp = rans_mod.RANSCodec._pick_streams(n_syms, 65536)
    cap = -(-int(n_syms * frac_nz * 1.3) // s_sp) * s_sp
    # keep cap a multiple of s_sp after clamping (jax_sparse_encode
    # requires cap % s_nz == 0)
    cap = max(min(cap, n_syms // s_sp * s_sp), s_sp)
    fill = np.uint8(np.bincount(nz0, minlength=256).argmax() if nz0.size else 0)
    flag0 = np.packbits(k0_flat != zero_sym)
    nz0_padded = np.concatenate(
        [nz0, np.full(max(cap // n_frames - nz0.size, 0), fill, np.uint8)])
    f_flag = rans_mod.quantize_freqs(np.bincount(flag0, minlength=256), min_all=True)
    f_nz = rans_mod.quantize_freqs(np.bincount(nz0_padded, minlength=256), min_all=True)
    c_flag = np.concatenate(([0], np.cumsum(f_flag)))[:256].astype(np.uint32)
    c_nz = np.concatenate(([0], np.cumsum(f_nz)))[:256].astype(np.uint32)
    ff_j, fc_j = jnp.asarray(f_flag.astype(np.uint32)), jnp.asarray(c_flag)
    zf_j, zc_j = jnp.asarray(f_nz.astype(np.uint32)), jnp.asarray(c_nz)
    # pad the flat stream with zero symbols to a multiple of 8*S so the
    # flag bytes tile exactly into S streams (pad flags are all-zero
    # bytes: ~free in rate, no nonzeros)
    n_pad = -(-n_syms // (8 * s_sp)) * (8 * s_sp)
    l_flags, l_nz = (n_pad // 8) // s_sp, cap // s_sp

    @jax.jit
    def encode_sparse(frames_dev):
        flat = enc_t(frames_dev).reshape(-1)
        flat = jnp.concatenate(
            [flat, jnp.full((n_pad - n_syms,), zero_sym, jnp.uint8)])
        return rans_mod.jax_sparse_encode(
            flat, jnp.uint8(zero_sym), jnp.uint8(fill),
            ff_j, fc_j, zf_j, zc_j, cap, s_sp, s_sp)

    @jax.jit
    def decode_sparse(fwp, fst, zwp, zst):
        flat = rans_mod.jax_sparse_decode(
            fwp, fst, zwp, zst, jnp.uint8(zero_sym),
            ff_j, fc_j, zf_j, zc_j, n_pad, cap, l_flags, l_nz)
        planes = flat[:n_syms].reshape(n_frames, h, w, 3)
        return dec_t(planes)

    def run_sparse_encode():
        fw, fnw, fst, zw, znw, zst, n_nz = encode_sparse(frames_dev)
        return fw, int(fnw), fst, zw, int(znw), zst, int(n_nz)

    sparse = None
    try:
        for _ in range(WARMUP):
            fw, fnw, fst, zw, znw, zst, n_nz = run_sparse_encode()
        if n_nz <= cap:
            t0 = time.perf_counter()
            for _ in range(reps):
                fw, fnw, fst, zw, znw, zst, n_nz = run_sparse_encode()
            t_enc_sp = (time.perf_counter() - t0) / reps
            pad = jnp.zeros((s_sp + 16,), jnp.uint16)
            fwp = jax.block_until_ready(jnp.concatenate([fw[:fnw], pad]))
            zwp = jax.block_until_ready(jnp.concatenate([zw[:znw], pad]))
            for _ in range(WARMUP):
                rec_sp = decode_sparse(fwp, fst, zwp, zst)
                _ = int(jnp.sum(rec_sp[0, 0, 0].astype(jnp.int32)))
            t0 = time.perf_counter()
            for _ in range(reps):
                rec_sp = decode_sparse(fwp, fst, zwp, zst)
                _ = int(jnp.sum(rec_sp[0, 0, 0].astype(jnp.int32)))
            t_dec_sp = (time.perf_counter() - t0) / reps
            rec_np = np.asarray(jax.device_get(rec_sp))
            err_sp = float(np.sqrt(np.mean(
                (rec_np[:, :1080].astype(np.float64) - frames[:, :1080]) ** 2)))
            import zlib as _z
            side_sp = 8 * s_sp + len(_z.compress(f_flag.astype("<u2").tobytes(), 9)) \
                + len(_z.compress(f_nz.astype("<u2").tobytes(), 9))
            bpp_sp = (2 * (fnw + znw) + side_sp) * 8 / (n_frames * h * w)
            sparse = {
                "encode_s": round(t_enc_sp, 4),
                "decode_s": round(t_dec_sp, 4),
                "gbps": round(frames.nbytes / (t_enc_sp + t_dec_sp) / 1e9, 4),
                "rmse": round(err_sp, 3),
                "bpp": round(bpp_sp, 4),
                "nz_fraction": round(n_nz / n_syms, 4),
            }
    except Exception as e:  # pragma: no cover - perf fallback only
        import sys, traceback

        traceback.print_exc(file=sys.stderr)
        sparse = {"error": repr(e)[:200]}

    # dense prefix + pad so decode's dynamic_slice windows stay in range
    wpad = jnp.concatenate(
        [words[:nw], jnp.zeros((s_streams + 16,), jnp.uint16)]
    )
    wpad = jax.block_until_ready(wpad)
    for _ in range(WARMUP):
        rec_dev = decode_full(wpad, states)
        _ = int(jnp.sum(rec_dev[0, 0, 0].astype(jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        rec_dev = decode_full(wpad, states)
        _ = int(jnp.sum(rec_dev[0, 0, 0].astype(jnp.int32)))
    t_dec = (time.perf_counter() - t0) / reps

    gbps_device = frames.nbytes / (t_enc + t_dec) / 1e9
    recon = np.asarray(jax.device_get(rec_dev))
    err = float(
        np.sqrt(np.mean((recon[:, :1080].astype(np.float64) - frames[:, :1080]) ** 2))
    )
    side_bytes = 4 * s_streams + len(
        __import__("zlib").compress(freqs.astype("<u2").tobytes(), 9)
    )
    bpp = (2 * nw + side_bytes) * 8 / (n_frames * h * w)

    # ---- transform-only device throughput (no entropy) --------------------
    enc_j, dec_j = jax.jit(enc_t), jax.jit(dec_t)
    roundtrip = jax.jit(lambda x: jnp.sum(dec_j(enc_j(x)).astype(jnp.int32)))
    for _ in range(WARMUP):
        int(roundtrip(frames_dev))
    t0 = time.perf_counter()
    for _ in range(reps):
        int(roundtrip(frames_dev))
    t_tr = (time.perf_counter() - t0) / reps
    transform_gbps = frames.nbytes / t_tr / 1e9

    # ---- host-to-host with host C++ Huffman (tunnel-bound here) ----------
    huff = get_entropy("huffman", cfg)
    chunk = 4
    chunks = [
        jax.device_put(frames[i : i + chunk]) for i in range(0, n_frames, chunk)
    ]

    def encode_h2h():
        devs = [enc_j(c) for c in chunks]
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(huff.encode, jax.device_get(d)) for d in devs]
            return [f.result() for f in futs]

    def decode_h2h(payloads):
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(huff.decode, p, s) for p, s in payloads]
            devs = [dec_j(jax.device_put(f.result())) for f in futs]
            return np.concatenate([jax.device_get(d) for d in devs])

    payloads = encode_h2h()
    t0 = time.perf_counter()
    payloads = encode_h2h()
    t_he = time.perf_counter() - t0
    recon_h = decode_h2h(payloads)
    t0 = time.perf_counter()
    recon_h = decode_h2h(payloads)
    t_hd = time.perf_counter() - t0
    h2h_gbps = frames.nbytes / (t_he + t_hd) / 1e9
    assert recon_h.shape == frames.shape

    baseline_per_chip = 1.0 / 16  # GB/s: per-chip share of 1 GB/s on v5e-16
    best_gbps, best_entropy = gbps_device, "rans(device)"
    best = {"encode_s": t_enc, "decode_s": t_dec, "rmse": err, "bpp": bpp}
    # promote sparse only if faster AND the entropy stage is verified
    # lossless vs the dense path (identical rmse)
    if (sparse and "gbps" in sparse and sparse["gbps"] > best_gbps
            and abs(sparse["rmse"] - err) < 1e-6):
        best_gbps, best_entropy = sparse["gbps"], "sparse-rans(device)"
        best = {"encode_s": sparse["encode_s"], "decode_s": sparse["decode_s"],
                "rmse": sparse["rmse"], "bpp": sparse["bpp"]}
    result = {
        "metric": "device-resident encode+decode GB/s per chip "
                  "(1080p, DCT+deadzone+rANS, full codec incl. entropy)",
        "value": round(best_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(best_gbps / baseline_per_chip, 3),
        "detail": {
            "encode_s": round(best["encode_s"], 4),
            "decode_s": round(best["decode_s"], 4),
            "transform_only_gbps": round(transform_gbps, 3),
            "host_to_host_gbps": round(h2h_gbps, 4),
            "rmse": round(best["rmse"], 3),
            "bpp": round(best["bpp"], 4),
            "frames": n_frames,
            "devices": len(jax.devices()),
            "pallas": bool(cfg.use_pallas and h % 32 == 0),
            "entropy": best_entropy,
            "dense_gbps": round(gbps_device, 4),
            "sparse": sparse,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
