"""Benchmark sweep over the five BASELINE.json configurations.

Runs on whatever platform JAX resolves (real chip by default; pass
--cpu to force CPU for a smoke run), measures wall-clock encode/decode
and RD per config, and writes JSON to benchmarks/results.json.

    python benchmarks/sweep.py [--cpu] [--frames N] [--size HxW]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(args):
    import jax

    from vcf_tpu import Codec, CodecConfig, metrics
    from vcf_tpu.config import VideoConfig
    from vcf_tpu.io import test_image
    from vcf_tpu.io.video import test_video
    from vcf_tpu import video

    h, w = (int(x) for x in args.size.split("x"))
    img = test_image(h, w, seed=3)

    stills = {
        # BASELINE config 1: entropy-only round trip
        "png_roundtrip": CodecConfig(spatial="none", color="none",
                                     quantizer="none", entropy="png"),
        # BASELINE config 2: VCF defaults (+ huffman variant = bench.py)
        "dct_deadzone_tiff": CodecConfig(),
        "dct_deadzone_huffman": CodecConfig(entropy="huffman"),
        "dct_deadzone_rans": CodecConfig(entropy="rans"),
        "dct_deadzone_grans": CodecConfig(entropy="grans"),
        # BASELINE config 3
        "dwt_deadzone_cbaac": CodecConfig(spatial="dwt", qss=16, dwt_levels=3,
                                          entropy="cbaac", context_tiles=4),
        # BASELINE config 4
        "lloydmax_vq_colorvq": CodecConfig(spatial="none", color="none",
                                           quantizer="colorvq", entropy="zlib"),
    }

    results = {}
    if args.only:
        keep = set(args.only.split(","))
        stills = {k: v for k, v in stills.items() if k in keep}
    for name, cfg in stills.items():
        codec = Codec(cfg)
        cs = codec.encode(img)          # warm (compile)
        rec = Codec(cfg).decode(cs)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            cs = codec.encode(img)
        t_enc = (time.perf_counter() - t0) / args.reps
        dec = Codec(cfg)
        dec.decode(cs)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            rec = dec.decode(cs)
        t_dec = (time.perf_counter() - t0) / args.reps
        rep = metrics.j_cost(cs, img, rec)
        results[name] = {
            "encode_s": round(t_enc, 4), "decode_s": round(t_dec, 4),
            "mb_per_s": round(img.nbytes / (t_enc + t_dec) / 1e6, 2),
            **{k: round(v, 4) for k, v in rep.items()},
        }
        print(name, results[name])

    # BASELINE config 5: video
    video_cfgs = [
        ("iii_dct", VideoConfig(mode="iii", n_frames=args.frames),
         CodecConfig(entropy="huffman")),
        ("ipp_dct", VideoConfig(mode="ipp", n_frames=args.frames, gop_size=4,
                                me_block=16, search_range=8),
         CodecConfig(qss=64, entropy="huffman")),
    ]
    if args.only:
        video_cfgs = [v for v in video_cfgs if v[0] in set(args.only.split(","))]
    if video_cfgs:
        frames = test_video(args.frames, 288, 352)
    for name, vcfg, ccfg in video_cfgs:
        codec = video.get(vcfg, ccfg)
        cs = codec.encode(frames)
        t0 = time.perf_counter()
        cs = codec.encode(frames)
        t_enc = time.perf_counter() - t0
        dec = video.get(vcfg, ccfg)
        rec = dec.decode(cs)
        t0 = time.perf_counter()
        rec = dec.decode(cs)
        t_dec = time.perf_counter() - t0
        rep = metrics.video_report(cs, frames, rec)
        results[name] = {
            "encode_s": round(t_enc, 4), "decode_s": round(t_dec, 4),
            "mb_per_s": round(frames.nbytes / (t_enc + t_dec) / 1e6, 2),
            "rate_bpp": round(rep["rate_bpp"], 4),
            "distortion_rmse": round(rep["distortion_rmse"], 4),
        }
        print(name, results[name])

    out = {
        "platform": jax.devices()[0].platform,
        "size": args.size, "frames": args.frames,
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default="",
                    help="comma-separated config names to run (compile budget)")
    ap.add_argument("--out", default="results.json")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    run(args)
