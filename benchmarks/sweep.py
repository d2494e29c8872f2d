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


def _device_resident(h, w, n_frames=8):
    """RTT-corrected full-codec throughput at (h, w): grouped device
    rANS + DCT transform, reps inside one dispatch (bench.py method)."""
    import time

    import jax
    import jax.numpy as jnp

    from bench import build_transform_fns
    from vcf_tpu.config import CodecConfig
    from vcf_tpu.entropy import rans as R
    from vcf_tpu.io import test_image

    cfg = CodecConfig(entropy="grans", subbands=False)
    base = test_image(h, w, seed=3).astype(np.uint8)
    frames = np.stack(
        [np.roll(base, (7 * i, 13 * i), (0, 1)) for i in range(n_frames)])
    enc_t, dec_t = build_transform_fns(cfg, h, w)
    b = cfg.block_size
    g = b * b
    n_syms = frames.size
    s_streams = R.RANSCodec._pick_streams(n_syms, 65536)
    s_streams = max(g, (s_streams // g) * g)
    l_steps = n_syms // s_streams
    sg = s_streams // g
    u_e = next(x for x in (5, 4, 3, 2, 1) if l_steps % x == 0)
    u_d = next(x for x in (4, 3, 2, 1) if l_steps % x == 0)
    fd = jax.device_put(frames)
    k0 = np.asarray(jax.jit(enc_t)(jnp.asarray(frames[:1])))
    fg, cg = R.subband_group_freqs(k0, b)
    fg_j, cg_j = jnp.asarray(fg), jnp.asarray(cg)

    @jax.jit
    def enc_reps(reps, x):
        def body(i, acc):
            lanes = R.block_lanes(enc_t(jnp.roll(x, i, 0)), b, s_streams)
            w, nw, st = R.jax_encode_grouped(lanes, fg_j, cg_j, unroll=u_e)
            # consume words so the compaction pass cannot be DCE'd
            return acc + nw + st[0].astype(jnp.int32) \
                + jnp.sum(w[:8].astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @jax.jit
    def enc_once(x):
        lanes = R.block_lanes(enc_t(x), b, s_streams)
        return R.jax_encode_grouped(lanes, fg_j, cg_j, unroll=u_e,
                                    with_counts=True)

    use_pallas = jax.default_backend() == "tpu" and sg % 128 == 0
    words, nw, st, counts = enc_once(fd)
    nw_i = int(nw)
    counts_h = np.asarray(counts).astype(np.int32)
    cap = sg * max(1, -(-int(counts_h.max()) // sg))
    cap = min(cap, s_streams)
    wpad = jnp.concatenate(
        [words[:nw_i], jnp.zeros(cap + s_streams + 16, jnp.uint16)])
    cts = jnp.asarray(counts_h)

    def dec_lanes(wp, c, st_i):
        if use_pallas:
            from vcf_tpu.ops.pallas import rans_decode as rd

            win = rd.build_windows(wp, c, cap)
            return rd.pallas_decode_grouped(win, st_i, fg_j, cg_j,
                                            l_steps, cap, unroll=u_d, sg=sg)
        return R.jax_decode_hier(wp, jnp.int32(0), st_i, fg_j, cg_j,
                                 l_steps, unroll=u_d)

    @jax.jit
    def dec_reps(reps, wp, c, st0):
        def body(i, acc):
            st_i = st0 ^ (i.astype(jnp.uint32) & jnp.uint32(1))
            lanes = dec_lanes(wp, c, st_i)
            rec = dec_t(R.block_unlanes(lanes, b, frames.shape))
            return acc + rec[0, 0, 0, 0].astype(jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    def timed(fn, *a):
        for _ in range(2):
            int(fn(jnp.int32(1), *a))
        t0 = time.perf_counter()
        int(fn(jnp.int32(1), *a))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(fn(jnp.int32(5), *a))
        t_hi = time.perf_counter() - t0
        return max(t_hi - t_lo, 1e-9) / 4

    t_enc = timed(enc_reps, fd)
    t_dec = timed(dec_reps, wpad, cts, st)
    return {
        "config": "dct_deadzone_grans", "frames": n_frames,
        "encode_s": round(t_enc, 5), "decode_s": round(t_dec, 5),
        "mb_per_s": round(frames.nbytes / (t_enc + t_dec) / 1e6, 2),
        "pallas_decode": bool(use_pallas),
        "timing": "per-rep via in-dispatch fori_loop, RTT-subtracted",
    }


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
            # per-call wall through the library API: on the axon tunnel
            # this INCLUDES ~25 ms dispatch RTT + host<->device
            # transfer per call (VERDICT r2 item 9) — see the
            # device_resident section for chip-work-only numbers
            "timing": "per-call wall (host API; includes tunnel RTT "
                      "+ transfers on axon)",
            **{k: round(v, 4) for k, v in rep.items()},
        }
        print(name, results[name])

    # ------------------------------------------------------------------
    # RTT-corrected device-resident numbers for the device entropy
    # codecs (the library-API walls above mostly measure the tunnel):
    # reps inside one dispatch via lax.fori_loop, two counts differenced
    # (bench.py's method) — transform + grouped rANS, encode + decode.
    # ------------------------------------------------------------------
    if not args.only or "device_resident" in args.only:
        try:
            results["device_resident"] = _device_resident(h, w)
            print("device_resident", results["device_resident"])
        except Exception as e:  # pragma: no cover - perf diag only
            results["device_resident"] = {"error": repr(e)[:200]}

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
            "timing": "per-call wall (host API; includes tunnel RTT "
                      "+ transfers on axon) — see BENCH_VIDEO.json for "
                      "the device-resident IPP number",
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
