"""Device-resident IPP video bench at 1080p (BASELINE config 5).

The WHOLE codec rides in XLA programs: GOP motion search + MC residual
DCT/quantize (video/ipp.py gop_encode, vmapped over GOPs), per-subband
grouped rANS entropy (entropy/rans.py) — encode emits the codestream in
HBM; decode consumes it from HBM (Pallas whole-scan kernel on TPU) and
runs the mirrored GOP reconstruction.  No per-frame host loop anywhere
(VERDICT r2 weak item 3; reference role src/IPP_DCT.py:663-687 writes
one /tmp PNG per frame).

Timing: reps inside one dispatch (lax.fori_loop), two rep counts
differenced — subtracts the ~25 ms axon-tunnel RTT and one-time costs
(docs/PERF_NOTES.md).  Writes ONE JSON line; the driver-facing headline
stays in bench.py (stills) — this sibling writes BENCH_VIDEO.json.

Run through benchmarks/chipserver.py (jobs/job_bench_ipp.py wrapper) or
directly: python benchmarks/bench_ipp.py
"""

import json
import time

import numpy as np


def run(n_frames=8, h=1088, w=1920, gop=4, out_path=None):
    import jax
    import jax.numpy as jnp

    from vcf_tpu.config import CodecConfig, VideoConfig
    from vcf_tpu.entropy import rans as rans_mod
    from vcf_tpu.io.video import test_video
    from vcf_tpu.video.ipp import IPPCodec

    ccfg = CodecConfig(entropy="grans", subbands=False)
    vcfg = VideoConfig(mode="ipp", n_frames=n_frames, gop_size=gop,
                       me_block=16, search_range=8)
    codec = IPPCodec(vcfg, ccfg)

    frames = test_video(n_frames, h, w, seed=7)
    gops = frames.reshape(-1, gop, h, w, 3)
    gops_dev = jax.device_put(gops)

    b = ccfg.block_size
    n_syms = frames.size
    s_streams = rans_mod.RANSCodec._pick_streams(n_syms, 65536)
    g = b * b
    s_streams = max(g, (s_streams // g) * g)
    l_steps = n_syms // s_streams
    sg = s_streams // g
    unroll_d = next(u for u in (4, 3, 2, 1) if l_steps % u == 0)
    unroll_e = next(u for u in (5, 4, 3, 2, 1) if l_steps % u == 0)

    use_pallas = jax.default_backend() == "tpu" and sg % 128 == 0
    use_grid = use_pallas and l_steps % unroll_d == 0
    # planar + subband-grid closed loop (r4): no layout hops in the
    # scan, laning by plain reshapes (video/ipp.py _build_planar_gop)
    use_planar = use_grid and codec._gop_encode_grid_batch is not None
    from vcf_tpu.ops.pallas.dct_kernel import _chunk_w
    cw = _chunk_w(w, b)

    def to_lanes(planes):
        if use_planar:
            # L-major layout feeds the u8 encode kernel directly (r5)
            return rans_mod.grid_lanes_lmajor(
                planes.reshape(-1, 3, h, w), b, s_streams, rows=32, cw=cw)
        return rans_mod.block_lanes(planes.reshape(-1, h, w, 3), b,
                                    s_streams)

    gop_enc = (codec._gop_encode_grid_batch if use_planar
               else codec._gop_encode_batch)

    # tables trained once on the clip's planes (frozen side info — the
    # library path does the same via GroupedRANSCodec.freeze_tables)
    planes0, _ = gop_enc(gops_dev)
    lanes0 = to_lanes(planes0)
    if use_planar:
        lanes0 = lanes0.T          # histograms expect (S, L)
    counts0 = np.asarray(rans_mod.group_histograms(lanes0, g))
    freqs_g, cums_g = rans_mod.freqs_from_counts(counts0)
    fg_j, cg_j = jnp.asarray(freqs_g), jnp.asarray(cums_g)

    # ---- full encode: ME + residual transform + entropy, one program ----
    # (grid layout on TPU: the Pallas raw encode kernel's (L, S) grid is
    # the device-resident codestream — see ops/pallas/rans_decode.py
    # pallas_decode_grouped_grid; wire bytes counted via finish pass)
    if use_grid:
        from vcf_tpu.ops.pallas import rans_encode as re_

        @jax.jit
        def encode_full(gd):
            planes, mvs = gop_enc(gd)
            lanes = to_lanes(planes)
            le, st = re_.pallas_encode_grouped_raw_u8(
                lanes, fg_j, cg_j, unroll=unroll_d, sg=sg, lmajor=True)
            return planes, mvs, le, st

        @jax.jit
        def encode_reps(reps, gd):
            def body(i, acc):
                planes, mvs, le, st = encode_full(jnp.roll(gd, i, axis=0))
                return acc + le[0, 0] + le[l_steps - 1, 1] \
                    + st[0].astype(jnp.int32) \
                    + mvs[0, 0, 0, 0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        planes, mvs, le_dev, st = encode_full(gops_dev)
        words, nw, counts = re_.finish_stream_pallas(le_dev)
        nw_i = int(nw)
        counts_h = np.asarray(counts)
    else:
        @jax.jit
        def encode_full(gd):
            planes, mvs = codec._gop_encode_batch(gd)
            lanes = rans_mod.block_lanes(
                planes.reshape(-1, h, w, 3), b, s_streams)
            words, nw, st, counts = rans_mod.jax_encode_grouped(
                lanes, fg_j, cg_j, unroll=unroll_e, with_counts=True)
            return planes, mvs, words, nw, st, counts

        @jax.jit
        def encode_reps(reps, gd):
            def body(i, acc):
                planes, mvs, words, nw, st, counts = encode_full(
                    jnp.roll(gd, i, axis=0))
                # consume words so the compaction pass cannot be DCE'd
                return acc + nw + st[0].astype(jnp.int32) \
                    + mvs[0, 0, 0, 0, 0].astype(jnp.int32) \
                    + jnp.sum(words[:8].astype(jnp.int32))
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        planes, mvs, words, nw, st, counts = encode_full(gops_dev)
        nw_i = int(nw)
        counts_h = np.asarray(counts)

    cap = sg * max(1, -(-int(counts_h.max()) // sg))
    cap = min(cap, s_streams)
    wpad = jnp.concatenate(
        [jnp.asarray(words)[:nw_i],
         jnp.zeros(cap + s_streams + 16, jnp.uint16)])
    mvs_dev = jnp.asarray(mvs)
    counts_dev = jnp.asarray(np.asarray(counts_h).astype(np.int32))

    # ---- full decode: entropy + unlane + GOP reconstruction -------------
    def dec_lanes(wp, cts, stt, le):
        if use_grid:
            from vcf_tpu.ops.pallas import rans_decode as rd

            return rd.pallas_decode_grouped_grid(
                le, stt, fg_j, cg_j, l_steps, unroll=unroll_d, sg=sg,
                lmajor=True)
        if use_pallas:
            from vcf_tpu.ops.pallas import rans_decode as rd

            win = rd.build_windows(wp, cts, cap)
            return rd.pallas_decode_grouped(
                win, stt, fg_j, cg_j, l_steps, cap, unroll=unroll_d, sg=sg)
        return rans_mod.jax_decode_hier(
            wp, jnp.int32(0), stt, fg_j, cg_j, l_steps, unroll=unroll_d)

    le_arg = le_dev if use_grid else jnp.zeros((1, 1), jnp.int32)

    @jax.jit
    def decode_full(wp, cts, stt, mv, le):
        lanes = dec_lanes(wp, cts, stt, le)
        if use_planar:
            unlane = (rans_mod.grid_unlanes_lmajor if use_grid
                      else rans_mod.grid_unlanes)
            planes_d = unlane(
                lanes, b, (n_frames, 3, h, w), rows=32, cw=cw
            ).reshape(-1, gop, 3, h, w)
            recs = codec._gop_decode_grid_batch(planes_d, mv)
            return jnp.clip(jnp.round(recs), 0, 255).astype(
                jnp.uint8).transpose(0, 1, 3, 4, 2)
        planes_d = rans_mod.block_unlanes(
            lanes, b, (n_frames, h, w, 3)).reshape(-1, gop, h, w, 3)
        recs = codec._gop_decode_batch(planes_d, mv)
        return jnp.clip(recs, 0, 255).astype(jnp.uint8)

    @jax.jit
    def decode_reps(reps, wp, cts, stt, mv, le):
        def body(i, acc):
            # i-dependent state perturbation so XLA cannot hoist the
            # loop-invariant decode (timing only; the checked
            # reconstruction uses decode_full directly).  The checksum
            # must consume EVERY output element: a single-element probe
            # lets XLA dead-code-eliminate the whole GOP reconstruction
            # scan (the I-frame recon is scan-independent) — r3's
            # decode_s was undermeasured exactly this way.
            stt_i = stt ^ (i.astype(jnp.uint32) & jnp.uint32(1))
            rec = decode_full(wp, cts, stt_i, mv, le)
            return acc + jnp.sum(rec.astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    def timed(fn, *args, lo=1, hi=3, warm=4):
        # min-of-3 per rep count after 4 warm calls: a cold t_lo
        # silently UNDER-measures the difference (bench.py note)
        for _ in range(warm):
            int(fn(jnp.int32(lo), *args))
        t_los, t_his = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            int(fn(jnp.int32(lo), *args))
            t_los.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(fn(jnp.int32(hi), *args))
            t_his.append(time.perf_counter() - t0)
        return max(min(t_his) - min(t_los), 1e-9) / (hi - lo)

    t_enc = timed(encode_reps, gops_dev)
    t_dec = timed(decode_reps, wpad, counts_dev, st, mvs_dev, le_arg)

    rec = np.asarray(decode_full(wpad, counts_dev, st, mvs_dev, le_arg))
    rec = rec.reshape(n_frames, h, w, 3)
    rmse = float(np.sqrt(np.mean(
        (rec[:, :1080].astype(np.float64) - frames[:, :1080]) ** 2)))
    import zlib as _z

    side = 4 * s_streams + len(_z.compress(freqs_g.astype("<u2").tobytes(), 9))
    side += len(_z.compress(counts_h.astype("<u4").tobytes(), 9))
    mv_bytes = np.asarray(mvs).astype(np.int8).nbytes
    bpp = (2 * nw_i + side + mv_bytes) * 8 / (n_frames * h * w)
    gbps = frames.nbytes / (t_enc + t_dec) / 1e9

    result = {
        "metric": "device-resident IPP video encode+decode GB/s per chip "
                  "(1080p, ME+MC residual DCT+deadzone+grouped rANS)",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "detail": {
            "encode_s": round(t_enc, 4), "decode_s": round(t_dec, 4),
            "rmse": round(rmse, 3), "bpp": round(bpp, 4),
            "frames": n_frames, "gop": gop, "hw": [h, w],
            "pallas_decode": bool(use_pallas),
            "layout": "lane-grid" if use_grid else "compact-stream",
            "entropy": "grouped-rans(device)",
            "timing": "per-rep via in-dispatch fori_loop, RTT-subtracted",
        },
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    run(out_path="BENCH_VIDEO.json")
