"""Benchmark: encode+decode throughput of the flagship pipeline.

BASELINE.json headline config (config 2 at 1080p): YCoCg + 8x8
block-DCT + subbands + deadzone(32), measured on the real chip as a
COMPLETE codec — entropy stage included — with every stage resident in
HBM (interleaved rANS, entropy/rans.py: encode and decode are XLA
programs; the codestream never leaves the device).

Measurement method: every dispatch through the axon tunnel costs a
fixed ~25 ms round trip (measured: a 765-step scalar scan and a fused
pass over 25M elements both take ~25 ms wall).  Each timed section
therefore runs `reps` iterations INSIDE one XLA program (lax.fori_loop
with a dynamic trip count, iterations chained through a checksum so
nothing is elided) and reports (t_hi - t_lo) / (hi - lo), which
subtracts both the tunnel RTT and any one-time dispatch overhead.

Why device-resident is the headline (docs/PERF_NOTES.md): the tunnel's
host<->device link runs at 10-60 MB/s (~100x slower than real PCIe), so
any host-to-host number measures the tunnel, not the codec.  The
tunnel-bound host-to-host figure for the pipelined host-Huffman path is
still reported in `detail.host_to_host_gbps`.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}
vs_baseline is against the per-chip share (1/16 GB/s) of the
BASELINE.json north star (>1 GB/s aggregate on v5e-16).
"""

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

WARMUP = 2
REPS_LO, REPS_HI = 1, 4


def build_transform_fns(cfg, h, w):
    import jax
    import jax.numpy as jnp
    from vcf_tpu.ops import color as color_ops
    from vcf_tpu.ops import dct as dct_ops
    from vcf_tpu.ops import quantize as q_ops

    b, qss = cfg.block_size, cfg.qss
    fwd, inv = color_ops.get(cfg.color)
    from vcf_tpu.ops.pallas import dct_kernel as _dk

    use_pallas = (cfg.use_pallas and _dk.supports(h, w)
                  and jax.default_backend() == "tpu")

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
    import zlib as _z

    n_frames = int(os.environ.get("BENCH_FRAMES", 8))
    h = int(os.environ.get("BENCH_H", 1088))
    w = int(os.environ.get("BENCH_W", 1920))
    base = test_image(h, w, seed=3).astype(np.uint8)
    frames = np.stack(
        [np.roll(base, (7 * i, 13 * i), (0, 1)) for i in range(n_frames)]
    )

    cfg = CodecConfig(entropy="rans")
    enc_t, dec_t = build_transform_fns(cfg, h, w)
    # the grouped path fuses the subband permutation into the laning
    # (rans_mod.block_lanes), so its transform skips to_subbands
    enc_tb, dec_tb = build_transform_fns(cfg.replace(subbands=False), h, w)
    b = cfg.block_size

    n_syms = frames.size
    s_streams = rans_mod.RANSCodec._pick_streams(n_syms, 65536)
    l_steps = n_syms // s_streams

    # models trained once on the first frame (static side info)
    k0 = np.asarray(jax.jit(enc_t)(jnp.asarray(frames[:1])))
    freqs = rans_mod.quantize_freqs(
        np.bincount(k0.reshape(-1), minlength=256), min_all=True
    )
    cums = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.uint32)
    f_j = jnp.asarray(freqs.astype(np.uint32))
    c_j = jnp.asarray(cums)
    fg, cg = rans_mod.subband_group_freqs(k0, b)
    fg_j, cg_j = jnp.asarray(fg), jnp.asarray(cg)
    frames_dev = jax.device_put(frames)

    # ------------------------------------------------------------------
    # RTT-amortized timing: run `reps` iterations inside one dispatch.
    # ------------------------------------------------------------------
    def timed(fn_reps, *args):
        """fn_reps(reps, *args) -> scalar checksum; returns s/rep.

        min-of-3 per rep count after 4 warm calls: freshly uploaded
        executables run ~5x slow for 1-2 executions (PERF_NOTES), and a
        slow t_lo silently UNDER-measures the difference (r4 probe 30
        caught a 2x swing this way)."""
        for _ in range(max(WARMUP, 4)):
            int(fn_reps(jnp.int32(REPS_LO), *args))
        t_los, t_his = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            int(fn_reps(jnp.int32(REPS_LO), *args))
            t_los.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(fn_reps(jnp.int32(REPS_HI), *args))
            t_his.append(time.perf_counter() - t0)
        return (max(min(t_his) - min(t_los), 1e-9)
                / (REPS_HI - REPS_LO), min(t_los))

    # ---- dense device codec (single global model) ------------------------
    @jax.jit
    def encode_dense_reps(reps, fd):
        def body(i, acc):
            planes = enc_t(jnp.roll(fd, i, axis=0))
            syms = planes.reshape(l_steps, s_streams).T
            w, nw, st = rans_mod.jax_encode(syms, f_j, c_j)
            # consume actual WORDS: a checksum of only (nw, st) lets
            # XLA dead-code-eliminate the word compaction pass and
            # under-times the encode (found in r3)
            return acc + nw + st[0].astype(jnp.int32) \
                + jnp.sum(w[:8].astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @jax.jit
    def encode_dense(fd):
        planes = enc_t(fd)
        syms = planes.reshape(l_steps, s_streams).T
        return rans_mod.jax_encode(syms, f_j, c_j)

    t_enc, rtt = timed(encode_dense_reps, frames_dev)
    words, n_words, states = encode_dense(frames_dev)
    nw = int(n_words)
    wpad = jax.block_until_ready(jnp.concatenate(
        [words[:nw], jnp.zeros((s_streams + 16,), jnp.uint16)]))

    @jax.jit
    def decode_dense_reps(reps, wp, st):
        def body(i, acc):
            # i-dependent state perturbation so XLA cannot hoist the
            # loop-invariant decode out of the rep loop (timing only;
            # the checked reconstruction uses decode_dense below).
            # jnp.sum consumes EVERY output element: a single-element
            # probe lets XLA DCE whatever work that element does not
            # depend on (r4 honesty fix, the decode-side twin of r3's
            # words-consumption fix)
            st_i = st ^ (i.astype(jnp.uint32) & jnp.uint32(1))
            syms = rans_mod.jax_decode(wp, jnp.int32(0), st_i, f_j, c_j,
                                       l_steps)
            planes = syms.T.reshape(n_frames, h, w, 3)
            rec = dec_t(planes)
            return acc + jnp.sum(rec.astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @jax.jit
    def decode_dense(wp, st):
        syms = rans_mod.jax_decode(wp, jnp.int32(0), st, f_j, c_j, l_steps)
        return dec_t(syms.T.reshape(n_frames, h, w, 3))

    t_dec, _ = timed(decode_dense_reps, wpad, states)
    rec_np = np.asarray(jax.device_get(decode_dense(wpad, states)))
    err = float(np.sqrt(np.mean(
        (rec_np[:, :1080].astype(np.float64) - frames[:, :1080]) ** 2)))
    side_bytes = 4 * s_streams + len(_z.compress(freqs.astype("<u2").tobytes(), 9))
    bpp = (2 * nw + side_bytes) * 8 / (n_frames * h * w)
    gbps_dense = frames.nbytes / (t_enc + t_dec) / 1e9
    dense = {"encode_s": round(t_enc, 4), "decode_s": round(t_dec, 4),
             "gbps": round(gbps_dense, 4), "rmse": round(err, 3),
             "bpp": round(bpp, 4)}

    # ---- grouped device codec: one model per DCT subband, hier decode ----
    unroll = next(u for u in (5, 3, 2, 1) if l_steps % u == 0)

    @jax.jit
    def encode_grouped_reps(reps, fd):
        def body(i, acc):
            planes = enc_tb(jnp.roll(fd, i, axis=0))
            lanes = rans_mod.block_lanes(planes, b, s_streams)
            w_, nw_, st = rans_mod.jax_encode_grouped(lanes, fg_j, cg_j,
                                                      unroll=unroll)
            # consume words so the compaction pass cannot be DCE'd
            return acc + nw_ + st[0].astype(jnp.int32) \
                + jnp.sum(w_[:8].astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @jax.jit
    def encode_grouped(fd):
        planes = enc_tb(fd)
        lanes = rans_mod.block_lanes(planes, b, s_streams)
        return rans_mod.jax_encode_grouped(lanes, fg_j, cg_j, unroll=unroll,
                                           with_counts=True)

    # decode: Pallas whole-scan kernel (window pre-extraction INSIDE the
    # timed body — it is part of the decode cost) when the lane grid
    # tiles; XLA hierarchical scan otherwise
    g_groups = b * b
    sg_lanes = s_streams // g_groups
    unroll_d = next(u for u in (4, 3, 2, 1) if l_steps % u == 0)
    use_pallas_dec = (jax.default_backend() == "tpu"
                      and sg_lanes % 128 == 0)

    def make_grouped_decoder(cap):
        if use_pallas_dec:
            from vcf_tpu.ops.pallas import rans_decode as rd

            def dec_lanes(wp, cts, st_i):
                win = rd.build_windows(wp, cts, cap)
                return rd.pallas_decode_grouped(
                    win, st_i, fg_j, cg_j, l_steps, cap,
                    unroll=unroll_d, sg=sg_lanes)
        else:
            def dec_lanes(wp, cts, st_i):
                return rans_mod.jax_decode_hier(
                    wp, jnp.int32(0), st_i, fg_j, cg_j, l_steps,
                    unroll=unroll)

        @jax.jit
        def decode_grouped(wp, cts, st):
            lanes = dec_lanes(wp, cts, st)
            planes = rans_mod.block_unlanes(lanes, b, (n_frames, h, w, 3))
            return dec_tb(planes)

        @jax.jit
        def decode_grouped_reps(reps, wp, cts, st):
            def body(i, acc):
                st_i = st ^ (i.astype(jnp.uint32) & jnp.uint32(1))
                lanes = dec_lanes(wp, cts, st_i)
                planes = rans_mod.block_unlanes(
                    lanes, b, (n_frames, h, w, 3))
                rec = dec_tb(planes)
                return acc + jnp.sum(rec.astype(jnp.int32))
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        return decode_grouped, decode_grouped_reps

    # ---- grid-layout device codec (Pallas encode + decode kernels) ------
    # The interleaved-rANS lane alignment means the decoder's renorm
    # flags equal the encoder's emit flags LANE FOR LANE — so in the
    # device-resident (L, S) grid layout there is NO word routing at
    # all on either side.  The compact wire stream is a serialization
    # concern: finish_stream_pallas produces it (timed separately as
    # wire_stitch_s) and its bytes are what bpp counts.
    unroll_g = next(u for u in (4, 3, 2, 1) if l_steps % u == 0)
    use_grid = (jax.default_backend() == "tpu" and sg_lanes % 128 == 0)

    def run_grid():
        from vcf_tpu.ops import color as color_ops
        from vcf_tpu.ops.pallas import rans_decode as rd
        from vcf_tpu.ops.pallas import rans_encode as re_
        from vcf_tpu.ops.pallas.dct_kernel import (
            _chunk_w,
            fused_cdct_quantize,
            fused_dequantize_cdct,
        )

        # COLOR-FUSED SUBBAND-GRID pipeline (r5): the 3x3 color
        # transform, block DCT (with the subband-grid permutation in
        # the kron constants), and deadzone quantize run in ONE u8->u8
        # kernel per direction -- no (N, C, H, W) float32 tensor ever
        # round-trips HBM (the color einsums alone were ~2x200 MB per
        # direction, ~8 ms of the r4 wire path).  The entropy kernels
        # take/emit the L-major u8 lane layout directly
        # (grid_lanes_lmajor / lmajor=True), so laning is ONE
        # transpose each way and the encoder's reversal+byte-packing
        # XLA passes are gone (r5 probes 111-122).
        from vcf_tpu.ops.pallas.dct_kernel import static_mat

        MF = static_mat(color_ops.YCOCG_FWD)
        MI = static_mat(color_ops.YCOCG_INV)
        cw = _chunk_w(w, b)

        def make_lanes(fd):              # (N, H, W, 3) u8 -> (L, S) u8
            planes = jax.vmap(lambda fr: fused_cdct_quantize(
                fr, MF, b=b, qss=cfg.qss, offset=128, grid_layout=True))(
                fd.transpose(0, 3, 1, 2))
            return rans_mod.grid_lanes_lmajor(planes, b, s_streams,
                                              rows=32, cw=cw)

        def make_frames(lanes_lm):       # (L, S) u8 -> (N, H, W, 3) u8
            planes = rans_mod.grid_unlanes_lmajor(
                lanes_lm, b, (n_frames, 3, h, w), rows=32, cw=cw)
            pix = jax.vmap(lambda fr: fused_dequantize_cdct(
                fr, MI, b=b, qss=cfg.qss, offset=128, grid_layout=True))(planes)
            return pix.transpose(0, 2, 3, 1)

        # ---- device-resident path: raw u8 encode + grid decode ----------
        @jax.jit
        def encode_dev(fd):
            lanes = make_lanes(fd)
            return re_.pallas_encode_grouped_raw_u8(
                lanes, fg_j, cg_j, unroll=unroll_g, sg=sg_lanes,
                lmajor=True)

        @jax.jit
        def encode_dev_reps(reps, fd):
            def body(i, acc):
                le, st = encode_dev(jnp.roll(fd, i, axis=0))
                return acc + le[0, 0] + le[l_steps - 1, 1] \
                    + st[0].astype(jnp.int32)
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        @jax.jit
        def decode_dev_reps(reps, le, st):
            def body(i, acc):
                st_i = st ^ (i.astype(jnp.uint32) & jnp.uint32(1))
                lanes = rd.pallas_decode_grouped_grid(
                    le, st_i, fg_j, cg_j, l_steps, unroll=unroll_g,
                    sg=sg_lanes, lmajor=True)
                rec = make_frames(lanes)
                return acc + jnp.sum(rec.astype(jnp.int32))
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        t_enc_d, _ = timed(encode_dev_reps, frames_dev)
        gle, gst = encode_dev(frames_dev)
        gle = jax.block_until_ready(gle)
        t_dec_d, _ = timed(decode_dev_reps, gle, gst)

        # ---- wire-complete path: compact u8 encode + windowed decode ----
        # compact per-step prefix rows come out of the encode kernel
        # itself (matmul-rank + carry-hi packed compaction); the stream
        # assembles with one cap-sliced scan -- the separate
        # finish_stream stitch pass of r4 (10.9 ms) is gone.
        CAPW = 2048

        @jax.jit
        def encode_wire(fd):
            lanes = make_lanes(fd)
            rows, counts, st = re_.pallas_encode_grouped_u8(
                lanes, fg_j, cg_j, unroll=unroll_g, sg=sg_lanes,
                lmajor=True)
            words, n_words = re_.assemble_stream(rows[:, :CAPW], counts)
            return words, n_words, st, counts

        @jax.jit
        def encode_wire_reps(reps, fd):
            def body(i, acc):
                words, n_words, st, counts = encode_wire(
                    jnp.roll(fd, i, axis=0))
                return (acc + n_words + jnp.sum(words[:8].astype(jnp.int32))
                        + words[0].astype(jnp.int32)
                        + st[0].astype(jnp.int32) + counts[0])
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        t_enc_w, _ = timed(encode_wire_reps, frames_dev)
        words, n_words, wst, wcounts = encode_wire(frames_dev)
        gnw_i = int(n_words)
        assert int(jnp.max(wcounts)) <= CAPW, "wire cap exceeded"
        gcounts_h = np.asarray(wcounts).astype(np.int32)
        cap = sg_lanes * max(1, -(-int(gcounts_h.max()) // sg_lanes))
        cap = min(cap, s_streams)
        wpad = jax.block_until_ready(jnp.concatenate(
            [words[:gnw_i], jnp.zeros((cap + s_streams + 16,), jnp.uint16)]))
        gcts = jnp.asarray(gcounts_h)

        @jax.jit
        def decode_wire(wp, cts, st):
            win = rd.build_windows(wp, cts, cap)
            lanes = rd.pallas_decode_grouped(
                win, st, fg_j, cg_j, l_steps, cap,
                unroll=unroll_g, sg=sg_lanes, lmajor=True)
            return make_frames(lanes)

        @jax.jit
        def decode_wire_reps(reps, wp, cts, st):
            def body(i, acc):
                st_i = st ^ (i.astype(jnp.uint32) & jnp.uint32(1))
                win = rd.build_windows(wp, cts, cap)
                lanes = rd.pallas_decode_grouped(
                    win, st_i, fg_j, cg_j, l_steps, cap,
                    unroll=unroll_g, sg=sg_lanes, lmajor=True)
                rec = make_frames(lanes)
                return acc + jnp.sum(rec.astype(jnp.int32))
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        t_dec_w, _ = timed(decode_wire_reps, wpad, gcts, wst)
        rec_g = np.asarray(jax.device_get(decode_wire(wpad, gcts, wst)))
        err_g = float(np.sqrt(np.mean(
            (rec_g[:, :1080].astype(np.float64) - frames[:, :1080]) ** 2)))

        side_g = 4 * s_streams + len(_z.compress(fg.astype("<u2").tobytes(), 9))
        side_g += len(_z.compress(gcounts_h.astype("<u4").tobytes(), 9))
        wire_gbps = frames.nbytes / (t_enc_w + t_dec_w) / 1e9
        return {
            "encode_s": round(t_enc_w, 4), "decode_s": round(t_dec_w, 4),
            "gbps": round(wire_gbps, 4),
            "rmse": round(err_g, 3),
            "bpp": round((2 * gnw_i + side_g) * 8 / (n_frames * h * w), 4),
            "layout": "color-fused subband-grid kernels; L-major u8 "
                      "lanes; bpp counts the compact wire bytes",
            "wire_gbps": round(wire_gbps, 4),
            "device_resident": {
                "encode_s": round(t_enc_d, 4),
                "decode_s": round(t_dec_d, 4),
                "gbps": round(frames.nbytes / (t_enc_d + t_dec_d) / 1e9, 4),
            },
            "pallas": "color-fused DCT + u8-lane rANS kernels both ways",
        }

    def run_grouped_stream():
        t_enc_g, _ = timed(encode_grouped_reps, frames_dev)
        gw, gnw, gst, gcounts = encode_grouped(frames_dev)
        gnw_i = int(gnw)
        gcounts_h = np.asarray(gcounts).astype(np.int32)
        gcap = sg_lanes * max(1, -(-int(gcounts_h.max()) // sg_lanes))
        gcap = min(gcap, s_streams)
        gwpad = jax.block_until_ready(jnp.concatenate(
            [gw[:gnw_i],
             jnp.zeros((gcap + s_streams + 16,), jnp.uint16)]))
        gcts = jnp.asarray(gcounts_h)
        decode_grouped, decode_grouped_reps = make_grouped_decoder(gcap)
        t_dec_g, _ = timed(decode_grouped_reps, gwpad, gcts, gst)
        rec_g = np.asarray(jax.device_get(decode_grouped(gwpad, gcts, gst)))
        err_g = float(np.sqrt(np.mean(
            (rec_g[:, :1080].astype(np.float64) - frames[:, :1080]) ** 2)))
        side_g = 4 * s_streams + len(_z.compress(fg.astype("<u2").tobytes(), 9))
        side_g += len(_z.compress(gcounts_h.astype("<u4").tobytes(), 9))
        return {
            "encode_s": round(t_enc_g, 4), "decode_s": round(t_dec_g, 4),
            "gbps": round(frames.nbytes / (t_enc_g + t_dec_g) / 1e9, 4),
            "rmse": round(err_g, 3),
            "bpp": round((2 * gnw_i + side_g) * 8 / (n_frames * h * w), 4),
            "pallas_decode": bool(use_pallas_dec),
        }

    grouped = None
    try:
        grouped = run_grid() if use_grid else run_grouped_stream()
    except Exception as e:  # pragma: no cover - perf fallback only
        import sys, traceback

        traceback.print_exc(file=sys.stderr)
        grouped = {"error": repr(e)[:200]}

    # ---- transform-only device throughput (no entropy) -------------------
    @jax.jit
    def roundtrip_reps(reps, fd):
        def body(i, acc):
            rec = dec_t(enc_t(jnp.roll(fd, i, axis=0)))
            return acc + jnp.sum(rec.astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    t_tr, _ = timed(roundtrip_reps, frames_dev)
    transform_gbps = frames.nbytes / t_tr / 1e9

    # ---- host-to-host with host C++ Huffman (tunnel-bound here) ----------
    huff = get_entropy("huffman", cfg)
    enc_j, dec_j = jax.jit(enc_t), jax.jit(dec_t)
    chunk = 4
    chunks = [
        jax.device_put(frames[i: i + chunk]) for i in range(0, n_frames, chunk)
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
    best_gbps, best_entropy = gbps_dense, "rans(device)"
    best = dict(dense)

    def lossless(cand):  # entropy is lossless, so rmse must match dense
        # compare at the stored rounding (both dicts carry round(.,3))
        return (cand and "gbps" in cand
                and abs(cand["rmse"] - round(err, 3)) < 2e-3)

    # the flagship is the grouped (per-subband-model) path whenever it is
    # rate-better and within 15% of dense speed (VERDICT r1 item 2)
    if lossless(grouped) and grouped["bpp"] < best["bpp"] \
            and grouped["gbps"] > 0.85 * best_gbps:
        best_gbps = grouped["gbps"]
        best_entropy = ("grouped-rans(device,grid)" if "layout" in grouped
                        else "grouped-rans(device)")
        best = {k: grouped[k] for k in ("encode_s", "decode_s", "gbps",
                                        "rmse", "bpp")}
    result = {
        "metric": "wire-complete encode+decode GB/s per chip "
                  "(1080p, DCT+deadzone+rANS, full codec incl. entropy "
                  "and compact-stream serialization both ways)",
        "value": round(best_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(best_gbps / baseline_per_chip, 3),
        "detail": {
            "encode_s": best["encode_s"],
            "decode_s": best["decode_s"],
            "transform_only_gbps": round(transform_gbps, 3),
            "host_to_host_gbps": round(h2h_gbps, 4),
            "rmse": best["rmse"],
            "bpp": best["bpp"],
            "frames": n_frames,
            "devices": len(jax.devices()),
            "pallas": bool(cfg.use_pallas
                           and jax.default_backend() == "tpu"),
            "entropy": best_entropy,
            "timing": "per-rep via in-dispatch fori_loop, RTT-subtracted",
            "dispatch_rtt_s": round(max(rtt - t_enc, 0.0), 4),
            "dense": dense,
            "grouped": grouped,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
