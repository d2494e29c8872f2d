"""Device (one-dispatch) grouped-rANS entropy for the DWT pipeline.

The reference writes one host stream per subband
(/root/reference/src/2D-DWT.py:162-200); r4's vcf_tpu did the same,
which left the DWT+entropy configs at host speed (VERDICT r4 missing
#1: 0.0008 GB/s — 16 host codec calls plus a per-band quantize
dispatch each).  Here the whole entropy stage is device-resident and
ONE logical dispatch each way:

* Every subband becomes one rANS GROUP with its own probability table
  (the per-band statistics the reference's per-band streams capture).
  The LL band is 16-bit and becomes TWO groups (hi/lo byte planes).
* All groups get the same lane count `sg` (a 128-multiple so the
  Pallas grid kernels apply); short bands pad with the deadzone zero
  symbol, whose cost is ~0 bits/symbol under the band's own table.
* On TPU the encode/decode scans run in the Pallas whole-scan kernels
  (ops/pallas/rans_{encode,decode}.py); elsewhere the XLA grouped scan
  produces the identical stream.

Wire format (sidecar ``gdwt_model``): u8 version | u32 G | u32 sg |
u32 L | u32 n_words | u32 qss | states (S u32) | u32 counts_zlib_len |
zlib(u32 per-step renorm counts) | zlib(u16 freqs[G*256]).  Band
shapes ride in the pipeline's meta JSON.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vcf_tpu.entropy import rans as rans_mod
from vcf_tpu.ops import hist as hist_ops

K_PROB = rans_mod.K_PROB


def grid_dims(band_sizes: Sequence[int], tpu: bool,
              syms_per_lane: int = 512) -> Tuple[int, int]:
    """(sg, L) for the uniform lane grid.  Lane count targets
    `syms_per_lane` symbols per lane over the whole image (512 keeps
    the 4-byte final-state sidecar under ~0.07 bits/symbol, same rule
    as RANSCodec._pick_streams; 256 halves the scan length for ~2x
    throughput at ~+0.07 bpp — the batch-bench operating point); on
    TPU sg rounds to a 128-multiple so the Pallas grid kernels apply,
    and L rounds so the packed stitch chunks divide
    (sg * L % 32768 == 0)."""
    n_total = sum(band_sizes)
    n_max = max(band_sizes)
    g = len(band_sizes)
    target = max(8, n_total // syms_per_lane // g)
    if tpu and target >= 96:
        sg = -(-target // 128) * 128
    else:
        sg = 1 << int(np.floor(np.log2(target)))
    l = -(-n_max // sg)
    step = 256 if (tpu and sg % 128 == 0) else 4
    l = -(-l // step) * step
    return sg, l


def _band_to_lanes(flat_u8: jnp.ndarray, sg: int, l: int) -> jnp.ndarray:
    """(n,) u8 -> (sg, L) lane block, padded with 128 (deadzone zero).

    Lane-MAJOR: lane j codes the contiguous raster span
    flat[j*L : (j+1)*L], so a lane's previous symbol is the spatially
    adjacent coefficient — the order-1 context the ctx tables condition
    on (r5; order-0 rate is order-invariant)."""
    n = flat_u8.shape[0]
    pad = sg * l - n
    filled = jnp.concatenate(
        [flat_u8, jnp.full((pad,), 128, jnp.uint8)])
    return filled.reshape(sg, l)


def _lanes_to_band(block: jnp.ndarray, n: int) -> jnp.ndarray:
    """(sg, L) -> first n symbols in the _band_to_lanes order."""
    return block.reshape(-1)[:n]


def bands_to_grid(bands_u8: List[jnp.ndarray], sg: int, l: int) -> jnp.ndarray:
    """List of flat u8 bands -> (G*sg, L) grouped lane grid."""
    return jnp.concatenate(
        [_band_to_lanes(b.reshape(-1), sg, l) for b in bands_u8], axis=0)


def grid_to_bands(lanes: jnp.ndarray, sizes: Sequence[int],
                  sg: int) -> List[jnp.ndarray]:
    out = []
    for i, n in enumerate(sizes):
        out.append(_lanes_to_band(lanes[i * sg:(i + 1) * sg], n))
    return out


def train_tables(lanes: jnp.ndarray, g: int,
                 sg: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-group quantized freq/cum tables from the data itself (the
    scatter-free device histogram; quantize_freqs on host — the tables
    are codestream side info either way)."""
    counts = jax.jit(
        lambda x: jax.vmap(lambda row: hist_ops.histogram(row, 256))(
            x.reshape(g, -1).astype(jnp.int32))
    )(lanes)
    counts_h = np.asarray(counts)
    fg = np.stack([
        rans_mod.quantize_freqs(counts_h[i], min_all=True)
        for i in range(g)
    ]).astype(np.uint32)
    cg = np.concatenate(
        [np.zeros((g, 1), np.uint32),
         np.cumsum(fg, axis=1)[:, :255].astype(np.uint32)], axis=1)
    return fg, cg


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def encode_grid(lanes: jnp.ndarray, fg: np.ndarray, cg: np.ndarray,
                sg: int) -> Tuple[np.ndarray, int, np.ndarray, np.ndarray]:
    """(S, L) u8 lanes -> (words u16, n_words, states u32, counts i32).
    Pallas whole-scan kernel + packed stitch on TPU; XLA grouped scan
    elsewhere (bit-identical streams)."""
    s, l = lanes.shape
    fg_j, cg_j = jnp.asarray(fg), jnp.asarray(cg)
    unroll = next(u for u in (4, 3, 2, 1) if l % u == 0)
    if _use_pallas() and sg % 128 == 0 and (sg * l) % 32768 == 0:
        from vcf_tpu.ops.pallas import rans_encode as re_

        @jax.jit
        def run(lanes):
            le, st = re_.pallas_encode_grouped_raw(
                lanes, fg_j, cg_j, unroll=unroll, sg=sg)
            words, n_words, counts = re_.finish_stream_pallas(
                le, chunk=32768, radix=2)
            return words, n_words, st, counts

        words, n_words, st, counts = run(lanes)
    else:
        @jax.jit
        def run(lanes):
            return rans_mod.jax_encode_grouped(
                lanes, fg_j, cg_j, unroll=unroll, with_counts=True)

        words, n_words, st, counts = run(lanes)
    n = int(n_words)
    return (np.asarray(words[:n]), n,
            np.asarray(st), np.asarray(counts, np.int64))


def decode_grid(words: np.ndarray, states: np.ndarray,
                counts: np.ndarray, fg: np.ndarray, cg: np.ndarray,
                g: int, sg: int, l: int) -> jnp.ndarray:
    """Inverse of encode_grid -> (S, L) u8 lanes on device."""
    fg_j, cg_j = jnp.asarray(fg), jnp.asarray(cg)
    st_j = jnp.asarray(states)
    unroll = next(u for u in (4, 3, 2, 1) if l % u == 0)
    if _use_pallas() and sg % 128 == 0 and (sg * l) % 32768 == 0:
        from vcf_tpu.ops.pallas import rans_decode as rd

        cap = sg * max(1, -(-int(counts.max()) // sg)) if counts.size else sg
        cap = min(cap, g * sg)
        wpad = jnp.concatenate([
            jnp.asarray(words),
            jnp.zeros((cap + g * sg + 16,), jnp.uint16)])
        cts = jnp.asarray(counts.astype(np.int32))

        @jax.jit
        def run(wp, cts, st):
            win = rd.build_windows(wp, cts, cap)
            return rd.pallas_decode_grouped(
                win, st, fg_j, cg_j, l, cap, unroll=unroll, sg=sg)

        return run(wpad, cts, st_j)
    wpad = jnp.concatenate([
        jnp.asarray(words), jnp.zeros((g * sg + 16,), jnp.uint16)])

    @jax.jit
    def run(wp, st):
        return rans_mod.jax_decode_hier(
            wp, jnp.int32(0), st, fg_j, cg_j, l, unroll=unroll)

    return run(wpad, st_j)


# ---------------------------------------------------------------------------
# Order-1 context variant (r5): per-(band, prev-symbol-class) tables.
# The lane-major raster layout makes each lane's previous symbol the
# spatially adjacent coefficient — exactly the run structure that kept
# order-0 grans ~0.9 bpp above zlib on DWT detail bands.
# ---------------------------------------------------------------------------

def train_ctx_tables(lanes: jnp.ndarray, g: int, sg: int,
                     n_ctx: int) -> Tuple[np.ndarray, np.ndarray]:
    counts = np.asarray(rans_mod.ctx_group_histograms(lanes, g, n_ctx))
    return rans_mod.ctx_freqs_from_counts(counts)


def encode_grid_ctx(lanes: jnp.ndarray, fgc: np.ndarray, cgc: np.ndarray,
                    sg: int):
    """(S, L) u8 lanes + (G, n_ctx, 256) tables -> same wire tuple as
    encode_grid, coded with the order-1 context kernels/scan."""
    s, l = lanes.shape
    fj, cj = jnp.asarray(fgc), jnp.asarray(cgc)
    unroll = next(u for u in (4, 3, 2, 1) if l % u == 0)
    if _use_pallas() and sg % 128 == 0 and (sg * l) % 32768 == 0:
        from vcf_tpu.ops.pallas import rans_ctx as rc
        from vcf_tpu.ops.pallas import rans_encode as re_

        @jax.jit
        def run(lanes):
            le, st = rc.pallas_encode_ctx_raw_u8(
                lanes, fj, cj, unroll=unroll, sg=sg)
            words, n_words, counts = re_.finish_stream_pallas(
                le, chunk=32768, radix=2)
            return words, n_words, st, counts

        words, n_words, st, counts = run(lanes)
    else:
        words, n_words, st, counts = rans_mod.jax_encode_ctx(lanes, fj, cj)
    n = int(n_words)
    return (np.asarray(words[:n]), n, np.asarray(st),
            np.asarray(counts, np.int64))


def decode_grid_ctx(words: np.ndarray, states: np.ndarray,
                    counts: np.ndarray, fgc: np.ndarray, cgc: np.ndarray,
                    g: int, sg: int, l: int) -> jnp.ndarray:
    fj, cj = jnp.asarray(fgc), jnp.asarray(cgc)
    st_j = jnp.asarray(states)
    unroll = next(u for u in (4, 3, 2, 1) if l % u == 0)
    if _use_pallas() and sg % 128 == 0 and (sg * l) % 32768 == 0:
        from vcf_tpu.ops.pallas import rans_ctx as rc
        from vcf_tpu.ops.pallas import rans_decode as rd

        cap = sg * max(1, -(-int(counts.max()) // sg)) if counts.size else sg
        cap = min(cap, g * sg)
        wpad = jnp.concatenate([
            jnp.asarray(words),
            jnp.zeros((cap + g * sg + 16,), jnp.uint16)])
        cts = jnp.asarray(counts.astype(np.int32))

        @jax.jit
        def run(wp, cts, st):
            win = rd.build_windows(wp, cts, cap)
            return rc.pallas_decode_ctx(
                win, st, fj, cj, l, cap, unroll=unroll, sg=sg)

        return run(wpad, cts, st_j)
    wpad = jnp.concatenate([
        jnp.asarray(words), jnp.zeros((g * sg + 16,), jnp.uint16)])
    return rans_mod.jax_decode_ctx(wpad, st_j, fj, cj, l)


# ---------------------------------------------------------------------------
# Sidecar serialization
# ---------------------------------------------------------------------------

def pack_model(g: int, sg: int, l: int, n_words: int, qss: int,
               states: np.ndarray, counts: np.ndarray,
               fg: np.ndarray, n_ctx: int = 0) -> bytes:
    """n_ctx == 0: order-0 (version 1, fg (G, 256)); n_ctx > 0:
    order-1 context (version 2, fg (G, n_ctx, 256))."""
    counts_z = zlib.compress(counts.astype("<u4").tobytes(), 6)
    ver = 2 if n_ctx else 1
    head = struct.pack("<BIIIII", ver, g, sg, l, n_words, qss)
    if n_ctx:
        head += struct.pack("<B", n_ctx)
    return (head
            + states.astype("<u4").tobytes()
            + struct.pack("<I", len(counts_z)) + counts_z
            + zlib.compress(fg.astype("<u2").tobytes(), 9))


def unpack_model(blob: bytes):
    ver, g, sg, l, n_words, qss = struct.unpack_from("<BIIIII", blob, 0)
    if ver not in (1, 2):
        raise ValueError(f"gdwt_model version {ver}")
    off = 21
    n_ctx = 0
    if ver == 2:
        (n_ctx,) = struct.unpack_from("<B", blob, off)
        off += 1
    s = g * sg
    states = np.frombuffer(blob, "<u4", s, off).copy()
    off += 4 * s
    (clen,) = struct.unpack_from("<I", blob, off)
    off += 4
    counts = np.frombuffer(zlib.decompress(blob[off:off + clen]), "<u4"
                           ).astype(np.int64)
    off += clen
    raw = np.frombuffer(zlib.decompress(blob[off:]), "<u2"
                        ).astype(np.uint32)
    if n_ctx:
        fg = raw.reshape(g, n_ctx, 256)
        cg = np.concatenate(
            [np.zeros((g, n_ctx, 1), np.uint32),
             np.cumsum(fg, axis=2)[:, :, :255].astype(np.uint32)], axis=2)
    else:
        fg = raw.reshape(g, 256)
        cg = np.concatenate(
            [np.zeros((g, 1), np.uint32),
             np.cumsum(fg, axis=1)[:, :255].astype(np.uint32)], axis=1)
    return g, sg, l, n_words, qss, states, counts, fg, cg, n_ctx
