"""Pallas grouped-rANS decode: the whole decode scan in ONE kernel.

The XLA decode scan (entropy/rans.py jax_decode_hier) pays per-step XLA
kernel-launch latency for every butterfly stage and resolve op — at 765
steps x ~40 ops that overhead IS the decode wall (VERDICT r2 weak item
1: decode 2.2x encode).  Here the whole scan runs inside one
`pl.pallas_call`: states live in VMEM scratch across a sequential grid,
per-step word windows are pre-extracted (the encoder stores per-step
renorm counts in the sidecar) and streamed in by the Pallas pipeline
(double-buffered DMA overlaps the compute), and each stage is raw VPU/
MXU work with no dispatch in between.

Design (TPU-first, no reference analogue — src/CBAAC.py is a serial
byte coder):

* State layout (G, SG): ROW = subband group.  Every per-group table
  value becomes a row-broadcast, never a per-lane fetch.  Lane id
  s = g * SG + i matches the (S,) order of the XLA path, so streams
  are format-identical.
* Symbol resolve: two-level.  Coarse bucket via 16 row-broadcast
  compares; fine via ONE batched (G, 16, 34) @ (G, 16, SG) bf16 MXU
  matmul on the coarse one-hot fetching 17 boundaries per bucket as
  hi/lo bytes (each exact in bf16, f32 accumulation — see
  _resolve_chunk), then 16 compares against the fetched boundaries.
  freq = difference of adjacent boundaries; sym = 16*bucket + lo.
* Word absorb: PULL-routing (see entropy/rans.py butterfly_expand):
  each lane pulls its window word through log4(S) shift stages keyed
  by base-4 digits of delta = lane - rank.  Reads never collide and
  lanes only ever pull from s' <= s, so no edge masking is needed.
* Windows: row t of `windows` holds the c_t words decode step t
  renormalizes with, already aligned to the step (built by
  `build_windows` from the sidecar counts) — the kernel has NO
  data-dependent pointer at all.

Mosaic dtype rules (probed on the v5e, 2026-08): uint32<->float32 and
uint16->uint32 converts are unsupported, and 8-bit stores are risky —
so ALL state arithmetic here is int32 with explicit logical shifts
(wrapping int32 multiply equals the uint32 low bits), the resolve runs
on nonnegative int32->f32 casts, windows are pre-widened to int32, and
each grid step stores `unroll` symbols PACKED into one int32 lane
(unpacked to uint8 outside the kernel).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_PROB = 15
MASK = (1 << K_PROB) - 1
RANS_L = 1 << 16


# ---------------------------------------------------------------------------
# Window pre-extraction (device, outside the kernel)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cap",))
def build_windows(words_padded: jnp.ndarray, counts: jnp.ndarray, cap: int):
    """words_padded (>= n_words + cap,) u16, counts (L,) i32 per decode
    step -> (L, cap) i32: row t = words[ptr_t : ptr_t + cap] where
    ptr_t is the exclusive cumsum of counts.  One scan of L dynamic
    slices (sequential HBM reads).  int32 because Mosaic cannot widen
    u16 in-kernel."""
    w32 = words_padded.astype(jnp.int32)
    ptrs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    def body(_, p):
        return None, jax.lax.dynamic_slice(w32, (p,), (cap,))

    # unroll amortizes the per-step scan overhead (the slices are
    # latency-bound, ~8 us/step un-unrolled on the v5e)
    _, win = jax.lax.scan(body, None, ptrs, unroll=8)
    return win


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _flat_shift_right(x, off, sg):
    """x (R, SG) viewed as a flat row-major vector, shifted right by
    `off` (left-fill irrelevant: pull-routing never selects it)."""
    rr, cc = off // sg, off % sg
    if cc:
        y = pltpu.roll(x, cc, 1)
        carry = pltpu.roll(y, 1, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = jnp.where(col < cc, carry, y)
    else:
        y = x
    if rr:
        y = pltpu.roll(y, rr, 0)
    return y


def _flat_rank(flags, g, sg):
    """Exclusive prefix count of `flags` (G, SG) bool in flat row-major
    order: within-row prefix (log2(SG) masked shift-adds) + per-row
    offsets (sublane cumsum via log2(G) rolls).  Returns (G, SG) i32."""
    fi = jnp.where(flags, 1, 0)
    csum = fi
    k = 1
    while k < sg:
        sh = pltpu.roll(csum, k, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, fi.shape, 1)
        csum = csum + jnp.where(col >= k, sh, 0)
        k <<= 1
    row_tot = jnp.broadcast_to(csum[:, sg - 1:sg], (g, sg))  # inclusive row sums
    row_pre = row_tot
    k = 1
    while k < g:
        sh = pltpu.roll(row_pre, k, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, fi.shape, 0)
        row_pre = row_pre + jnp.where(row >= k, sh, 0)
        k <<= 1
    row_excl = row_pre - row_tot                  # flags in rows above
    return row_excl + csum - fi                   # exclusive flat rank


def _flat_idx(g, sg):
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sg), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (g, sg), 0)
    return row * sg + col


def _flat_rank_mm(flags, tri, g, sg):
    """Exclusive flat rank with the within-row prefix as ONE bf16 MXU
    matmul (f32 accumulation — exact for counts < 2^24) + log2(g)
    sublane stages.  tri: (sg, sg) inclusive lower-triangular 0/1
    bf16.  Replaces _flat_rank's log2(sg) lane-roll stages (r5)."""
    fi = jnp.where(flags, 1, 0)
    csum = jnp.dot(fi.astype(jnp.bfloat16), tri,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    row_tot = jnp.broadcast_to(csum[:, sg - 1:sg], (g, sg))
    row_pre = row_tot
    k = 1
    while k < g:
        sh = pltpu.roll(row_pre, k, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, fi.shape, 0)
        row_pre = row_pre + jnp.where(row >= k, sh, 0)
        k <<= 1
    row_excl = row_pre - row_tot
    return row_excl + csum - fi


def _pull_expand(window_lanes, renorm, g, sg, tri=None):
    """Route packed window words to renorming lanes (pull-routing).
    window_lanes (G, SG) i32: words at flat positions 0..c-1.
    renorm (G, SG) bool.  Returns (G, SG) i32 routed values."""
    s = g * sg
    rank = (_flat_rank_mm(renorm, tri, g, sg) if tri is not None
            else _flat_rank(renorm, g, sg))
    idx = _flat_idx(g, sg)
    delta = idx - rank                            # monotone, steps {0, 1}
    val = window_lanes
    n_bits = max(int(np.ceil(np.log2(max(s, 2)))), 1)
    # MSB-first radix-2: one shifted merge per bit (16 at S=65536) vs
    # radix-4's 3 per digit level (24) — pull stages carry only `val`,
    # so fewer merges wins outright (r5; mirrors the r4 radix-2 stitch)
    for bit in range(n_bits - 1, -1, -1):
        off = 1 << bit
        if off >= s:
            continue
        d = (delta >> bit) & 1
        val = jnp.where(d == 1, _flat_shift_right(val, off, sg), val)
    return val


def _resolve_chunk(slot_f, coarse_c, thl_c, gc, sg):
    """Symbol resolve for a GC-row chunk: slot_f (GC, SG) f32 ->
    (sym, f, cum) i32 each (GC, SG).  Chunked so the (GC, 16, SG)
    intermediates stay under the 16 MB scoped-VMEM stack limit.

    thl_c (GC, 16, 34) bf16 is the split boundary table from
    `_split_tables`: per bucket b, 17 boundaries cums[16b..16b+16]
    (boundary 16 = the NEXT bucket's base, 32768 past the end) split
    into high and low bytes.  Each byte <= 255 is exact in bf16, the
    one-hot is exact in bf16, and the MXU accumulates in f32 — so ONE
    default-precision bf16 matmul fetches everything exactly (a f32
    HIGHEST fetch costs 3 MXU passes per matmul and measured 2.2x
    slower end-to-end on the v5e).  freq falls out as the difference
    of adjacent boundaries: f = c[k+1] - c[k]."""
    bucket = jnp.zeros((gc, sg), jnp.int32)
    for j in range(1, 16):
        bucket += jnp.where(slot_f >= coarse_c[:, j:j + 1], 1, 0)
    # fine fetch: batched (GC, 16, 34) @ (GC, 16, SG) on the coarse one-hot
    i16 = jax.lax.broadcasted_iota(jnp.int32, (gc, 16, sg), 1)
    # (i1 -> bf16 select trips a Mosaic relayout; go through f32)
    oh1 = jnp.where(bucket[:, None, :] == i16,
                    1.0, 0.0).astype(jnp.bfloat16)          # (GC, 16, SG)
    # contract the BUCKET axis of thl (dim 1) with the one-hot's
    # bucket axis: fetched[g, k, s] = thl[g, bucket(s), k]
    dn = (((1,), (1,)), ((0,), (0,)))
    fetched = jax.lax.dot_general(thl_c, oh1, dn,
                                  preferred_element_type=jnp.float32)
    fine_c = fetched[:, :17, :] * 256.0 + fetched[:, 17:, :]  # (GC, 17, SG)
    ge2 = jnp.where(slot_f[:, None, :] >= fine_c[:, :16, :],
                    1.0, 0.0)                                 # (GC, 16, SG)
    oh2 = ge2 - jnp.concatenate(
        [ge2[:, 1:, :], jnp.zeros((gc, 1, sg), jnp.float32)], axis=1)
    lo = jnp.sum(ge2, axis=1) - 1.0
    cum = jnp.sum(oh2 * fine_c[:, :16, :], axis=1)
    nxt = jnp.sum(oh2 * fine_c[:, 1:, :], axis=1)
    f = (nxt - cum).astype(jnp.int32)
    cum = cum.astype(jnp.int32)
    sym = bucket * 16 + lo.astype(jnp.int32)
    return sym, f, cum


def _split_tables(cums_g):
    """(G, 256) u32 cumulative boundaries -> (coarse (G, 16) f32,
    thl (G, 16, 34) bf16) for `_resolve_chunk`: 17 boundaries per
    bucket (the 17th = next bucket's base; 2^15 after the last) split
    into hi/lo bytes, concatenated along the fetch axis."""
    cx = jnp.concatenate(
        [jnp.asarray(cums_g).astype(jnp.int32),
         jnp.full((cums_g.shape[0], 1), 1 << K_PROB, jnp.int32)], axis=1)
    g = cx.shape[0]
    # t17[g, b, k] = cums[g, 16b + k], k = 0..16
    idx = (jnp.arange(16)[:, None] * 16 + jnp.arange(17)[None, :]).reshape(-1)
    t17 = cx[:, idx].reshape(g, 16, 17)
    thl = jnp.concatenate([(t17 >> 8).astype(jnp.bfloat16),
                           (t17 & 255).astype(jnp.bfloat16)], axis=2)
    coarse = cx[:, :256:16].astype(jnp.float32)
    return coarse, thl


def _decode_body(x, win_rows, coarse_ref, thl_ref, g, sg, wr,
                 gc=16, tri=None):
    """One symbol step on states x (G, SG) i32 (u32 bit pattern).
    win_rows (WR, SG) i32.  Returns (new_x, syms i32 in [0,255])."""
    slot = x & MASK                                # nonneg, < 2^15
    slot_f = slot.astype(jnp.float32)
    gc = math.gcd(g, gc)  # always a divisor of g: no short final slice
    parts = [
        _resolve_chunk(slot_f[ci:ci + gc], coarse_ref[ci:ci + gc],
                       thl_ref[ci:ci + gc], gc, sg)
        for ci in range(0, g, gc)
    ]
    sym = jnp.concatenate([p[0] for p in parts], axis=0)
    f = jnp.concatenate([p[1] for p in parts], axis=0)
    cum = jnp.concatenate([p[2] for p in parts], axis=0)
    # wrapping i32 mul == u32 low bits; shifts must be LOGICAL
    x = f * jax.lax.shift_right_logical(x, K_PROB) + slot - cum
    renorm = jax.lax.shift_right_logical(x, 16) == 0         # x < 2^16 unsigned
    # place the step's window words into lane layout (flat prefix)
    if wr < g:
        win_flat = jnp.concatenate(
            [win_rows, jnp.zeros((g - wr, sg), jnp.int32)], axis=0)
    else:
        win_flat = win_rows[:g]
    routed = _pull_expand(win_flat, renorm, g, sg, tri=tri)
    x = jnp.where(renorm, (x << 16) | routed, x)
    return x, sym


def _make_kernel(u, g, sg, wr, u8_out: bool = False,
                 with_tri: bool = True):
    def body(win_ref, st_in_ref, coarse_ref, thl_ref, tri,
             out_ref, st_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st_ref[:] = st_in_ref[:]

        x = st_ref[:]
        packed = jnp.zeros((g, sg), jnp.int32)
        for j in range(u):
            win_rows = win_ref[0, j * wr:(j + 1) * wr, :]
            x, sym = _decode_body(
                x, win_rows, coarse_ref, thl_ref, g, sg, wr, tri=tri)
            if u8_out:
                # direct u8 store per sub-step row: kills the XLA-side
                # unpack passes (r5; the DCT kernels store u8 the same
                # way — the risky case is sub-byte/strided stores)
                out_ref[0, j * g:(j + 1) * g, :] = sym.astype(jnp.uint8)
            else:
                packed = packed | (sym << (8 * j))
        if not u8_out:
            out_ref[0] = packed
        st_ref[:] = x

    if with_tri:
        def kernel(win_ref, st_in_ref, coarse_ref, thl_ref, tri_ref,
                   out_ref, st_ref):
            body(win_ref, st_in_ref, coarse_ref, thl_ref, tri_ref[:],
                 out_ref, st_ref)
    else:
        def kernel(win_ref, st_in_ref, coarse_ref, thl_ref,
                   out_ref, st_ref):
            body(win_ref, st_in_ref, coarse_ref, thl_ref, None,
                 out_ref, st_ref)

    return kernel


def _make_grid_kernel(u, g, sg, u8_out: bool = False):
    def kernel(le_ref, st_in_ref, coarse_ref, thl_ref, out_ref, st_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st_ref[:] = st_in_ref[:]

        x = st_ref[:]
        packed = jnp.zeros((g, sg), jnp.int32)
        for j in range(u):
            slot = x & MASK
            slot_f = slot.astype(jnp.float32)
            gc = math.gcd(g, 16)
            parts = [
                _resolve_chunk(slot_f[ci:ci + gc], coarse_ref[ci:ci + gc],
                               thl_ref[ci:ci + gc], gc, sg)
                for ci in range(0, g, gc)
            ]
            sym = jnp.concatenate([p[0] for p in parts], axis=0)
            f = jnp.concatenate([p[1] for p in parts], axis=0)
            cum = jnp.concatenate([p[2] for p in parts], axis=0)
            x = f * jax.lax.shift_right_logical(x, K_PROB) + slot - cum
            renorm = jax.lax.shift_right_logical(x, 16) == 0
            # ZERO routing: decode renorm flags mirror encode emit
            # flags lane-for-lane, so lane s's word at step t IS the
            # grid value le[t, s] (garbage where not flagged — never
            # read)
            word = le_ref[0, j * g:(j + 1) * g, :] & 0xFFFF
            x = jnp.where(renorm, (x << 16) | word, x)
            if u8_out:
                out_ref[0, j * g:(j + 1) * g, :] = sym.astype(jnp.uint8)
            else:
                packed = packed | (sym << (8 * j))
        if not u8_out:
            out_ref[0] = packed
        st_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("l", "unroll", "sg",
                                             "interpret", "lmajor"))
def pallas_decode_grouped_grid(le: jnp.ndarray, states: jnp.ndarray,
                               freqs_g: jnp.ndarray, cums_g: jnp.ndarray,
                               l: int, unroll: int = 4, sg: int = 1024,
                               interpret: bool = False,
                               lmajor: bool = False):
    """Grid-layout decode: consumes the ENCODER's raw (L, S) i32
    (emit << 16) | low16 grid (ops/pallas/rans_encode.py
    pallas_encode_grouped_raw output) directly — the interleaved-rANS
    lane alignment means decode-step-t renorm flags equal the encode
    emit flags LANE FOR LANE, so no word routing, windows, or counts
    exist on this path at all.  The compact wire stream is purely a
    serialization concern (finish_stream_pallas / host stitch).
    Returns syms (S, L) u8, bit-identical to jax_decode_grouped on the
    equivalent compact stream."""
    g = freqs_g.shape[0]
    s = states.shape[0]
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and 1 <= unroll <= 4
    u = unroll
    coarse, thl = _split_tables(cums_g)
    le3 = le.reshape(l // u, u * g, sg)
    st2 = jax.lax.bitcast_convert_type(states, jnp.int32).reshape(g, sg)
    in_specs = [
        pl.BlockSpec((1, u * g, sg), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, sg), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, 16), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, 16, 34), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if lmajor:
        out = pl.pallas_call(
            _make_grid_kernel(u, g, sg, u8_out=True),
            grid=(l // u,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, u * g, sg), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((l // u, u * g, sg), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32)],
            interpret=interpret,
        )(le3, st2, coarse, thl)
        return out.reshape(l, g * sg)
    out = pl.pallas_call(
        _make_grid_kernel(u, g, sg),
        grid=(l // u,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g, sg), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l // u, g, sg), jnp.int32),
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32)],
        interpret=interpret,
    )(le3, st2, coarse, thl)
    bytes_ = jnp.stack(
        [(out >> (8 * j)) & 255 for j in range(u)], axis=1)
    return bytes_.astype(jnp.uint8).reshape(l, g * sg).T


@functools.partial(jax.jit, static_argnames=("l", "cap", "unroll", "sg",
                                             "interpret", "lmajor"))
def pallas_decode_grouped(windows: jnp.ndarray, states: jnp.ndarray,
                          freqs_g: jnp.ndarray, cums_g: jnp.ndarray,
                          l: int, cap: int, unroll: int = 4,
                          sg: int = 1024, interpret: bool = False,
                          lmajor: bool = False):
    """windows (L, cap) i32 from build_windows; states (S,) u32;
    freqs_g/cums_g (G, 256).  Returns syms (S, L) u8, bit-identical to
    jax_decode_grouped (or (L, S) with lmajor=True — skips the final
    transpose for consumers that are L-major anyway).  Requires
    l % unroll == 0, unroll <= 4 (symbols pack into one i32 per lane
    per grid step), cap % sg == 0, S = G * sg with G = freqs_g.shape[0].
    The per-step routing rank runs as one bf16 MXU matmul (r5)."""
    g = freqs_g.shape[0]
    s = states.shape[0]
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and cap % sg == 0 and 1 <= unroll <= 4
    u, wr = unroll, cap // sg
    assert wr <= g, (wr, g, "cap must fit the (G, SG) lane grid")
    coarse, thl = _split_tables(cums_g)
    # the (sg, sg) bf16 tri constant is 2*sg^2 bytes of scoped VMEM;
    # past ~2048 lanes it cannot fit next to the working set (same
    # guard as the encode side) — the rank falls back to roll stages
    with_tri = sg <= 2048
    if with_tri:
        col = jnp.arange(sg, dtype=jnp.int32)
        tri = (col[:, None] <= col[None, :]).astype(jnp.bfloat16)
    win3 = windows.reshape(l // u, u * wr, sg)
    st2 = jax.lax.bitcast_convert_type(
        states, jnp.int32).reshape(g, sg)
    in_specs = [
        pl.BlockSpec((1, u * wr, sg), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, sg), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, 16), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, 16, 34), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (win3, st2, coarse, thl)
    if with_tri:
        in_specs.append(pl.BlockSpec((sg, sg), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands = operands + (tri,)
    if lmajor:
        # u8 stores straight into the (L, S) layout — no unpack passes
        out = pl.pallas_call(
            _make_kernel(u, g, sg, wr, u8_out=True, with_tri=with_tri),
            grid=(l // u,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, u * g, sg), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((l // u, u * g, sg), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32)],
            interpret=interpret,
        )(*operands)
        return out.reshape(l, g * sg)
    out = pl.pallas_call(
        _make_kernel(u, g, sg, wr, with_tri=with_tri),
        grid=(l // u,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g, sg), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l // u, g, sg), jnp.int32),
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32)],
        interpret=interpret,
    )(*operands)
    # unpack: byte j of grid step t is symbol t*u + j
    bytes_ = jnp.stack(
        [(out >> (8 * j)) & 255 for j in range(u)], axis=1)  # (L//u, u, G, SG)
    return bytes_.astype(jnp.uint8).reshape(l, g * sg).T
