"""Pallas kernels for the order-1 context rANS (``cgrans``).

Same whole-scan structure as rans_encode/rans_decode (see their
headers for the TPU design rules); the difference is the table index:
(group, class-of-previous-symbol) instead of group alone.

* Encode: classes are a function of the STATIC input, so XLA
  precomputes them and the kernel reads a parallel 2-bit-packed class
  plane; the (f, cum) fetch uses a joint (class x hi-nibble) 64-bucket
  one-hot against a (G, 64, 64) split table — the same exact-bf16
  byte-split matmul trick, 4x the table rows.
* Decode: the class comes from the PREVIOUSLY DECODED symbol per lane,
  carried across grid steps in a VMEM scratch; the resolve first
  class-selects the coarse boundaries (4-way arithmetic select), then
  runs the standard bucket matmul with the joint one-hot.

Wire format: identical contract to entropy/rans.py jax_encode_ctx /
jax_decode_ctx (tests pin grid+finish against the XLA stream).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcf_tpu.ops.pallas.rans_encode import K_PROB, RANS_L, _SHIFT_EMIT

N_CTX = 4
MASK = (1 << K_PROB) - 1

# |prev - 128| class thresholds per registered class count (mirror of
# entropy/rans.py CTX_BOUNDS; kept local so the kernel module has no
# circular import)
CTX_BOUNDS = {
    4: (1, 2, 5),
    15: (1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97),
}


def _cls_of(sym32):
    """|sym - 128| -> class 0..3 ({0}, {1}, {2-4}, {>=5}); int32 in/out."""
    d = jnp.abs(sym32 - 128)
    return jnp.where(d == 0, 0, jnp.where(d == 1, 1,
                                          jnp.where(d <= 4, 2, 3)))


def _cls_of_n(sym32, nc):
    if nc == 4:
        return _cls_of(sym32)
    d = jnp.abs(sym32 - 128)
    cls = jnp.zeros_like(d)
    for b in CTX_BOUNDS[nc]:
        cls = cls + jnp.where(d >= b, 1, 0)
    return cls


def _split_tables_ctx(freqs_gc, cums_gc):
    """(G, NC, 256) tables -> encode fetch table (G, NC*16, 64) bf16
    [f_hi | f_lo | c_hi | c_lo] per (class, hi-nibble) bucket."""
    g, nc = freqs_gc.shape[:2]
    f16 = freqs_gc.astype(jnp.int32).reshape(g, nc * 16, 16)
    c16 = cums_gc.astype(jnp.int32).reshape(g, nc * 16, 16)
    return jnp.concatenate(
        [(f16 >> 8), (f16 & 255), (c16 >> 8), (c16 & 255)],
        axis=2).astype(jnp.bfloat16)                     # (G, NC*16, 64)


def _fetch_fc_ctx(sym, cls, thl_c, gc, sg, nc=N_CTX):
    """(f, cum) f32 for symbols `sym` with classes `cls` (both
    (GC, SG) i32) from the (GC, NC*16, 64) joint split table."""
    hi = cls * 16 + (sym >> 4)
    lo_f = (sym & 15).astype(jnp.float32)
    i64 = jax.lax.broadcasted_iota(jnp.int32, (gc, nc * 16, sg), 1)
    oh = jnp.where(hi[:, None, :] == i64, 1.0, 0.0).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((0,), (0,)))
    fetched = jax.lax.dot_general(thl_c, oh, dn,
                                  preferred_element_type=jnp.float32)
    f_sel = jnp.zeros((gc, sg), jnp.float32)
    c_sel = jnp.zeros((gc, sg), jnp.float32)
    for k in range(16):
        m = jnp.where(lo_f == float(k), 1.0, 0.0)
        f_sel += m * (fetched[:, k, :] * 256.0 + fetched[:, 16 + k, :])
        c_sel += m * (fetched[:, 32 + k, :] * 256.0 + fetched[:, 48 + k, :])
    return f_sel, c_sel


def _make_kernel_ctx_raw(u, g, sg):
    """Two-phase raw encode with context: per-step fetch + state
    update; (low16, emit) grids stream out for the global stitch."""
    def kernel(sin_ref, cin_ref, thl_ref, le_ref, st_ref, x_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_ref[:] = jnp.full((g, sg), RANS_L, jnp.int32)

        x = x_ref[:]
        for j in range(u):
            sym = (sin_ref[0] >> (8 * j)) & 255
            cls = (cin_ref[0] >> (2 * j)) & 3
            gc = math.gcd(g, 8)
            parts = [
                _fetch_fc_ctx(sym[ci:ci + gc], cls[ci:ci + gc],
                              thl_ref[ci:ci + gc], gc, sg)
                for ci in range(0, g, gc)
            ]
            f_f = jnp.concatenate([p[0] for p in parts], axis=0)
            c_f = jnp.concatenate([p[1] for p in parts], axis=0)
            f = f_f.astype(jnp.int32)
            cum = c_f.astype(jnp.int32)
            emit = jax.lax.shift_right_logical(x, _SHIFT_EMIT) >= f
            low16 = x & 0xFFFF
            x = jnp.where(emit, jax.lax.shift_right_logical(x, 16), x)
            x_hi = jax.lax.shift_right_logical(x, 16).astype(jnp.float32)
            x_lo = (x & 0xFFFF).astype(jnp.float32)
            q = jnp.floor((x_hi * 65536.0 + x_lo) / f_f).astype(jnp.int32)
            r = x - q * f
            for _ in range(1):  # one +-1 round suffices (see _encode_body)
                over = r >= f
                q = jnp.where(over, q + 1, q)
                r = jnp.where(over, r - f, r)
                under = r < 0
                q = jnp.where(under, q - 1, q)
                r = jnp.where(under, r + f, r)
            x = (q << K_PROB) + r + cum
            row = (u - 1 - j)
            le_ref[0, row * g:(row + 1) * g, :] = \
                low16 | (jnp.where(emit, 1, 0) << 16)
        st_ref[:] = x
        x_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("unroll", "sg", "interpret"))
def pallas_encode_ctx_raw(syms: jnp.ndarray, freqs_gc: jnp.ndarray,
                          cums_gc: jnp.ndarray, unroll: int = 4,
                          sg: int = 1024, interpret: bool = False):
    """Context encode, two-phase raw: returns ((L, S) i32
    (emit << 16) | low16 grid in decode-step order, states (S,) u32).
    Stream bytes via rans_encode.finish_stream_pallas are identical to
    entropy/rans.jax_encode_ctx."""
    g = freqs_gc.shape[0]
    s, l = syms.shape
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and 1 <= unroll <= 4
    u = unroll
    thl = _split_tables_ctx(freqs_gc, cums_gc)
    s32 = syms.astype(jnp.int32)
    prev = jnp.concatenate(
        [jnp.full((s, 1), 128, jnp.int32), s32[:, :-1]], axis=1)
    cls = _cls_of(prev)
    # pack u symbol bytes / u 2-bit classes per i32, reversed columns
    rev_s = s32[:, ::-1].T.reshape(l // u, u, g, sg)
    rev_c = cls[:, ::-1].T.reshape(l // u, u, g, sg)
    sin = jnp.zeros((l // u, g, sg), jnp.int32)
    cin = jnp.zeros((l // u, g, sg), jnp.int32)
    for j in range(u):
        sin = sin | (rev_s[:, j] << (8 * j))
        cin = cin | (rev_c[:, j] << (2 * j))
    nblk = l // u
    le, st = pl.pallas_call(
        _make_kernel_ctx_raw(u, g, sg),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, g, sg), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, sg), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, N_CTX * 16, 64), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, u * g, sg), lambda t: (nblk - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sg), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, u * g, sg), jnp.int32),
            jax.ShapeDtypeStruct((g, sg), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32)],
        interpret=interpret,
    )(sin, cin, thl)
    states = jax.lax.bitcast_convert_type(st.reshape(s), jnp.uint32)
    return le.reshape(l, s), states


def _make_kernel_ctx_raw_u8(u, g, sg, nblk, nc=N_CTX):
    """u8-input ctx raw kernel (r5): symbols arrive as raw
    (1, u, g, sg) uint8 blocks and the CLASS is computed IN-KERNEL from
    the previous symbol (same block, or the last row of the preceding
    block passed as a second view of the input) — the XLA-side
    reversal, byte-packing, and the whole 2-bit class plane are gone
    (classes never touch HBM at all)."""
    def kernel(sin_ref, sprev_ref, thl_ref, le_ref, st_ref, x_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_ref[:] = jnp.full((g, sg), RANS_L, jnp.int32)

        x = x_ref[:]
        for rr in range(u - 1, -1, -1):
            sym = sin_ref[0, rr].astype(jnp.int32)
            if rr > 0:
                prev = sin_ref[0, rr - 1].astype(jnp.int32)
                cls = _cls_of_n(prev, nc)
            else:
                prev = sprev_ref[0, u - 1].astype(jnp.int32)
                # global col 0 (block t == nblk-1, rr == 0) has no
                # predecessor: class 0 by contract
                cls = jnp.where(t == nblk - 1, 0, _cls_of_n(prev, nc))
            gc = math.gcd(g, 8)
            parts = [
                _fetch_fc_ctx(sym[ci:ci + gc], cls[ci:ci + gc],
                              thl_ref[ci:ci + gc], gc, sg, nc=nc)
                for ci in range(0, g, gc)
            ]
            f_f = jnp.concatenate([p[0] for p in parts], axis=0)
            c_f = jnp.concatenate([p[1] for p in parts], axis=0)
            f = f_f.astype(jnp.int32)
            cum = c_f.astype(jnp.int32)
            emit = jax.lax.shift_right_logical(x, _SHIFT_EMIT) >= f
            low16 = x & 0xFFFF
            x = jnp.where(emit, jax.lax.shift_right_logical(x, 16), x)
            x_hi = jax.lax.shift_right_logical(x, 16).astype(jnp.float32)
            x_lo = (x & 0xFFFF).astype(jnp.float32)
            q = jnp.floor((x_hi * 65536.0 + x_lo) / f_f).astype(jnp.int32)
            r = x - q * f
            for _ in range(1):  # one +-1 round suffices (see _encode_body)
                over = r >= f
                q = jnp.where(over, q + 1, q)
                r = jnp.where(over, r - f, r)
                under = r < 0
                q = jnp.where(under, q - 1, q)
                r = jnp.where(under, r + f, r)
            x = (q << K_PROB) + r + cum
            le_ref[0, rr * g:(rr + 1) * g, :] = \
                low16 | (jnp.where(emit, 1, 0) << 16)
        st_ref[:] = x
        x_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("unroll", "sg", "interpret",
                                             "lmajor"))
def pallas_encode_ctx_raw_u8(syms: jnp.ndarray, freqs_gc: jnp.ndarray,
                             cums_gc: jnp.ndarray, unroll: int = 4,
                             sg: int = 1024, interpret: bool = False,
                             lmajor: bool = False):
    """pallas_encode_ctx_raw with the u8 fast input path: identical
    (le, states) output; the only XLA-side data pass is one
    (S, L) -> (L, S) transpose (none with lmajor=True)."""
    g = freqs_gc.shape[0]
    if lmajor:
        l, s = syms.shape
    else:
        s, l = syms.shape
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and 1 <= unroll <= 4
    u = unroll
    nc = freqs_gc.shape[1]
    thl = _split_tables_ctx(freqs_gc, cums_gc)
    nblk = l // u
    sin = (syms if lmajor else syms.T).reshape(nblk, u, g, sg)
    le, st = pl.pallas_call(
        _make_kernel_ctx_raw_u8(u, g, sg, nblk, nc=nc),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, u, g, sg),
                         lambda t: (nblk - 1 - t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # the PRECEDING block (clamped at 0; masked for col 0): its
            # last row is the previous symbol of this block's first col
            pl.BlockSpec((1, u, g, sg),
                         lambda t: (jnp.maximum(nblk - 2 - t, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nc * 16, 64), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, u * g, sg), lambda t: (nblk - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sg), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, u * g, sg), jnp.int32),
            jax.ShapeDtypeStruct((g, sg), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32)],
        interpret=interpret,
    )(sin, sin, thl)
    states = jax.lax.bitcast_convert_type(st.reshape(s), jnp.uint32)
    return le.reshape(l, s), states


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _split_resolve_tables_ctx(cums_gc):
    """(G, NC, 256) u32 cumulative boundaries -> (coarse (G, NC, 16)
    f32, thl (G, NC*16, 34) bf16) for the class-conditioned resolve
    (17 boundaries per (class, bucket), hi/lo byte split)."""
    g, nc = cums_gc.shape[:2]
    cx = jnp.concatenate(
        [jnp.asarray(cums_gc).astype(jnp.int32),
         jnp.full((g, nc, 1), 1 << K_PROB, jnp.int32)], axis=2)
    idx = (jnp.arange(16)[:, None] * 16 + jnp.arange(17)[None, :]).reshape(-1)
    t17 = cx[:, :, idx].reshape(g, nc * 16, 17)
    thl = jnp.concatenate([(t17 >> 8).astype(jnp.bfloat16),
                           (t17 & 255).astype(jnp.bfloat16)], axis=2)
    coarse = cx[:, :, :256:16].astype(jnp.float32)       # (G, NC, 16)
    return coarse, thl


def _resolve_chunk_ctx(slot_f, cls, coarse_c, thl_c, gc, sg, nc=N_CTX):
    """Class-conditioned symbol resolve: slot_f (GC, SG) f32, cls
    (GC, SG) i32 -> (sym, f, cum) i32 each (GC, SG).
    coarse_c (GC, NC, 16) f32, thl_c (GC, NC*16, 34) bf16.

    The class-select of the 16 coarse boundaries runs as ONE bf16
    matmul pair (hi/lo byte split — boundaries <= 2^15 so each byte is
    exact; r5, replaces a 15 x NC arithmetic-select chain that would
    not scale to the 15-class tables)."""
    clsf = cls
    i_nc = jax.lax.broadcasted_iota(jnp.int32, (gc, nc, sg), 1)
    ohc = jnp.where(clsf[:, None, :] == i_nc,
                    1.0, 0.0).astype(jnp.bfloat16)       # (GC, NC, SG)
    co_i = coarse_c.astype(jnp.int32)
    co_hi = (co_i >> 8).astype(jnp.bfloat16)             # (GC, NC, 16)
    co_lo = (co_i & 255).astype(jnp.bfloat16)
    dnn = (((1,), (1,)), ((0,), (0,)))
    sel_hi = jax.lax.dot_general(                        # (GC, 16, SG)
        co_hi.transpose(0, 2, 1), ohc, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    sel_lo = jax.lax.dot_general(
        co_lo.transpose(0, 2, 1), ohc, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    sel = sel_hi * 256.0 + sel_lo                        # (GC, 16, SG)
    bucket = jnp.sum(
        jnp.where(slot_f[:, None, :] >= sel[:, 1:, :], 1, 0), axis=1)
    joint = cls * 16 + bucket
    i64 = jax.lax.broadcasted_iota(jnp.int32, (gc, nc * 16, sg), 1)
    oh1 = jnp.where(joint[:, None, :] == i64,
                    1.0, 0.0).astype(jnp.bfloat16)       # (GC, 64, SG)
    dn = (((1,), (1,)), ((0,), (0,)))
    fetched = jax.lax.dot_general(thl_c, oh1, dn,
                                  preferred_element_type=jnp.float32)
    fine_c = fetched[:, :17, :] * 256.0 + fetched[:, 17:, :]
    ge2 = jnp.where(slot_f[:, None, :] >= fine_c[:, :16, :], 1.0, 0.0)
    oh2 = ge2 - jnp.concatenate(
        [ge2[:, 1:, :], jnp.zeros((gc, 1, sg), jnp.float32)], axis=1)
    lo = jnp.sum(ge2, axis=1) - 1.0
    cum = jnp.sum(oh2 * fine_c[:, :16, :], axis=1)
    nxt = jnp.sum(oh2 * fine_c[:, 1:, :], axis=1)
    f = (nxt - cum).astype(jnp.int32)
    cum = cum.astype(jnp.int32)
    sym = bucket * 16 + lo.astype(jnp.int32)
    return sym, f, cum


def _make_ctx_grid_kernel(u, g, sg, nc=N_CTX):
    def kernel(le_ref, st_in_ref, coarse_ref, thl_ref, out_ref, st_ref,
               prev_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st_ref[:] = st_in_ref[:]
            prev_ref[:] = jnp.full((g, sg), 128, jnp.int32)

        x = st_ref[:]
        prev = prev_ref[:]
        packed = jnp.zeros((g, sg), jnp.int32)
        for j in range(u):
            cls_full = _cls_of_n(prev, nc)
            slot = x & MASK
            slot_f = slot.astype(jnp.float32)
            gc = math.gcd(g, 8)
            parts = [
                _resolve_chunk_ctx(slot_f[ci:ci + gc], cls_full[ci:ci + gc],
                                   coarse_ref[ci:ci + gc],
                                   thl_ref[ci:ci + gc], gc, sg, nc=nc)
                for ci in range(0, g, gc)
            ]
            sym = jnp.concatenate([p[0] for p in parts], axis=0)
            f = jnp.concatenate([p[1] for p in parts], axis=0)
            cum = jnp.concatenate([p[2] for p in parts], axis=0)
            x = f * jax.lax.shift_right_logical(x, K_PROB) + slot - cum
            renorm = jax.lax.shift_right_logical(x, 16) == 0
            word = le_ref[0, j * g:(j + 1) * g, :] & 0xFFFF
            x = jnp.where(renorm, (x << 16) | word, x)
            packed = packed | (sym << (8 * j))
            prev = sym
        out_ref[0] = packed
        st_ref[:] = x
        prev_ref[:] = prev

    return kernel


@functools.partial(jax.jit, static_argnames=("l", "unroll", "sg",
                                             "interpret"))
def pallas_decode_ctx_grid(le: jnp.ndarray, states: jnp.ndarray,
                           freqs_gc: jnp.ndarray, cums_gc: jnp.ndarray,
                           l: int, unroll: int = 4, sg: int = 1024,
                           interpret: bool = False):
    """Grid-layout context decode (mirror of
    rans_decode.pallas_decode_grouped_grid): consumes the encoder's
    (L, S) raw grid, carries the previous symbol per lane across steps
    for the class.  Bit-identical to entropy/rans.jax_decode_ctx."""
    g = freqs_gc.shape[0]
    s = states.shape[0]
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and 1 <= unroll <= 4
    u = unroll
    nc = freqs_gc.shape[1]
    coarse, thl = _split_resolve_tables_ctx(cums_gc)
    le3 = le.reshape(l // u, u * g, sg)
    st2 = jax.lax.bitcast_convert_type(states, jnp.int32).reshape(g, sg)
    out = pl.pallas_call(
        _make_ctx_grid_kernel(u, g, sg, nc=nc),
        grid=(l // u,),
        in_specs=[
            pl.BlockSpec((1, u * g, sg), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sg), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nc, 16), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nc * 16, 34), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, sg), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l // u, g, sg), jnp.int32),
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32),
                        pltpu.VMEM((g, sg), jnp.int32)],
        interpret=interpret,
    )(le3, st2, coarse, thl)
    bytes_ = jnp.stack(
        [(out >> (8 * j)) & 255 for j in range(u)], axis=1)
    return bytes_.astype(jnp.uint8).reshape(l, g * sg).T


def _make_ctx_kernel(u, g, sg, wr, nc=N_CTX):
    """Windows variant: the wire's packed word windows route to
    renorming lanes in-kernel (rans_decode._pull_expand), with the
    class carried from the previously decoded symbol."""
    from vcf_tpu.ops.pallas.rans_decode import _pull_expand

    def kernel(win_ref, st_in_ref, coarse_ref, thl_ref, out_ref, st_ref,
               prev_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st_ref[:] = st_in_ref[:]
            prev_ref[:] = jnp.full((g, sg), 128, jnp.int32)

        x = st_ref[:]
        prev = prev_ref[:]
        packed = jnp.zeros((g, sg), jnp.int32)
        for j in range(u):
            cls_full = _cls_of_n(prev, nc)
            slot = x & MASK
            slot_f = slot.astype(jnp.float32)
            gc = math.gcd(g, 8)
            parts = [
                _resolve_chunk_ctx(slot_f[ci:ci + gc], cls_full[ci:ci + gc],
                                   coarse_ref[ci:ci + gc],
                                   thl_ref[ci:ci + gc], gc, sg, nc=nc)
                for ci in range(0, g, gc)
            ]
            sym = jnp.concatenate([p[0] for p in parts], axis=0)
            f = jnp.concatenate([p[1] for p in parts], axis=0)
            cum = jnp.concatenate([p[2] for p in parts], axis=0)
            x = f * jax.lax.shift_right_logical(x, K_PROB) + slot - cum
            renorm = jax.lax.shift_right_logical(x, 16) == 0
            win_rows = win_ref[0, j * wr:(j + 1) * wr, :]
            if wr < g:
                win_flat = jnp.concatenate(
                    [win_rows, jnp.zeros((g - wr, sg), jnp.int32)], axis=0)
            else:
                win_flat = win_rows[:g]
            routed = _pull_expand(win_flat, renorm, g, sg)
            x = jnp.where(renorm, (x << 16) | routed, x)
            packed = packed | (sym << (8 * j))
            prev = sym
        out_ref[0] = packed
        st_ref[:] = x
        prev_ref[:] = prev

    return kernel


@functools.partial(jax.jit, static_argnames=("l", "cap", "unroll", "sg",
                                             "interpret"))
def pallas_decode_ctx(windows: jnp.ndarray, states: jnp.ndarray,
                      freqs_gc: jnp.ndarray, cums_gc: jnp.ndarray,
                      l: int, cap: int, unroll: int = 4, sg: int = 1024,
                      interpret: bool = False):
    """Wire-path context decode: windows (L, cap) i32 from
    rans_decode.build_windows over the compact stream + per-step
    counts.  Bit-identical to entropy/rans.jax_decode_ctx."""
    g = freqs_gc.shape[0]
    s = states.shape[0]
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and cap % sg == 0 and 1 <= unroll <= 4
    u, wr = unroll, cap // sg
    assert wr <= g, (wr, g)
    nc = freqs_gc.shape[1]
    coarse, thl = _split_resolve_tables_ctx(cums_gc)
    win3 = windows.reshape(l // u, u * wr, sg)
    st2 = jax.lax.bitcast_convert_type(states, jnp.int32).reshape(g, sg)
    out = pl.pallas_call(
        _make_ctx_kernel(u, g, sg, wr, nc=nc),
        grid=(l // u,),
        in_specs=[
            pl.BlockSpec((1, u * wr, sg), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sg), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nc, 16), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nc * 16, 34), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, sg), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l // u, g, sg), jnp.int32),
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32),
                        pltpu.VMEM((g, sg), jnp.int32)],
        interpret=interpret,
    )(win3, st2, coarse, thl)
    bytes_ = jnp.stack(
        [(out >> (8 * j)) & 255 for j in range(u)], axis=1)
    return bytes_.astype(jnp.uint8).reshape(l, g * sg).T
