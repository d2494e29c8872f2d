"""Pallas grouped-rANS encode: the whole encode scan in ONE kernel.

Mirror of ops/pallas/rans_decode.py (see its header for the TPU design
rules).  The XLA encode (entropy/rans.py jax_encode_grouped) runs a
765-step lax.scan whose per-step launches dominate at bench shapes
(~24 ms / 50M symbols at the best unroll); here the scan, the table
fetch, the state update, and the per-step word compaction all run
inside one `pl.pallas_call` with states in VMEM scratch.

Per encode step (symbols consumed in REVERSE column order, like the
XLA path):

* Fetch (f, cum) by symbol: hi-nibble one-hot -> ONE bf16
  (G, 16, 64) @ (G, 16, SG) MXU matmul pulls the symbol's bucket row
  [f_hi | f_lo | c_hi | c_lo] (all bytes <= 255: exact in bf16, f32
  accumulation); low-nibble select folds it to per-lane f/cum.
* Renormalize: emit lanes with (x >>> 17) >= f push their low 16 bits
  into the step's word row, compacted to a flat prefix by an LSB-first
  radix-4 monotone butterfly (the in-kernel port of entropy/rans.py
  _compact4, flat (G, SG) shifts).
* Divide: Mosaic has no u32 divide, so q = x // f is computed as a f32
  reciprocal estimate + exact int32 remainder fix: post-renorm
  x < f * 2^17, so |float(x)/f - x/f| <= 2^-7 and one +-1 correction
  round makes (q, r) exact (a second round is kept as margin).
* Output: the step's padded word row lands at DECODE-step index
  (rows are written in reverse grid order), so the rows concatenated
  by their counts reproduce jax_encode_grouped's stream bit-exactly
  (assembled outside by `assemble_stream`).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcf_tpu.ops.pallas.rans_decode import (
    _flat_idx,
    _flat_rank,
)

K_PROB = 15
RANS_L = 1 << 16
_SHIFT_EMIT = 32 - K_PROB


def _flat_shift_left(x, off, sg):
    """x (G, SG) viewed as a flat row-major vector, shifted LEFT by
    `off` (right-fill irrelevant: monotone compaction never selects
    it)."""
    g = x.shape[0]
    rr, cc = off // sg, off % sg
    if cc:
        y = pltpu.roll(x, sg - cc, 1)            # out[i] = in[(i+cc) % sg]
        carry = pltpu.roll(y, g - 1, 0)          # out row r = in row r+1
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = jnp.where(col >= sg - cc, carry, y)
    else:
        y = x
    if rr:
        y = pltpu.roll(y, g - rr, 0)
    return y


def _flat_rank_mm(flags, tri, g, sg):
    """Exclusive flat rank via ONE MXU matmul for the within-row prefix
    (bf16 0/1 operands, f32 accumulation — exact for counts < 2^24)
    plus the log2(g) sublane stages.  Replaces the log2(sg) lane-roll
    stages of _flat_rank (r5: the rank is ~40% of the in-kernel
    compaction's passes).  `tri` is the (sg, sg) inclusive lower-
    triangular 0/1 matrix (tri[j, i] = j <= i)."""
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


def _push_compact_packed_wide(vals, flags, g, sg, tri=None):
    """Packed radix-2 monotone compaction for 32768 < s <= 65536: the
    15-bit packed shift field holds delta & 0x7FFF and a separate
    carry array rides bit 15 (LSB-first stages 0..14 shift two arrays,
    then ONE unpacked 32768-stage moves the carries — a pure sublane
    roll).  ~16 stages x 2 arrays vs radix-4's 24 stages x 3."""
    s = g * sg
    assert 32768 < s <= 65536, s
    rank = (_flat_rank_mm(flags, tri, g, sg) if tri is not None
            else _flat_rank(flags, g, sg))
    idx = _flat_idx(g, sg)
    delta = jnp.where(flags, idx - rank, 0)
    inact = jnp.int32(-2147483648)
    p = ((delta & 0x7FFF) << 16) | (vals & 0xFFFF)
    p = jnp.where(flags, p, p | inact)
    for dig in range(15):
        off = 1 << dig
        bitpos = 16 + dig
        move_out = (p >= 0) & (
            (jax.lax.shift_right_logical(p, bitpos) & 1) == 1)
        p_in = _flat_shift_left(p, off, sg)
        move_in = (p_in >= 0) & (
            (jax.lax.shift_right_logical(p_in, bitpos) & 1) == 1) & (
            idx < s - off)
        p = jnp.where(move_in, p_in - (off << 16),
                      jnp.where(move_out, p | inact, p))
    # final stage: remaining shift is 0 or 32768 (delta bit 15).  The
    # carry bit needn't ride the stages: after the 15 LSB stages the
    # k-th active lane (stable rank k) sits at idx == k + 32768*hi, so
    # ONE extra rank pass recovers hi in place (saves 15 hi-shifts).
    act = p >= 0
    rank2 = (_flat_rank_mm(act, tri, g, sg) if tri is not None
             else _flat_rank(act, g, sg))
    hi_out = act & (idx - rank2 >= 32768)
    off = 32768
    mo = jnp.where(hi_out, 1, 0)
    p_in = _flat_shift_left(p, off, sg)          # off % sg == 0: sublane roll
    mi = _flat_shift_left(mo, off, sg)
    move_in = (mi == 1) & (idx < s - off)
    p = jnp.where(move_in, p_in, jnp.where(hi_out, p | inact, p))
    return p


def _push_compact(vals, flags, g, sg, radix: int = 4):
    """Pack flagged values to the flat front (stable): out[rank_i] =
    vals[i].  LSB-first radix-4 (or radix-2) monotone left-compaction —
    the flat (G, SG) port of entropy/rans.py _compact4.  Lanes past the
    flag count hold unspecified residuals.

    radix=2 does ~1/3 fewer vector passes per element (1 shifted merge
    per stage x log2 stages vs 3 x log4): the per-chunk compaction is
    the wire stitch's dominant cost (r4 probe 27)."""
    s = g * sg
    rank = _flat_rank(flags, g, sg)
    idx = _flat_idx(g, sg)
    shift = jnp.where(flags, idx - rank, 0)
    val = vals
    active = flags
    n_stages = max(int(np.ceil(np.log2(max(s, 2)))), 1)
    bits = 1 if radix == 2 else 2
    mask = (1 << bits) - 1
    for dig in range(-(-n_stages // bits)):
        step = 1 << (bits * dig)
        d = (shift >> (bits * dig)) & mask
        val_new = val
        shift_new = shift
        act_new = active & (d == 0)
        for j in range(1, radix):
            off = j * step
            if off >= s:
                continue
            move = active & (d == j)
            val_in = _flat_shift_left(val, off, sg)
            move_in = _flat_shift_left(
                jnp.where(move, 1, 0), off, sg)
            # zero-fill the wrapped tail (roll wraps; compaction needs
            # false flags streaming in from past the end)
            move_in = jnp.where(idx < s - off, move_in, 0) != 0
            shift_in = _flat_shift_left(shift, off, sg)
            val_new = jnp.where(move_in, val_in, val_new)
            shift_new = jnp.where(move_in, shift_in - off, shift_new)
            act_new = act_new | move_in
        val, shift, active = val_new, shift_new, act_new
    return val


def _push_compact_packed(vals, flags, g, sg):
    """radix-2 `_push_compact` with (shift << 16) | val packed into ONE
    i32 and the sign bit as the inactive flag: each butterfly stage
    shifts/merges a single array instead of three (val, move, shift),
    cutting the stitch kernel's VPU passes ~2x (r4 probe 92).  Requires
    s = g * sg <= 32768 so the residual shift fits bits 16..30.
    Output low 16 bits are identical to `_push_compact`'s prefix."""
    s = g * sg
    assert s <= 32768, "packed compaction: shift field is 15 bits"
    rank = _flat_rank(flags, g, sg)
    idx = _flat_idx(g, sg)
    shift = jnp.where(flags, idx - rank, 0)
    inact = jnp.int32(-2147483648)
    p = (shift << 16) | (vals & 0xFFFF)
    p = jnp.where(flags, p, p | inact)
    n_stages = max(int(np.ceil(np.log2(max(s, 2)))), 1)
    for dig in range(n_stages):
        off = 1 << dig
        if off >= s:
            break
        bitpos = 16 + dig
        move_out = (p >= 0) & (
            (jax.lax.shift_right_logical(p, bitpos) & 1) == 1)
        p_in = _flat_shift_left(p, off, sg)
        # zero-fill the wrapped tail (roll wraps; compaction needs
        # inactive lanes streaming in from past the end)
        move_in = (p_in >= 0) & (
            (jax.lax.shift_right_logical(p_in, bitpos) & 1) == 1) & (
            idx < s - off)
        # senders that receive nothing keep their val bits as residuals
        # but deactivate, exactly like _push_compact's act_new
        p = jnp.where(move_in, p_in - (off << 16),
                      jnp.where(move_out, p | inact, p))
    return p


def _row_csum(fi, sg):
    """Within-row INCLUSIVE prefix sum of fi (G, SG) i32 (lane-dim
    masked shift-adds only — no cross-row carry)."""
    col = jax.lax.broadcasted_iota(jnp.int32, fi.shape, 1)
    csum = fi
    k = 1
    while k < sg:
        sh = pltpu.roll(csum, k, 1)
        csum = csum + jnp.where(col >= k, sh, 0)
        k <<= 1
    return csum


def _row_compact_packed(vals, flags, sg):
    """Per-ROW packed monotone compaction: each row of `sg` lanes
    compacts independently (log2(sg) single-roll stages, no cross-row
    carries).  Returns (packed rows, inclusive flag csum) — row k's
    word prefix is packed[k, :csum[k, -1]] & 0xFFFF."""
    col = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    fi = jnp.where(flags, 1, 0)
    csum = _row_csum(fi, sg)
    rank = csum - fi                              # exclusive, row-local
    shift = jnp.where(flags, col - rank, 0)
    inact = jnp.int32(-2147483648)
    p = (shift << 16) | (vals & 0xFFFF)
    p = jnp.where(flags, p, p | inact)
    for dig in range(max(int(np.ceil(np.log2(max(sg, 2)))), 1)):
        off = 1 << dig
        if off >= sg:
            break
        bitpos = 16 + dig
        move_out = (p >= 0) & (
            (jax.lax.shift_right_logical(p, bitpos) & 1) == 1)
        p_in = pltpu.roll(p, sg - off, 1)         # row-local left shift
        move_in = (p_in >= 0) & (
            (jax.lax.shift_right_logical(p_in, bitpos) & 1) == 1) & (
            col < sg - off)
        p = jnp.where(move_in, p_in - (off << 16),
                      jnp.where(move_out, p | inact, p))
    return p, csum


def _make_place_kernel(g2, sg2):
    """Row-compact + dynamic placement stitch kernel: compact each row
    locally (log2(sg2) stages vs log2(g2*sg2) for the flat butterfly),
    then write row k's word prefix at its running chunk offset with ONE
    data-dependent lane roll + a dynamic-start 2-row RMW store (probes
    94/95: Mosaic supports traced-scalar pltpu.roll shifts and traced
    pl.ds starts on the sublane dim)."""
    log_sg = int(np.log2(sg2))

    def kernel(le_ref, out_ref, cnt_ref, scr_ref):
        le = le_ref[0]
        vals = le & 0xFFFF
        flags = (le >> 16) != 0
        p, csum = _row_compact_packed(vals, flags, sg2)
        pv = p & 0xFFFF
        # scratch is (g2 + 2, 1, sg2): the DYNAMIC index rides the
        # leading dim (tile-aligned, so Mosaic can prove the access;
        # a 2D (g2, sg2) scratch fails the "multiple of 8" sublane
        # check for dynamic starts)
        scr_ref[...] = jnp.zeros((g2 + 2, 1, sg2), jnp.int32)
        col2 = jax.lax.broadcasted_iota(jnp.int32, (2, sg2), 1)
        idx2 = col2 + sg2 * jax.lax.broadcasted_iota(
            jnp.int32, (2, sg2), 0)
        zrow = jnp.zeros((1, sg2), jnp.int32)
        off = jnp.int32(0)
        for k in range(g2):
            cnt = csum[k, sg2 - 1]
            lead = jax.lax.shift_right_logical(off, log_sg)
            cc = off & (sg2 - 1)
            pad2 = jnp.concatenate([pv[k:k + 1, :], zrow], 0)
            y = pltpu.roll(pad2, cc, 1)           # right shift by cc
            carry = pltpu.roll(y, 1, 0)
            v2 = jnp.where(col2 < cc, carry, y)
            valid = (idx2 >= cc) & (idx2 < cc + cnt)
            cur = scr_ref[pl.ds(lead, 2), 0, :]
            scr_ref[pl.ds(lead, 2), 0, :] = jnp.where(valid, v2, cur)
            off = off + cnt
        out_ref[0] = scr_ref[0:g2, 0, :]
        cnt_ref[0, 0:1, :] = jnp.full((1, 128), off, jnp.int32)

    return kernel


def _fetch_one(oh, lo_f, tab_c, gc, sg):
    """Fetch one hi/lo-byte-split value per lane: tab_c (GC, 16, 32)
    bf16 = [v_hi | v_lo] per hi-nibble bucket, oh (GC, 16, SG) bf16
    bucket one-hot, lo_f (GC, SG) f32 low nibble."""
    dn = (((1,), (1,)), ((0,), (0,)))
    fetched = jax.lax.dot_general(tab_c, oh, dn,
                                  preferred_element_type=jnp.float32)
    sel = jnp.zeros((gc, sg), jnp.float32)
    for k in range(16):
        m = jnp.where(lo_f == float(k), 1.0, 0.0)
        sel += m * (fetched[:, k, :] * 256.0 + fetched[:, 16 + k, :])
    return sel


def _fetch_fc(sym, thl_c, gc, sg):
    """(f, cum) f32 (exact, <= 2^15) for symbols `sym` (GC, SG) i32 in
    [0, 256) from the split table thl_c (GC, 16, 64) bf16 =
    [f_hi | f_lo | c_hi | c_lo] per hi-nibble bucket.  Two sequential
    (GC, 16, 32) passes keep the live VMEM stack half the size of one
    fused 64-row fetch (the kernel sits near the 16 MB scoped limit)."""
    hi = sym >> 4
    lo_f = (sym & 15).astype(jnp.float32)
    i16 = jax.lax.broadcasted_iota(jnp.int32, (gc, 16, sg), 1)
    oh = jnp.where(hi[:, None, :] == i16, 1.0, 0.0).astype(jnp.bfloat16)
    f_sel = _fetch_one(oh, lo_f, thl_c[:, :, :32], gc, sg)
    c_sel = _fetch_one(oh, lo_f, thl_c[:, :, 32:], gc, sg)
    return f_sel, c_sel


def _fetch_fc_fused(sym, thl_c, gc, sg):
    """Single-pass variant of `_fetch_fc` for the raw kernel: ONE
    (GC, 16, 64) bucket matmul fetches [f_hi|f_lo|c_hi|c_lo] together
    and ONE low-nibble select loop resolves both f and cum — the
    16-way select loop is ~4 ms of the 9.6 ms raw encode kernel at
    bench shapes (r4 probe 67), so halving its passes matters.  The
    compacting kernel keeps the two-pass `_fetch_fc` (its VMEM stack
    is already near the 16 MB scoped limit)."""
    hi = sym >> 4
    lo_f = (sym & 15).astype(jnp.float32)
    i16 = jax.lax.broadcasted_iota(jnp.int32, (gc, 16, sg), 1)
    oh = jnp.where(hi[:, None, :] == i16, 1.0, 0.0).astype(jnp.bfloat16)
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


def merged_fetch_table(freqs_g, cums_g):
    """(G, 32, 32) bf16 two-hot fetch table (r5): contraction rows are
    TWO copies of the 16 hi-nibble buckets — the first carrying
    hi-byte values pre-scaled by 256 (f_hi*256 <= 32512 = f_hi x 2^8,
    exact in bf16), the second the low bytes — so the matmul's f32
    accumulation performs the byte merge and the per-lane select loop
    shrinks from 16 x (2 muls + merge) to 16 x 1 madd per field."""
    g = freqs_g.shape[0]
    f16 = freqs_g.astype(jnp.int32).reshape(g, 16, 16)
    c16 = cums_g.astype(jnp.int32).reshape(g, 16, 16)
    hi = jnp.concatenate([(f16 >> 8) * 256, (c16 >> 8) * 256], axis=2)
    lo = jnp.concatenate([f16 & 255, c16 & 255], axis=2)
    return jnp.concatenate([hi, lo], axis=1).astype(jnp.bfloat16)


def _fetch_fc_merged(sym, tmh_c, gc, sg):
    """(f, cum) f32 from the merged_fetch_table: one (GC, 32, 32) @
    (GC, 32, SG) matmul (two-hot over the duplicated buckets) and a
    16-madd select per field — no byte merges after the matmul."""
    hi = sym >> 4
    lo_f = (sym & 15).astype(jnp.float32)
    i32b = jax.lax.broadcasted_iota(jnp.int32, (gc, 32, sg), 1)
    oh2 = jnp.where(hi[:, None, :] == (i32b & 15),
                    1.0, 0.0).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((0,), (0,)))
    fetched = jax.lax.dot_general(tmh_c, oh2, dn,
                                  preferred_element_type=jnp.float32)
    f_sel = jnp.zeros((gc, sg), jnp.float32)
    c_sel = jnp.zeros((gc, sg), jnp.float32)
    for k in range(16):
        m = jnp.where(lo_f == float(k), 1.0, 0.0)
        f_sel += m * fetched[:, k, :]
        c_sel += m * fetched[:, 16 + k, :]
    return f_sel, c_sel


def _encode_body(x, sym, thl_ref, g, sg, gc=8, tri=None):
    """One encode step on states x (G, SG) i32 (u32 bit pattern) with
    symbols sym (G, SG) i32.  Returns (new_x, word_row i32 (G, SG)
    prefix-compacted, count scalar i32).  `tri`: optional (sg, sg)
    bf16 lower-triangular constant enabling the matmul rank and the
    carry-hi packed compaction (r5)."""
    gc = math.gcd(g, gc)  # always a divisor of g: no short final slice
    parts = [
        _fetch_fc_merged(sym[ci:ci + gc], thl_ref[ci:ci + gc], gc, sg)
        for ci in range(0, g, gc)
    ]
    f_f = jnp.concatenate([p[0] for p in parts], axis=0)   # f32, exact
    c_f = jnp.concatenate([p[1] for p in parts], axis=0)
    f = f_f.astype(jnp.int32)
    cum = c_f.astype(jnp.int32)
    # renorm: emit low 16 bits when (x >>> _SHIFT_EMIT) >= f
    emit = jax.lax.shift_right_logical(x, _SHIFT_EMIT) >= f
    low16 = x & 0xFFFF
    x = jnp.where(emit, jax.lax.shift_right_logical(x, 16), x)
    # exact unsigned division x // f via f32 estimate + int32 fix:
    # post-renorm x < f * 2^17 so the f32 estimate is within ~2^-7
    x_hi = jax.lax.shift_right_logical(x, 16).astype(jnp.float32)
    x_lo = (x & 0xFFFF).astype(jnp.float32)
    q = jnp.floor((x_hi * 65536.0 + x_lo) / f_f).astype(jnp.int32)
    r = x - q * f                      # exact: wrapping i32, |r| small
    for _ in range(1):  # one round suffices: post-renorm x < f*2^17 so the
        # f32 estimate is within 2^-7 -> |q_est - q| <= 1 (r5: the second
        # margin round measured ~0.5 ms across the bench kernels)
        over = r >= f
        q = jnp.where(over, q + 1, q)
        r = jnp.where(over, r - f, r)
        under = r < 0
        q = jnp.where(under, q - 1, q)
        r = jnp.where(under, r + f, r)
    x = (q << K_PROB) + r + cum
    s = g * sg
    if 32768 < s <= 65536 and tri is not None:
        words = _push_compact_packed_wide(low16, emit, g, sg, tri=tri)
    else:
        words = _push_compact(low16, emit, g, sg)
    count = jnp.sum(jnp.where(emit, 1, 0))
    return x, words, count


def _make_kernel(u, g, sg):
    def kernel(sin_ref, thl_ref, out_ref, cnt_ref, st_ref, x_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_ref[:] = jnp.full((g, sg), RANS_L, jnp.int32)

        x = x_ref[:]
        for j in range(u):
            sym = (sin_ref[0] >> (8 * j)) & 255
            x, words, count = _encode_body(x, sym, thl_ref, g, sg)
            # encode sub-step j lands at decode row u-1-j of the
            # (reversed) output block; words are 16-bit values — store
            # i16 to halve the out-block VMEM and HBM traffic
            out_ref[0, (u - 1 - j) * g:(u - j) * g, :] = \
                words.astype(jnp.int16)
            cnt_ref[0, u - 1 - j:u - j, :] = jnp.full((1, 128), count,
                                                     jnp.int32)
        x_ref[:] = x
        st_ref[:] = x

    return kernel


def _make_kernel_u8(u, g, sg, with_tri=True):
    """u8-input compact-variant kernel (r5): symbols arrive as raw
    (1, u, g, sg) uint8 blocks — the XLA-side column reversal and the
    byte-packing passes of `_make_kernel` (3 shift-OR passes over the
    whole grid, ~4.5 ms at bench shapes) move into the BlockSpec index
    map (grid runs the blocks newest-first) and a per-sub-step u8 load.
    tri_ref: (sg, sg) bf16 lower-triangular constant for the matmul
    rank + carry-hi compaction (omitted when sg is large enough that
    the constant would blow the 16 MB scoped-VMEM stack)."""
    def body(sin_ref, thl_ref, tri, out_ref, cnt_ref, st_ref, x_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_ref[:] = jnp.full((g, sg), RANS_L, jnp.int32)

        x = x_ref[:]
        for rr in range(u - 1, -1, -1):   # newest column of the block first
            sym = sin_ref[0, rr].astype(jnp.int32)
            x, words, count = _encode_body(x, sym, thl_ref, g, sg, tri=tri)
            out_ref[0, rr * g:(rr + 1) * g, :] = words.astype(jnp.int16)
            cnt_ref[0, rr:rr + 1, :] = jnp.full((1, 128), count, jnp.int32)
        x_ref[:] = x
        st_ref[:] = x

    if with_tri:
        def kernel(sin_ref, thl_ref, tri_ref, out_ref, cnt_ref, st_ref,
                   x_ref):
            body(sin_ref, thl_ref, tri_ref[:], out_ref, cnt_ref, st_ref,
                 x_ref)
    else:
        def kernel(sin_ref, thl_ref, out_ref, cnt_ref, st_ref, x_ref):
            body(sin_ref, thl_ref, None, out_ref, cnt_ref, st_ref, x_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("unroll", "sg", "interpret",
                                             "lmajor"))
def pallas_encode_grouped_u8(syms: jnp.ndarray, freqs_g: jnp.ndarray,
                             cums_g: jnp.ndarray, unroll: int = 4,
                             sg: int = 1024, interpret: bool = False,
                             lmajor: bool = False):
    """pallas_encode_grouped with the u8 fast input path: identical
    (rows, counts, states) output, but the only XLA-side data pass is
    one (S, L) -> (L, S) transpose — or NONE with lmajor=True (syms
    already (L, S), e.g. from rans.grid_lanes_lmajor)."""
    g = freqs_g.shape[0]
    if lmajor:
        l, s = syms.shape
    else:
        s, l = syms.shape
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and 1 <= unroll <= 4
    u = unroll
    thl = merged_fetch_table(freqs_g, cums_g)
    # the (sg, sg) bf16 tri constant costs 2*sg^2 bytes of scoped VMEM
    # (past ~2048 lanes it cannot fit next to the working set), and
    # _encode_body only consumes it on the wide-compaction range — so
    # only ship it when both hold (review fix r5)
    with_tri = sg <= 2048 and 32768 < g * sg <= 65536
    nblk = l // u
    sin = (syms if lmajor else syms.T).reshape(nblk, u, g, sg)
    in_specs = [
        pl.BlockSpec((1, u, g, sg), lambda t: (nblk - 1 - t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, 32, 32), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_tri:
        col = jnp.arange(sg, dtype=jnp.int32)
        tri = (col[:, None] <= col[None, :]).astype(jnp.bfloat16)
        in_specs.append(pl.BlockSpec((sg, sg), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM))
    out, cnt, st = pl.pallas_call(
        _make_kernel_u8(u, g, sg, with_tri=with_tri),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, u * g, sg), lambda t: (nblk - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u, 128), lambda t: (nblk - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sg), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, u * g, sg), jnp.int16),
            jax.ShapeDtypeStruct((nblk, u, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, sg), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32)],
        interpret=interpret,
    )(*((sin, thl, tri) if with_tri else (sin, thl)))
    rows = out.reshape(l, s)
    counts = cnt[:, :, 0].reshape(l)
    states = jax.lax.bitcast_convert_type(st.reshape(s), jnp.uint32)
    return rows, counts, states


def _make_kernel_raw(u, g, sg):
    """Two-phase variant: per-step work is ONLY fetch + state update;
    the (low16, emit) grids stream out raw and one global bandwidth-
    bound butterfly pass packs them outside the kernel (mirrors
    entropy/rans.py jax_encode_grouped's two-phase structure — the
    in-kernel per-step compaction of `_make_kernel` costs ~8 radix-4
    stages over all S lanes per SYMBOL, which is exactly the work the
    XLA path hoists into one global pass).  Each lane stores
    (emit << 16) | low16 packed in ONE i32 output."""
    def kernel(sin_ref, thl_ref, le_ref, st_ref, x_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_ref[:] = jnp.full((g, sg), RANS_L, jnp.int32)

        x = x_ref[:]
        for j in range(u):
            sym = (sin_ref[0] >> (8 * j)) & 255
            gc = math.gcd(g, 8)
            parts = [
                _fetch_fc_fused(sym[ci:ci + gc], thl_ref[ci:ci + gc],
                                gc, sg)
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
            for _ in range(1):  # one round suffices: post-renorm x < f*2^17 so the
        # f32 estimate is within 2^-7 -> |q_est - q| <= 1 (r5: the second
        # margin round measured ~0.5 ms across the bench kernels)
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
        x_ref[:] = x
        st_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("unroll", "sg", "interpret"))
def pallas_encode_grouped(syms: jnp.ndarray, freqs_g: jnp.ndarray,
                          cums_g: jnp.ndarray, unroll: int = 4,
                          sg: int = 1024, interpret: bool = False):
    """syms (S, L) u8 lane matrix (lane s = g * SG + i), freqs_g/cums_g
    (G, 256).  Returns (rows (L, S) i32 padded word rows in decode-step
    order with each row's words as a flat prefix, counts (L,) i32,
    states (S,) u32) — `assemble_stream` turns rows+counts into the
    exact jax_encode_grouped stream.  Requires l % unroll == 0,
    unroll <= 4, S = G * sg."""
    g = freqs_g.shape[0]
    s, l = syms.shape
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and 1 <= unroll <= 4
    u = unroll
    thl = merged_fetch_table(freqs_g, cums_g)              # (G, 32, 32)
    # pack u symbol planes per grid step, REVERSED column order: grid
    # step t, byte j <-> symbol column l-1-(t*u+j)
    rev = syms[:, ::-1].astype(jnp.int32)                  # (S, L)
    r4 = rev.T.reshape(l // u, u, g, sg)
    sin = jnp.zeros((l // u, g, sg), jnp.int32)
    for j in range(u):
        sin = sin | (r4[:, j] << (8 * j))
    nblk = l // u
    out, cnt, st = pl.pallas_call(
        _make_kernel(u, g, sg),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, g, sg), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 32, 32), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # encode grid runs NEWEST symbol first; decode rows count
            # up from the stream head, so block t writes row nblk-1-t
            pl.BlockSpec((1, u * g, sg), lambda t: (nblk - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u, 128), lambda t: (nblk - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sg), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, u * g, sg), jnp.int16),
            jax.ShapeDtypeStruct((nblk, u, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, sg), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.int32)],
        interpret=interpret,
    )(sin, thl)
    rows = out.reshape(l, s)
    counts = cnt[:, :, 0].reshape(l)
    states = jax.lax.bitcast_convert_type(
        st.reshape(s), jnp.uint32)
    return rows, counts, states


@functools.partial(jax.jit, static_argnames=("unroll", "sg", "interpret"))
def pallas_encode_grouped_raw(syms: jnp.ndarray, freqs_g: jnp.ndarray,
                              cums_g: jnp.ndarray, unroll: int = 4,
                              sg: int = 1024, interpret: bool = False):
    """Two-phase Pallas encode: the kernel streams packed
    (emit << 16) | low16 grids in decode-step order ((L, S) i32);
    `finish_stream` (one global butterfly pass) packs the stream.
    Same stream bytes as jax_encode_grouped / the compacting kernel
    (the per-step in-kernel compaction dominates
    `pallas_encode_grouped`, so this two-phase split mirrors the XLA
    path's structure with the scan inside one kernel)."""
    g = freqs_g.shape[0]
    s, l = syms.shape
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and 1 <= unroll <= 4
    u = unroll
    f16 = freqs_g.astype(jnp.int32).reshape(g, 16, 16)
    c16 = cums_g.astype(jnp.int32).reshape(g, 16, 16)
    thl = jnp.concatenate(
        [(f16 >> 8), (f16 & 255), (c16 >> 8), (c16 & 255)],
        axis=2).astype(jnp.bfloat16)
    rev = syms[:, ::-1].astype(jnp.int32)
    r4 = rev.T.reshape(l // u, u, g, sg)
    sin = jnp.zeros((l // u, g, sg), jnp.int32)
    for j in range(u):
        sin = sin | (r4[:, j] << (8 * j))
    nblk = l // u
    le, st = pl.pallas_call(
        _make_kernel_raw(u, g, sg),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, g, sg), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 16, 64), lambda t: (0, 0, 0),
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
    )(sin, thl)
    states = jax.lax.bitcast_convert_type(st.reshape(s), jnp.uint32)
    return le.reshape(l, s), states


def _make_kernel_raw_u8(u, g, sg):
    """Raw-variant kernel with u8 symbol input blocks (see
    _make_kernel_u8): kills the XLA-side reversal + byte-packing."""
    def kernel(sin_ref, thl_ref, le_ref, st_ref, x_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_ref[:] = jnp.full((g, sg), RANS_L, jnp.int32)

        x = x_ref[:]
        for rr in range(u - 1, -1, -1):
            sym = sin_ref[0, rr].astype(jnp.int32)
            gc = math.gcd(g, 8)
            parts = [
                _fetch_fc_merged(sym[ci:ci + gc], thl_ref[ci:ci + gc],
                                 gc, sg)
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
            for _ in range(1):  # one round suffices: post-renorm x < f*2^17 so the
        # f32 estimate is within 2^-7 -> |q_est - q| <= 1 (r5: the second
        # margin round measured ~0.5 ms across the bench kernels)
                over = r >= f
                q = jnp.where(over, q + 1, q)
                r = jnp.where(over, r - f, r)
                under = r < 0
                q = jnp.where(under, q - 1, q)
                r = jnp.where(under, r + f, r)
            x = (q << K_PROB) + r + cum
            le_ref[0, rr * g:(rr + 1) * g, :] = \
                low16 | (jnp.where(emit, 1, 0) << 16)
        x_ref[:] = x
        st_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("unroll", "sg", "interpret",
                                             "lmajor"))
def pallas_encode_grouped_raw_u8(syms: jnp.ndarray, freqs_g: jnp.ndarray,
                                 cums_g: jnp.ndarray, unroll: int = 4,
                                 sg: int = 1024, interpret: bool = False,
                                 lmajor: bool = False):
    """pallas_encode_grouped_raw with the u8 fast input path (and
    lmajor=True to take (L, S) directly from grid_lanes_lmajor)."""
    g = freqs_g.shape[0]
    if lmajor:
        l, s = syms.shape
    else:
        s, l = syms.shape
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and 1 <= unroll <= 4
    u = unroll
    thl = merged_fetch_table(freqs_g, cums_g)
    nblk = l // u
    sin = (syms if lmajor else syms.T).reshape(nblk, u, g, sg)
    le, st = pl.pallas_call(
        _make_kernel_raw_u8(u, g, sg),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, u, g, sg), lambda t: (nblk - 1 - t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 32, 32), lambda t: (0, 0, 0),
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
    )(sin, thl)
    states = jax.lax.bitcast_convert_type(st.reshape(s), jnp.uint32)
    return le.reshape(l, s), states


@jax.jit
def finish_stream(le: jnp.ndarray):
    """(L, S) i32 packed (emit << 16) | low16 grids in decode order ->
    (words u16 prefix, n_words, counts (L,) i32) via the global
    monotone compaction (entropy/rans.py butterfly_compact_chunked)."""
    from vcf_tpu.entropy.rans import (
        butterfly_compact,
        butterfly_compact_chunked,
    )

    l, s = le.shape
    emits = le >> 16
    flags = emits.reshape(-1) != 0
    vals = (le & 0xFFFF).astype(jnp.uint16).reshape(-1)
    n = vals.shape[0]
    if n % 32768 == 0 and n > 32768:
        words, n_words = butterfly_compact_chunked(vals, flags)
    else:
        words = butterfly_compact(vals, flags)
        n_words = jnp.sum(flags.astype(jnp.int32))
    counts = jnp.sum(emits.astype(jnp.int32), axis=1)
    return words, n_words, counts


def _make_compact_kernel(g2, sg2, radix=4):
    packed = radix == 2 and g2 * sg2 <= 32768

    def kernel(le_ref, out_ref, cnt_ref):
        le = le_ref[0]
        vals = le & 0xFFFF
        flags = (le >> 16) != 0
        if packed:
            out_ref[0] = _push_compact_packed(vals, flags, g2, sg2)
        else:
            out_ref[0] = _push_compact(vals, flags, g2, sg2, radix=radix)
        cnt_ref[0, 0:1, :] = jnp.full(
            (1, 128), jnp.sum(jnp.where(flags, 1, 0)), jnp.int32)
    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "sg2", "radix",
                                             "interpret", "place"))
def finish_stream_pallas(le: jnp.ndarray, chunk: int = 32768,
                         sg2: int = 1024, radix: int = 4,
                         interpret: bool = False, place: bool = False):
    """Pallas replacement for `finish_stream`: per-chunk radix-4
    compaction runs INSIDE one kernel (8 in-VMEM stages per chunk vs
    15 XLA ops-per-stage passes of butterfly_compact_chunked), then the
    standard stitch scan writes each chunk's packed prefix at its
    cumulative offset.  Same (words, n_words, counts) as
    `finish_stream`."""
    l, s = le.shape
    n = l * s
    assert n % chunk == 0 and chunk % sg2 == 0
    c = n // chunk
    g2 = chunk // sg2
    le3 = le.reshape(c, g2, sg2)
    kern = (_make_place_kernel(g2, sg2) if place
            else _make_compact_kernel(g2, sg2, radix=radix))
    packed, cnts = pl.pallas_call(
        kern,
        grid=(c,),
        in_specs=[pl.BlockSpec((1, g2, sg2), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, g2, sg2), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, g2, sg2), jnp.int32),
            jax.ShapeDtypeStruct((c, 1, 128), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((g2 + 2, 1, sg2), jnp.int32)] if place else []),
        interpret=interpret,
    )(le3)
    counts_chunk = cnts[:, 0, 0]                              # (C,)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_chunk)[:-1]])
    rows16 = (packed.reshape(c, chunk) & 0xFFFF).astype(jnp.uint16)

    def body(out, inp):
        row, off = inp
        return jax.lax.dynamic_update_slice(out, row, (off,)), None

    out, _ = jax.lax.scan(
        body, jnp.zeros((n,), jnp.uint16), (rows16, offs), unroll=4)
    n_words = offs[-1] + counts_chunk[-1]
    counts = jnp.sum(le >> 16, axis=1)                        # (L,)
    return out, n_words, counts


@functools.partial(jax.jit, static_argnames=())
def assemble_stream(rows: jnp.ndarray, counts: jnp.ndarray):
    """(L, S) i32 prefix-padded rows + (L,) counts -> (words (L*S,)
    u16 with the valid stream as a prefix, n_words i32).  Rows are
    written t-ascending at their cumulative offsets; each write's
    padding tail is overwritten by the next row's words, exactly like
    entropy/rans.py butterfly_compact_chunked's stitch pass."""
    l, s = rows.shape
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    def body(out, inp):
        row, off = inp
        return jax.lax.dynamic_update_slice(
            out, row.astype(jnp.uint16), (off,)), None

    out, _ = jax.lax.scan(
        body, jnp.zeros((l * s,), jnp.uint16), (rows, offs), unroll=4)
    return out, offs[-1] + counts[-1]
