"""Full-search SAD motion estimation Pallas kernel.

Replaces the reference's thread-pool-over-block-rows search
(src/IPP_DCT.py:225-244,360-368).  Grid walks the displacement window;
each program computes the SAD of *every* block against the reference
shifted by its displacement — one fused |a-b| over the whole frame plus
a per-block reduction — all VPU/MXU work on VMEM-resident frames.  The
(D, nby, nbx) SAD volume is argmin-reduced outside (tiny).

Mosaic constraints shape the design (this kernel compiles on real v5e,
not just interpret mode): dynamic slices along the lane dimension must
be 128-aligned, so the displacement shift is applied with
`pltpu.roll` (dynamic circular rotate, legal for any shift) and the
wrapped garbage rows/columns are *implicitly masked by the pooling
matrices*, which carry ones only at valid frame positions.  Both
operands are padded to (8, 128)-tileable shapes on the host side.

The current luma frame and the padded reference stay resident in VMEM
across grid steps (the TPU grid is sequential), so HBM traffic is one
frame read total instead of one per displacement.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sad_kernel(cur_ref, refp_ref, pv_ref, ph_ref, o_ref, *, s: int,
                interpret: bool):
    d = pl.program_id(0)
    n_side = 2 * s + 1
    dy = d // n_side
    dx = d % n_side
    r = refp_ref[:]                     # (H2, W2), ref padded by s + tiling
    h2, w2 = r.shape
    roll = jnp.roll if interpret else pltpu.roll
    # shift so padded-ref row dy lands at row 0 (positive shifts only)
    r = roll(r, h2 - dy, 0)
    r = roll(r, w2 - dx, 1)
    diff = jnp.abs(cur_ref[:] - r)
    # per-block reduction as two matmuls with block-pooling matrices;
    # the pools are zero at padded/wrapped rows+cols, masking them out
    row_sum = jnp.dot(pv_ref[:], diff, preferred_element_type=jnp.float32)
    o_ref[0] = jnp.dot(row_sum, ph_ref[:], preferred_element_type=jnp.float32)


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


@functools.partial(jax.jit, static_argnames=("m", "s", "interpret"))
def sad_search(ref_luma: jnp.ndarray, cur_luma: jnp.ndarray, m: int, s: int,
               interpret: bool = False):
    """Full-search block ME.  Same contract as ops.motion.full_search:
    returns (mv (nby, nbx, 2) int32 (dy, dx), best sad (nby, nbx))."""
    h, w = cur_luma.shape
    nby, nbx = h // m, w // m
    n_side = 2 * s + 1
    n_disp = n_side * n_side
    h2 = _round_up(h + 2 * s, 8)
    w2 = _round_up(w + 2 * s, 128)
    ref_pad = jnp.pad(ref_luma.astype(jnp.float32),
                      ((s, h2 - h - s), (s, w2 - w - s)), mode="edge")
    cur_pad = jnp.pad(cur_luma.astype(jnp.float32),
                      ((0, h2 - h), (0, w2 - w)))
    # pooling matrices: ones over each m-block of the VALID region only
    pool_v = np.zeros((nby, h2), np.float32)
    for by in range(nby):
        pool_v[by, by * m:(by + 1) * m] = 1.0
    pool_h = np.zeros((w2, nbx), np.float32)
    for bx in range(nbx):
        pool_h[bx * m:(bx + 1) * m, bx] = 1.0
    kernel = functools.partial(_sad_kernel, s=s, interpret=interpret)
    sads = pl.pallas_call(
        kernel,
        grid=(n_disp,),
        in_specs=[
            pl.BlockSpec((h2, w2), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, w2), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nby, h2), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, nbx), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nby, nbx), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_disp, nby, nbx), jnp.float32),
        interpret=interpret,
    )(cur_pad, ref_pad, jnp.asarray(pool_v), jnp.asarray(pool_h))

    disp = jnp.stack(
        jnp.meshgrid(jnp.arange(-s, s + 1), jnp.arange(-s, s + 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    best = jnp.argmin(sads, axis=0)
    mv = disp[best].astype(jnp.int32)
    return mv, jnp.min(sads, axis=0)


# ---------------------------------------------------------------------------
# Row-tiled variant: 1080p-class frames (the untiled kernel keeps both
# whole frames in VMEM, >16 MB at 1080p, so video/ipp.py fell back to
# the latency-bound XLA roll-per-displacement search — VERDICT r2
# BASELINE config 5's encode wall)
# ---------------------------------------------------------------------------

def _sad_tile_kernel(cur_ref, refp_ref, pv_ref, ph_ref, o_ref, *, s: int,
                     nby_t: int, interpret: bool):
    """Grid (tile, dy); the dx sweep runs INSIDE the kernel (one
    column roll per iteration) — 2s+1 fewer grid steps and the tile's
    slabs stay register/VMEM-hot across the whole row of
    displacements."""
    dy = pl.program_id(1)
    n_side = 2 * s + 1
    r = refp_ref[0]                     # (THP, W2): tile + s halo rows
    thp, w2 = r.shape
    roll = jnp.roll if interpret else pltpu.roll
    # align halo row dy with tile row 0: out[y] = in[(y + dy) % thp];
    # y < TH never wraps because THP >= TH + 2s, and rows >= TH never
    # enter the diff
    r = roll(r, thp - dy, 0)[:cur_ref.shape[1]]
    cur = cur_ref[0]
    for dx in range(n_side):
        rx = r if dx == 0 else roll(r, w2 - dx, 1)
        diff = jnp.abs(cur - rx)
        row_sum = jnp.dot(pv_ref[:], diff,
                          preferred_element_type=jnp.float32)
        o_ref[0, 0, dx * nby_t:(dx + 1) * nby_t, :] = jnp.dot(
            row_sum, ph_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("m", "s", "tile_h", "interpret"))
def sad_search_tiled(ref_luma: jnp.ndarray, cur_luma: jnp.ndarray, m: int,
                     s: int, tile_h: int = 0, interpret: bool = False):
    """Row-tiled full-search block ME, same contract as `sad_search`.

    The frame is cut into row tiles; each tile's reference slab carries
    an s-row halo (edge-padded at the frame boundary, exactly like the
    untiled kernel's global pad), pre-expanded in HBM so every grid
    block is a plain non-overlapping BlockSpec read.  Grid is
    (n_tiles, n_disp) with the displacement axis innermost, so the
    tile's cur/ref slabs stay VMEM-resident across all displacements
    (one HBM read per tile, not per displacement)."""
    h, w = cur_luma.shape
    if tile_h == 0:
        tile_h = h
        while 4 * (tile_h + 2 * s + 8) * _round_up(w + 2 * s, 128) * 2 \
                > 8 * 1024 * 1024 and tile_h % 2 == 0 and (tile_h // 2) % m == 0:
            tile_h //= 2
    th = tile_h
    assert h % th == 0 and th % m == 0, (h, th, m)
    n_tiles = h // th
    nby_t, nbx = th // m, w // m
    n_side = 2 * s + 1
    n_disp = n_side * n_side
    thp = _round_up(th + 2 * s, 8)
    w2 = _round_up(w + 2 * s, 128)
    ref_pad = jnp.pad(ref_luma.astype(jnp.float32),
                      ((s, thp - th - s), (s, w2 - w - s)), mode="edge")
    # overlapping halo slabs, pre-expanded: slab t = rows [t*th, t*th+thp)
    # of the padded frame (tile rows + s halo each side + tile rounding)
    slabs = jnp.stack([
        jax.lax.dynamic_slice_in_dim(ref_pad, t * th, thp, 0)
        for t in range(n_tiles)
    ])                                                       # (T, THP, W2)
    cur_pad = jnp.pad(cur_luma.astype(jnp.float32),
                      ((0, 0), (0, w2 - w))).reshape(n_tiles, th, w2)
    # diff covers tile rows only (wrap never reaches rows < TH), so the
    # row pool is a plain block-sum matrix over the tile
    pool_v = np.zeros((nby_t, th), np.float32)
    for by in range(nby_t):
        pool_v[by, by * m:(by + 1) * m] = 1.0
    pool_h = np.zeros((w2, nbx), np.float32)
    for bx in range(nbx):
        pool_h[bx * m:(bx + 1) * m, bx] = 1.0
    kernel = functools.partial(_sad_tile_kernel, s=s, nby_t=nby_t,
                               interpret=interpret)
    sads = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_side),
        in_specs=[
            pl.BlockSpec((1, th, w2), lambda t, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, thp, w2), lambda t, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nby_t, th), lambda t, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, nbx), lambda t, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_side * nby_t, nbx),
                               lambda t, d: (t, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_side, n_side * nby_t, nbx),
                                       jnp.float32),
        interpret=interpret,
    )(cur_pad, slabs, jnp.asarray(pool_v), jnp.asarray(pool_h))

    # (T, dy, dx*nby_t, nbx) -> (D, T*nby_t, nbx)
    sads = sads.reshape(n_tiles, n_side, n_side, nby_t, nbx)
    sads = sads.transpose(1, 2, 0, 3, 4).reshape(
        n_disp, n_tiles * nby_t, nbx)
    disp = jnp.stack(
        jnp.meshgrid(jnp.arange(-s, s + 1), jnp.arange(-s, s + 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    best = jnp.argmin(sads, axis=0)
    mv = disp[best].astype(jnp.int32)
    return mv, jnp.min(sads, axis=0)
