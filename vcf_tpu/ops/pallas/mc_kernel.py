"""Motion-compensation Pallas kernel.

`ops.motion.compensate` (vmapped dynamic_slice) lowers to an XLA
gather, which runs near-scalar on this backend (docs/PERF_NOTES.md:
~9 ns/element) — measured ~60 of the 81 ms honest 8x1080p GOP-encode
(r4 probe 21), and the same again on the decode side.  This kernel
reproduces it as the SAD kernel's displacement sweep run in reverse:
for each displacement (dy, dx), one VMEM roll of the reference slab
plus a per-pixel mask-accumulate

    pred += (mv_y == dy) & (mv_x == dx) ? rolled : 0

over all (2s+1)^2 displacements.  The masks partition the frame (every
block has exactly one mv), so the accumulated sum IS the gather —
pure VPU work, no HBM gathers, one slab read per (tile, channel).

Design notes (same family as sad_kernel.py):
* grid = (row_tile, channel, dy) with the dx sweep inside the kernel;
  the out block is revisited across dy (TPU grids are sequential), so
  the accumulator lives in the output VMEM block;
* slabs carry an s-row halo, edge-padded at frame boundaries — the
  reference's out-of-frame boundary fallback (src/IPP_DCT.py:378-395);
* per-pixel mv maps are precomputed in XLA (cheap broadcast); lane
  padding gets a sentinel displacement that never matches;
* `pltpu.roll` handles the unaligned shifts (dynamic lane-dim slices
  must be 128-aligned, rolls are legal for any shift);
* tiles are chosen from the divisors of H (multiples of the ME block)
  to keep slab + temporaries well under the 16 MB scoped-VMEM limit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


def _pick_tile(h: int, w: int, m: int, s: int):
    """Largest tile height dividing h (multiple of m) whose slab +
    in-kernel temporaries fit comfortably in scoped VMEM."""
    w2 = _round_up(w + 2 * s, 128)
    best = None
    for th in range(m, h + 1, m):
        if h % th:
            continue
        thp = _round_up(th + 2 * s, 8)
        # slab + out-acc + code map + ~3 live (TH, W2) f32 temporaries
        need = 4 * w2 * (thp + th + th + 3 * th)
        if need <= 6 * 1024 * 1024:
            best = th
    return best


def _mc_tile_kernel(flags_ref, code_ref, slab_ref, o_ref, *, s: int,
                    th: int, interpret: bool):
    """code map = (mv_y + s)*(2s+1) + (mv_x + s) per pixel, compared
    against the grid's (dy, dx) — one select per displacement.

    The sweep is VPU-compute-bound at ~4 ms per 1080p frame when run
    densely (r4 probe 48), but real motion is coherent: most tiles use
    a handful of distinct displacement codes.  `flags_ref` carries the
    per-(tile, code) occupancy (computed in XLA, exact), and every
    (dy, dx) whose code no block in the tile uses is SKIPPED — roll and
    select both — via pl.when.  Worst case (all 289 codes present in a
    tile) equals the dense sweep; typical video is 10-100x sparser."""
    dy = pl.program_id(2)
    n_side = 2 * s + 1
    roll = jnp.roll if interpret else pltpu.roll
    r = slab_ref[0, 0]                    # (THP, W2) one channel's slab
    thp, w2 = r.shape
    code = code_ref[0]                    # (TH, W2) int32

    @pl.when(dy == 0)
    def _init():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])

    base = dy * n_side
    any_dy = flags_ref[0, 0, n_side * n_side + dy]

    @pl.when(any_dy > 0)
    def _dy_body():
        # align halo row dy with tile row 0 (rows y + dy stay inside
        # the slab because y < TH and dy <= 2s <= THP - TH)
        row = roll(r, thp - dy, 0)[:th]
        for dx in range(n_side):
            flag = flags_ref[0, 0, base + dx]

            @pl.when(flag > 0)
            def _one(dx=dx, row=row):
                rx = row if dx == 0 else roll(row, w2 - dx, 1)
                o_ref[0, 0] = jnp.where(code == base + dx, rx, o_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("m", "s", "interpret"))
def mc_apply(ref: jnp.ndarray, mv: jnp.ndarray, m: int, s: int,
             interpret: bool = False) -> jnp.ndarray:
    """Motion-compensate `ref` (H, W, 3) float32 with per-block integer
    MVs (nby, nbx, 2) bounded by the search range s.  Bit-identical to
    ops.motion.compensate for |mv| <= s (tests/test_pallas.py)."""
    return mc_apply_planar(
        ref.transpose(2, 0, 1), mv, m, s, interpret=interpret
    ).transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=("m", "s", "tile_h",
                                             "interpret"))
def mc_apply_planar(ref: jnp.ndarray, mv: jnp.ndarray, m: int, s: int,
                    tile_h: int = 0, interpret: bool = False) -> jnp.ndarray:
    """Planar variant: (3, H, W) float32 in, (3, H, W) out — the IPP
    planar device path keeps everything channel-major, so no layout
    hops around the kernel."""
    _, h, w = ref.shape
    n_side = 2 * s + 1
    th = tile_h or _pick_tile(h, w, m, s)
    assert th is not None, (h, w, m, s)
    n_tiles = h // th
    thp = _round_up(th + 2 * s, 8)
    w2 = _round_up(w + 2 * s, 128)

    refp = jnp.pad(ref.astype(jnp.float32),
                   ((0, 0), (s, thp - th - s), (s, w2 - w - s)),
                   mode="edge")
    # (T, 3, THP, W2) per-channel halo slabs
    slabs = jnp.stack([
        jax.lax.dynamic_slice_in_dim(refp, t * th, thp, 1)
        for t in range(n_tiles)
    ])

    # per-pixel displacement-code map; lane padding gets a sentinel
    # that matches no (dy, dx)
    code_b = (mv[..., 0] + s) * n_side + (mv[..., 1] + s)
    code_img = jnp.repeat(jnp.repeat(code_b, m, 0), m, 1)      # (H, W)
    code_t = jnp.pad(code_img, ((0, 0), (0, w2 - w)),
                     constant_values=-1).reshape(n_tiles, th, w2)

    # per-(tile, code) occupancy: [0, n_side²) = exact code flags,
    # [n_side², n_side² + n_side) = any-code-with-this-dy flags
    n_codes = n_side * n_side
    tb = th // m                                   # block rows per tile
    code_tiles = code_b.reshape(n_tiles, tb, w // m)
    onehot = (code_tiles[..., None]
              == jnp.arange(n_codes)[None, None, None, :])
    cflags = jnp.any(onehot, axis=(1, 2)).astype(jnp.int32)  # (T, 289)
    dyflags = jnp.any(
        cflags.reshape(n_tiles, n_side, n_side) > 0, axis=2
    ).astype(jnp.int32)                                      # (T, 17)
    # scalars in SMEM: dynamic per-(dy, dx) indexing is legal there
    # ((T, 1, F) so the block's last two dims equal the array's)
    flags = jnp.concatenate([cflags, dyflags], axis=1)[:, None, :]

    kernel = functools.partial(_mc_tile_kernel, s=s, th=th,
                               interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, 3, n_side),
        in_specs=[
            pl.BlockSpec((1, 1, flags.shape[2]),
                         lambda t, c, d: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, th, w2), lambda t, c, d: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, thp, w2), lambda t, c, d: (t, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, th, w2), lambda t, c, d: (t, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 3, th, w2), jnp.float32),
        interpret=interpret,
    )(flags, code_t, slabs)

    # (T, 3, TH, W2) -> (3, H, W)
    return out[:, :, :, :w].transpose(1, 0, 2, 3).reshape(3, h, w)


def supports(h: int, w: int, m: int, s: int) -> bool:
    """Shape gate: some row-tile height must divide evenly and fit."""
    return (h % m == 0 and w % m == 0
            and _pick_tile(h, w, m, s) is not None)
