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
