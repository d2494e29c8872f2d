"""Full-search SAD motion estimation Pallas kernel.

Replaces the reference's thread-pool-over-block-rows search
(src/IPP_DCT.py:225-244,360-368).  Grid walks the displacement window;
each program computes the SAD of *every* block against the reference
shifted by its displacement: one fused |a-b| over the whole frame plus
a per-block reduction — all VPU work on VMEM-resident frames.  The
(D, nby, nbx) SAD volume is argmin-reduced outside (tiny).

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


def _sad_kernel(cur_ref, refp_ref, pv_ref, ph_ref, o_ref, *, m: int, s: int):
    d = pl.program_id(0)
    n_side = 2 * s + 1
    dy = d // n_side
    dx = d % n_side
    h, w = cur_ref.shape
    shifted = refp_ref[pl.ds(dy, h), pl.ds(dx, w)]
    diff = jnp.abs(cur_ref[:] - shifted)
    # per-block reduction as two matmuls with ones-block pooling matrices
    # (Mosaic-friendly: no lane-splitting reshape)
    row_sum = jnp.dot(pv_ref[:], diff, preferred_element_type=jnp.float32)
    o_ref[0] = jnp.dot(row_sum, ph_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("m", "s", "interpret"))
def sad_search(ref_luma: jnp.ndarray, cur_luma: jnp.ndarray, m: int, s: int,
               interpret: bool = False):
    """Full-search block ME.  Same contract as ops.motion.full_search:
    returns (mv (nby, nbx, 2) int32 (dy, dx), best sad (nby, nbx))."""
    h, w = cur_luma.shape
    n_side = 2 * s + 1
    n_disp = n_side * n_side
    ref_pad = jnp.pad(ref_luma.astype(jnp.float32), ((s, s), (s, s)), mode="edge")
    pool_v = jnp.asarray(np.kron(np.eye(h // m, dtype=np.float32), np.ones((1, m), np.float32)))
    pool_h = jnp.asarray(np.kron(np.eye(w // m, dtype=np.float32), np.ones((m, 1), np.float32)))
    kernel = functools.partial(_sad_kernel, m=m, s=s)
    sads = pl.pallas_call(
        kernel,
        grid=(n_disp,),
        in_specs=[
            pl.BlockSpec((h, w), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h + 2 * s, w + 2 * s), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h // m, h), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w // m), lambda d: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // m, w // m), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_disp, h // m, w // m), jnp.float32),
        interpret=interpret,
    )(cur_luma.astype(jnp.float32), ref_pad, pool_v, pool_h)

    disp = jnp.stack(
        jnp.meshgrid(jnp.arange(-s, s + 1), jnp.arange(-s, s + 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    best = jnp.argmin(sads, axis=0)
    mv = disp[best].astype(jnp.int32)
    return mv, jnp.min(sads, axis=0)
