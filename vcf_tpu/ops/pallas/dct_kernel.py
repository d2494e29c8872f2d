"""Fused block-DCT + deadzone-quantize Pallas kernel.

One kernel per image plane covers: forward BxB DCT, deadzone
quantization (trunc toward zero), +offset and uint8 wrap — the whole
hot loop of the default pipeline (reference hot path:
src/2D-DCT.py:303,343-361) without materializing the f32 coefficient
tensor in HBM.

Mosaic-friendly formulation: the separable blockwise DCT over a
(ROWS, CW) tile is two *plain matmuls* with block-diagonal constant
matrices — ``coeff = (I ⊗ D) @ x @ (I ⊗ Dᵀ)`` — so the kernel contains
no lane-splitting reshapes (which Mosaic's layout inference rejects).
The kron matrices are tiny (32x32 and 512x512 f32 = 1 MB VMEM) and the
matmuls run on the MXU.

Layout: planar (C, H, W) float32 (channel-minor layouts waste 125/128
lanes).  Grid: (C, H/ROWS, W/CW); ROWS=32 satisfies the uint8 (32, 128)
min-tile, CW=512 keeps the block-diagonal matrix in VMEM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcf_tpu.ops import dct as dct_ops

ROWS = 32  # uint8 sublane tile
CW = 512   # lane chunk; block-diagonal matrix = CW*CW*4B = 1 MB


@functools.lru_cache(maxsize=None)
def _kron_dct(n: int, b: int, transpose: bool) -> np.ndarray:
    d = dct_ops.dct_matrix(b)
    return np.kron(np.eye(n // b, dtype=np.float32), d.T if transpose else d)


@functools.lru_cache(maxsize=None)
def _grid_perm(n: int, b: int) -> np.ndarray:
    """Permutation taking (block, coeff) order to (coeff, block) order
    within an n-wide tile: new index (g*n//b + blk) holds old
    (blk*b + g)."""
    nb = n // b
    perm = np.empty(n, np.int64)
    for g in range(b):
        for blk in range(nb):
            perm[g * nb + blk] = blk * b + g
    return perm


@functools.lru_cache(maxsize=None)
def _kron_dct_grid(n: int, b: int, transpose: bool) -> np.ndarray:
    """Kron DCT matrix with the subband-grid permutation folded in —
    zero extra cost in the kernel (same matmul, permuted constant).

    Encode: rows of the output tile come out in (coeff, block) order;
    decode uses the SAME matrices (orthogonal permutations cancel in
    bvᵀ P Pᵀ coeff)."""
    m = _kron_dct(n, b, transpose)
    perm = _grid_perm(n, b)
    if transpose:   # right operand: permute columns
        return np.ascontiguousarray(m[:, perm])
    return np.ascontiguousarray(m[perm])


def _encode_kernel(x_ref, bv_ref, bh_ref, o_ref, *, qss: int, offset: int):
    x = x_ref[0]
    y = jnp.dot(bv_ref[:], x, preferred_element_type=jnp.float32)
    coeff = jnp.dot(y, bh_ref[:], preferred_element_type=jnp.float32)
    k = jnp.trunc(coeff * (1.0 / qss)).astype(jnp.int32) + offset
    # Deadzone_Quantizer(min_val=0, max_val=255) saturates, not wraps
    # (src/deadzone.py:64)
    o_ref[0] = jnp.clip(k, 0, 255).astype(jnp.uint8)


def _decode_kernel(k_ref, bv_ref, bh_ref, o_ref, *, qss: int, offset: int):
    k = k_ref[0].astype(jnp.int32) - offset
    coeff = k.astype(jnp.float32) * qss
    # inverse: x = (I kron D)^T @ coeff @ (I kron D^T)^T
    y = jnp.dot(bv_ref[:].T, coeff, preferred_element_type=jnp.float32)
    o_ref[0] = jnp.dot(y, bh_ref[:].T, preferred_element_type=jnp.float32)


def _encode_kernel_p(x_ref, bv_ref, bh_ref, sc_ref, o_ref, *, qss: int,
                     offset: int):
    """Perceptual variant: the per-frequency JPEG-table scale is a
    per-channel (ROWS, CW) VMEM constant multiplied in BEFORE the
    quantizer divide, matching the XLA path's op order
    (perceptual_scale then deadzone_quantize) for bit-identity."""
    x = x_ref[0]
    y = jnp.dot(bv_ref[:], x, preferred_element_type=jnp.float32)
    coeff = jnp.dot(y, bh_ref[:], preferred_element_type=jnp.float32)
    coeff = coeff * sc_ref[0]
    k = jnp.trunc(coeff * (1.0 / qss)).astype(jnp.int32) + offset
    o_ref[0] = jnp.clip(k, 0, 255).astype(jnp.uint8)


def _decode_kernel_p(k_ref, bv_ref, bh_ref, sc_ref, o_ref, *, qss: int,
                     offset: int):
    k = k_ref[0].astype(jnp.int32) - offset
    # true divide (not reciprocal multiply): the XLA inverse path divides
    # by the table (perceptual_scale(inverse=True)) and knife-edge
    # coefficients must land identically
    coeff = k.astype(jnp.float32) * qss / sc_ref[0]
    y = jnp.dot(bv_ref[:].T, coeff, preferred_element_type=jnp.float32)
    o_ref[0] = jnp.dot(y, bh_ref[:].T, preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _percep_tile(c: int, rows: int, cw: int, b: int, grid: bool) -> np.ndarray:
    """Per-channel (c, rows, cw) perceptual scale constant for one tile.

    Block layout: position (r, col) holds coefficient (r % b, col % b);
    grid layout (the _kron_dct_grid output order): coefficient index is
    the tile-row block `r // (rows//b)`.  Channel 0 scales by the luma
    table, the rest by chroma (reference: src/2D-DCT.py:63-90)."""
    luma, chroma = dct_ops.perceptual_tables(b)
    out = np.empty((c, rows, cw), np.float32)
    if grid:
        ry = np.arange(rows) // (rows // b)
        cx = np.arange(cw) // (cw // b)
    else:
        ry = np.arange(rows) % b
        cx = np.arange(cw) % b
    for ch in range(c):
        t = luma if ch == 0 else chroma
        out[ch] = t[np.ix_(ry, cx)]
    return out


def _chunk_w(w: int, b: int) -> int:
    cw = min(w, CW)
    while w % cw:
        cw //= 2
    return max(cw, b)


def supports(h: int, w: int) -> bool:
    """Shapes these kernels compile for on real TPU: Mosaic's uint8
    min-tile is (32, 128), so rows must tile by 32 and the lane chunk
    must be a 128-multiple (CIF's 352 is not; those shapes take the XLA
    path)."""
    return h % ROWS == 0 and w % 128 == 0 and _chunk_w(w, 8) % 128 == 0


@functools.partial(jax.jit, static_argnames=("b", "qss", "offset", "interpret",
                                             "grid_layout", "perceptual"))
def fused_dct_quantize(planes: jnp.ndarray, b: int = 8, qss: int = 32,
                       offset: int = 128, interpret: bool = False,
                       grid_layout: bool = False,
                       perceptual: bool = False) -> jnp.ndarray:
    """(C, H, W) float32 -> (C, H, W) uint8 quantization indexes.

    grid_layout=False: block layout (subband reordering stays outside).
    grid_layout=True: each (ROWS, CW) tile comes out in subband-grid
    order — rows (coeff_y, block_y), cols (coeff_x, block_x) — via the
    permuted constant matrices (_kron_dct_grid), which makes the
    entropy laning a large-atom transpose instead of a byte shuffle
    (r4: the laning transposes were ~8 ms of the 14.5 ms 8x1080p
    encode transform).
    perceptual=True folds the JPEG-table coefficient prescale
    (reference: src/2D-DCT.py:63-90) in as a per-channel VMEM constant
    — one extra VPU multiply, no extra pass."""
    c, h, w = planes.shape
    assert h % ROWS == 0 and w % b == 0 and ROWS % b == 0
    cw = _chunk_w(w, b)
    mk = _kron_dct_grid if grid_layout else _kron_dct
    bv = jnp.asarray(mk(ROWS, b, transpose=False))
    bh = jnp.asarray(mk(cw, b, transpose=True))
    plane_spec = pl.BlockSpec((1, ROWS, cw), lambda i, j, k: (i, j, k),
                              memory_space=pltpu.VMEM)
    mat_specs = [
        pl.BlockSpec((ROWS, ROWS), lambda i, j, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cw, cw), lambda i, j, k: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if perceptual:
        sc = jnp.asarray(_percep_tile(c, ROWS, cw, b, grid_layout))
        kernel = functools.partial(_encode_kernel_p, qss=qss, offset=offset)
        in_specs = [plane_spec] + mat_specs + [
            pl.BlockSpec((1, ROWS, cw), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM)]
        operands = (planes, bv, bh, sc)
    else:
        kernel = functools.partial(_encode_kernel, qss=qss, offset=offset)
        in_specs = [plane_spec] + mat_specs
        operands = (planes, bv, bh)
    return pl.pallas_call(
        kernel,
        grid=(c, h // ROWS, w // cw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ROWS, cw), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.uint8),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("b", "qss", "offset", "interpret",
                                             "grid_layout", "perceptual"))
def fused_dequantize_idct(planes_u8: jnp.ndarray, b: int = 8, qss: int = 32,
                          offset: int = 128, interpret: bool = False,
                          grid_layout: bool = False,
                          perceptual: bool = False) -> jnp.ndarray:
    """(C, H, W) uint8 indexes -> (C, H, W) float32 pixels (color inverse
    and +offset fuse outside).  grid_layout: input tiles are in the
    subband-grid order fused_dct_quantize(grid_layout=True) emits; the
    same permuted matrices invert it for free (P is orthogonal, so
    bvᵀ P Pᵀ coeff cancels).  perceptual: divide the dequantized
    coefficients by the JPEG-table constant before the inverse DCT."""
    c, h, w = planes_u8.shape
    assert h % ROWS == 0 and w % b == 0 and ROWS % b == 0
    cw = _chunk_w(w, b)
    mk = _kron_dct_grid if grid_layout else _kron_dct
    bv = jnp.asarray(mk(ROWS, b, transpose=False))
    bh = jnp.asarray(mk(cw, b, transpose=True))
    plane_spec = pl.BlockSpec((1, ROWS, cw), lambda i, j, k: (i, j, k),
                              memory_space=pltpu.VMEM)
    mat_specs = [
        pl.BlockSpec((ROWS, ROWS), lambda i, j, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cw, cw), lambda i, j, k: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if perceptual:
        sc = jnp.asarray(_percep_tile(c, ROWS, cw, b, grid_layout))
        kernel = functools.partial(_decode_kernel_p, qss=qss, offset=offset)
        in_specs = [plane_spec] + mat_specs + [
            pl.BlockSpec((1, ROWS, cw), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM)]
        operands = (planes_u8, bv, bh, sc)
    else:
        kernel = functools.partial(_decode_kernel, qss=qss, offset=offset)
        in_specs = [plane_spec] + mat_specs
        operands = (planes_u8, bv, bh)
    return pl.pallas_call(
        kernel,
        grid=(c, h // ROWS, w // cw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ROWS, cw), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
    )(*operands)


def static_mat(m) -> tuple:
    """3x3 color matrix -> hashable nested float tuple for the fused
    kernels' static `m` argument (shared by mesh.py / ipp.py / bench)."""
    return tuple(tuple(float(v) for v in row) for row in np.asarray(m))


def _encode_kernel_cdct(x_ref, bv_ref, bh_ref, o_ref, *, qss: int,
                        offset: int, m: tuple):
    """Color-fused encode: the 3x3 color forward (baked scalar
    constants) + per-channel block DCT + deadzone quantize in ONE
    kernel — u8 in, u8 out, no (C, H, W) f32 coefficient or
    color-transformed tensor ever hits HBM (r5: the color einsums were
    ~2x200 MB of pure HBM traffic per direction at bench shapes)."""
    # Mosaic has no u8->f32 cast; go through i32 (CLAUDE.md dtype laws)
    xs = [x_ref[c].astype(jnp.int32).astype(jnp.float32) - offset
          for c in range(3)]
    for d in range(3):
        ct = m[d][0] * xs[0] + m[d][1] * xs[1] + m[d][2] * xs[2]
        y = jnp.dot(bv_ref[:], ct, preferred_element_type=jnp.float32)
        coeff = jnp.dot(y, bh_ref[:], preferred_element_type=jnp.float32)
        k = jnp.trunc(coeff * (1.0 / qss)).astype(jnp.int32) + offset
        o_ref[d] = jnp.clip(k, 0, 255).astype(jnp.uint8)


def _decode_kernel_cdct(k_ref, bv_ref, bh_ref, o_ref, *, qss: int,
                        offset: int, m: tuple):
    """Color-fused decode: dequantize + inverse DCT per channel, then
    the 3x3 color inverse + offset + round/clip to u8 pixels."""
    cts = []
    for d in range(3):
        k = k_ref[d].astype(jnp.int32) - offset
        coeff = k.astype(jnp.float32) * qss
        y = jnp.dot(bv_ref[:].T, coeff, preferred_element_type=jnp.float32)
        cts.append(jnp.dot(y, bh_ref[:].T,
                           preferred_element_type=jnp.float32))
    for c in range(3):
        pix = (m[c][0] * cts[0] + m[c][1] * cts[1] + m[c][2] * cts[2]
               + offset)
        # f32->u8 is unsupported; round in f32, clip in i32 (same law)
        o_ref[c] = jnp.clip(jnp.round(pix).astype(jnp.int32),
                            0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("m", "b", "qss", "offset",
                                             "interpret", "grid_layout"))
def fused_cdct_quantize(planes: jnp.ndarray, m: tuple, b: int = 8,
                        qss: int = 32, offset: int = 128,
                        interpret: bool = False,
                        grid_layout: bool = False) -> jnp.ndarray:
    """(3, H, W) uint8 pixel planes -> (3, H, W) uint8 quantization
    indexes with the color forward fused in.  `m` is the 3x3 color
    matrix as a nested tuple of floats (static — baked into the
    kernel)."""
    c, h, w = planes.shape
    assert c == 3 and h % ROWS == 0 and w % b == 0 and ROWS % b == 0
    cw = _chunk_w(w, b)
    mk = _kron_dct_grid if grid_layout else _kron_dct
    bv = jnp.asarray(mk(ROWS, b, transpose=False))
    bh = jnp.asarray(mk(cw, b, transpose=True))
    kernel = functools.partial(_encode_kernel_cdct, qss=qss,
                               offset=offset, m=m)
    return pl.pallas_call(
        kernel,
        grid=(h // ROWS, w // cw),
        in_specs=[
            pl.BlockSpec((3, ROWS, cw), lambda j, k: (0, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ROWS), lambda j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, cw), lambda j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, ROWS, cw), lambda j, k: (0, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint8),
        interpret=interpret,
    )(planes, bv, bh)


@functools.partial(jax.jit, static_argnames=("m", "b", "qss", "offset",
                                             "interpret", "grid_layout"))
def fused_dequantize_cdct(planes_u8: jnp.ndarray, m: tuple, b: int = 8,
                          qss: int = 32, offset: int = 128,
                          interpret: bool = False,
                          grid_layout: bool = False) -> jnp.ndarray:
    """(3, H, W) uint8 indexes -> (3, H, W) uint8 pixels with the color
    inverse + round/clip fused in.  `m` is the 3x3 INVERSE color
    matrix as a nested tuple."""
    c, h, w = planes_u8.shape
    assert c == 3 and h % ROWS == 0 and w % b == 0 and ROWS % b == 0
    cw = _chunk_w(w, b)
    mk = _kron_dct_grid if grid_layout else _kron_dct
    bv = jnp.asarray(mk(ROWS, b, transpose=False))
    bh = jnp.asarray(mk(cw, b, transpose=True))
    kernel = functools.partial(_decode_kernel_cdct, qss=qss,
                               offset=offset, m=m)
    return pl.pallas_call(
        kernel,
        grid=(h // ROWS, w // cw),
        in_specs=[
            pl.BlockSpec((3, ROWS, cw), lambda j, k: (0, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ROWS), lambda j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, cw), lambda j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, ROWS, cw), lambda j, k: (0, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint8),
        interpret=interpret,
    )(planes_u8, bv, bh)


def supports_padded(h: int, w: int, b: int = 8) -> bool:
    """Shapes the pad-and-crop wrappers accept: any block-multiple
    frame whose rows tile by 32 after padding (CIF 352x288 included —
    the raw kernels reject W % 128 != 0 and those shapes fell off a
    ~4.5x cliff onto the XLA path, VERDICT r3 weak #5)."""
    return h % b == 0 and w % b == 0


@functools.partial(jax.jit, static_argnames=("b", "qss", "offset",
                                             "interpret", "grid_layout",
                                             "perceptual"))
def fused_dct_quantize_any(planes: jnp.ndarray, b: int = 8, qss: int = 32,
                           offset: int = 128, interpret: bool = False,
                           grid_layout: bool = False,
                           perceptual: bool = False) -> jnp.ndarray:
    """fused_dct_quantize for any block-multiple (H, W): rows pad to a
    32-multiple and columns to a 128-multiple (zeros — every padded
    block is independent of the real ones), the kernel runs on the
    padded plane, and the result is cropped.  grid_layout is only
    meaningful for unpadded shapes (the tile permutation spans padded
    columns), so it is rejected when padding would occur."""
    c, h, w = planes.shape
    hp, wp = _round_up(h, ROWS), _round_up(w, 128)
    if hp == h and wp == w:
        return fused_dct_quantize(planes, b=b, qss=qss, offset=offset,
                                  interpret=interpret,
                                  grid_layout=grid_layout,
                                  perceptual=perceptual)
    assert not grid_layout, "grid_layout requires kernel-native shapes"
    padded = jnp.pad(planes, ((0, 0), (0, hp - h), (0, wp - w)))
    out = fused_dct_quantize(padded, b=b, qss=qss, offset=offset,
                             interpret=interpret, perceptual=perceptual)
    return out[:, :h, :w]


@functools.partial(jax.jit, static_argnames=("b", "qss", "offset",
                                             "interpret", "grid_layout",
                                             "perceptual"))
def fused_dequantize_idct_any(planes_u8: jnp.ndarray, b: int = 8,
                              qss: int = 32, offset: int = 128,
                              interpret: bool = False,
                              grid_layout: bool = False,
                              perceptual: bool = False) -> jnp.ndarray:
    """Inverse wrapper: pad the index planes with `offset` (the zero
    quantization index), run the kernel, crop.  Padded blocks decode to
    garbage that never reaches the output."""
    c, h, w = planes_u8.shape
    hp, wp = _round_up(h, ROWS), _round_up(w, 128)
    if hp == h and wp == w:
        return fused_dequantize_idct(planes_u8, b=b, qss=qss,
                                     offset=offset, interpret=interpret,
                                     grid_layout=grid_layout,
                                     perceptual=perceptual)
    assert not grid_layout, "grid_layout requires kernel-native shapes"
    padded = jnp.pad(planes_u8, ((0, 0), (0, hp - h), (0, wp - w)),
                     constant_values=offset)
    out = fused_dequantize_idct(padded, b=b, qss=qss, offset=offset,
                                interpret=interpret, perceptual=perceptual)
    return out[:, :h, :w]


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k
