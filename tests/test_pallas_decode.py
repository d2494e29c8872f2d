"""Pallas whole-scan grouped-rANS decode (ops/pallas/rans_decode.py).

Runs in interpret mode on CPU (conftest forces the CPU backend); the
kernel must be bit-identical to entropy/rans.py jax_decode_grouped,
whose streams are pinned against the numpy mirror elsewhere.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vcf_tpu.entropy import rans
from vcf_tpu.ops.pallas import rans_decode as rd


def _stream(G, SG, L, seed=0):
    rng = np.random.default_rng(seed)
    S = G * SG
    syms = (rng.integers(0, 250, size=(S, L))
            % rng.integers(2, 250, size=(S, 1))).astype(np.uint8)
    freqs_g = np.stack([
        rans.quantize_freqs(
            np.bincount(syms[g * SG:(g + 1) * SG].reshape(-1),
                        minlength=256), min_all=True)
        for g in range(G)])
    cums_g = np.stack([
        np.concatenate(([0], np.cumsum(f)))[:256].astype(np.uint32)
        for f in freqs_g])
    fj = jnp.asarray(freqs_g.astype(np.uint32))
    cj = jnp.asarray(cums_g)
    w, nw, st, counts = rans.jax_encode_grouped(
        jnp.asarray(syms), fj, cj, unroll=4, with_counts=True)
    return syms, fj, cj, w, int(nw), st, counts


class TestPallasDecode:
    @pytest.mark.parametrize("unroll", [1, 2, 4])
    def test_bit_exact_vs_xla(self, unroll):
        G, SG, L = 4, 128, 12
        syms, fj, cj, w, nw, st, counts = _stream(G, SG, L)
        counts_h = np.asarray(counts)
        cap = SG * max(1, -(-int(counts_h.max()) // SG))
        wpad = jnp.concatenate([w[:nw], jnp.zeros(cap + 16, jnp.uint16)])
        win = rd.build_windows(wpad, counts, cap)
        out = rd.pallas_decode_grouped(win, st, fj, cj, L, cap,
                                       unroll=unroll, sg=SG, interpret=True)
        assert np.array_equal(np.asarray(out), syms)

    def test_many_groups_chunked_resolve(self):
        # g > the resolve chunk (16) exercises the chunk loop
        G, SG, L = 64, 8, 8
        syms, fj, cj, w, nw, st, counts = _stream(G, SG, L, seed=3)
        counts_h = np.asarray(counts)
        cap = SG * max(1, -(-int(counts_h.max()) // SG))
        cap = min(cap, G * SG)
        wpad = jnp.concatenate([w[:nw], jnp.zeros(cap + 16, jnp.uint16)])
        win = rd.build_windows(wpad, counts, cap)
        out = rd.pallas_decode_grouped(win, st, fj, cj, L, cap,
                                       unroll=4, sg=SG, interpret=True)
        assert np.array_equal(np.asarray(out), syms)

    def test_build_windows_rows(self):
        G, SG, L = 2, 64, 8
        syms, fj, cj, w, nw, st, counts = _stream(G, SG, L, seed=1)
        counts_h = np.asarray(counts)
        cap = SG * max(1, -(-int(counts_h.max()) // SG))
        wpad = jnp.concatenate([w[:nw], jnp.zeros(cap + 16, jnp.uint16)])
        win = np.asarray(rd.build_windows(wpad, counts, cap))
        wh = np.asarray(wpad).astype(np.int32)
        ptr = 0
        for t in range(L):
            assert np.array_equal(win[t], wh[ptr:ptr + cap])
            ptr += counts_h[t]
        assert ptr == nw


class TestPallasEncode:
    """Pallas whole-scan grouped-rANS encode (ops/pallas/rans_encode.py)
    must reproduce jax_encode_grouped's stream bit-exactly."""

    @pytest.mark.parametrize("unroll", [2, 3, 4])
    def test_bit_exact_vs_xla(self, unroll):
        from vcf_tpu.ops.pallas import rans_encode as re_

        G, SG, L = 4, 128, 12
        syms, fj, cj, wx, nwx, stx, ctx = _stream(G, SG, L, seed=5)
        rows, counts, states = re_.pallas_encode_grouped(
            jnp.asarray(syms), fj, cj, unroll=unroll, sg=SG, interpret=True)
        wp, nwp = re_.assemble_stream(rows, counts)
        assert int(nwp) == nwx
        assert np.array_equal(np.asarray(wp[:nwx]), np.asarray(wx[:nwx]))
        assert np.array_equal(np.asarray(states), np.asarray(stx))
        assert np.array_equal(np.asarray(counts), np.asarray(ctx))

    def test_many_groups(self):
        from vcf_tpu.ops.pallas import rans_encode as re_

        G, SG, L = 64, 8, 8
        syms, fj, cj, wx, nwx, stx, ctx = _stream(G, SG, L, seed=6)
        rows, counts, states = re_.pallas_encode_grouped(
            jnp.asarray(syms), fj, cj, unroll=4, sg=SG, interpret=True)
        wp, nwp = re_.assemble_stream(rows, counts)
        assert int(nwp) == nwx
        assert np.array_equal(np.asarray(wp[:nwx]), np.asarray(wx[:nwx]))

    def test_encode_decode_pallas_roundtrip(self):
        """Kernel encode -> kernel decode closes the loop."""
        from vcf_tpu.ops.pallas import rans_encode as re_

        G, SG, L = 4, 128, 12
        syms, fj, cj, _, _, _, _ = _stream(G, SG, L, seed=7)
        rows, counts, states = re_.pallas_encode_grouped(
            jnp.asarray(syms), fj, cj, unroll=4, sg=SG, interpret=True)
        wp, nwp = re_.assemble_stream(rows, counts)
        counts_h = np.asarray(counts)
        cap = SG * max(1, -(-int(counts_h.max()) // SG))
        cap = min(cap, G * SG)
        wpad = jnp.concatenate([wp[:int(nwp)],
                                jnp.zeros(cap + 16, jnp.uint16)])
        win = rd.build_windows(wpad, counts, cap)
        out = rd.pallas_decode_grouped(win, states, fj, cj, L, cap,
                                       unroll=4, sg=SG, interpret=True)
        assert np.array_equal(np.asarray(out), syms)


def test_sad_search_tiled_matches_full():
    from vcf_tpu.ops import motion
    from vcf_tpu.ops.pallas.sad_kernel import sad_search_tiled

    rng = np.random.default_rng(0)
    h, w, m, s = 128, 256, 16, 8
    ref = rng.integers(0, 255, size=(h, w)).astype(np.float32)
    cur = np.roll(ref, (3, -5), (0, 1)) \
        + rng.normal(0, 2, (h, w)).astype(np.float32)
    mv_t, sad_t = sad_search_tiled(jnp.asarray(ref), jnp.asarray(cur),
                                   m, s, tile_h=32, interpret=True)
    mv_f, sad_f = motion.full_search(jnp.asarray(ref), jnp.asarray(cur), m, s)
    assert np.array_equal(np.asarray(mv_t), np.asarray(mv_f))
    np.testing.assert_allclose(np.asarray(sad_t), np.asarray(sad_f),
                               atol=1e-1)


class TestGridLayout:
    """Grid-layout pair: encoder's raw (emit<<16)|low16 grid decodes
    with ZERO routing (renorm flags mirror emit flags lane-for-lane)."""

    @pytest.mark.parametrize("unroll", [3, 4])
    def test_grid_roundtrip(self, unroll):
        from vcf_tpu.ops.pallas import rans_encode as re_

        G, SG, L = 4, 128, 12
        syms, fj, cj, _, _, _, _ = _stream(G, SG, L, seed=9)
        le, st = re_.pallas_encode_grouped_raw(
            jnp.asarray(syms), fj, cj, unroll=unroll, sg=SG, interpret=True)
        out = rd.pallas_decode_grouped_grid(
            le, st, fj, cj, L, unroll=unroll, sg=SG, interpret=True)
        assert np.array_equal(np.asarray(out), syms)

    def test_finish_stream_pallas_matches_xla_stream(self):
        from vcf_tpu.ops.pallas import rans_encode as re_

        G, SG, L = 8, 128, 64   # n = 65536: exercises >1 chunk
        syms, fj, cj, wx, nwx, stx, ctx = _stream(G, SG, L, seed=10)
        le, st = re_.pallas_encode_grouped_raw(
            jnp.asarray(syms), fj, cj, unroll=4, sg=SG, interpret=True)
        wp, nwp, counts = re_.finish_stream_pallas(
            le, chunk=8192, sg2=128, interpret=True)
        assert int(nwp) == nwx
        assert np.array_equal(np.asarray(wp[:nwx]), np.asarray(wx[:nwx]))
        assert np.array_equal(np.asarray(counts), np.asarray(ctx))


class TestCtxKernels:
    def test_ctx_kernels_match_xla(self):
        """pallas_encode_ctx_raw + finish == jax_encode_ctx stream;
        pallas_decode_ctx_grid inverts exactly (interpret mode)."""
        import jax.numpy as jnp
        from vcf_tpu.entropy.rans import (
            jax_encode_ctx, ctx_group_histograms, ctx_freqs_from_counts)
        from vcf_tpu.ops.pallas import rans_ctx
        from vcf_tpu.ops.pallas import rans_encode as re_

        rng = np.random.default_rng(9)
        g, sg, l = 64, 4, 12
        s = g * sg
        base = np.full((s, l), 128, np.int32)
        noise = rng.integers(-6, 7, size=base.shape) * (
            rng.random(base.shape) < 0.4)
        syms = np.clip(base + noise, 0, 255).astype(np.uint8)
        counts = np.asarray(ctx_group_histograms(jnp.asarray(syms), g))
        fgc, cgc = ctx_freqs_from_counts(counts)
        fj, cj = jnp.asarray(fgc), jnp.asarray(cgc)
        wx, nx, sx, _ = jax_encode_ctx(jnp.asarray(syms), fj, cj)
        le, st = rans_ctx.pallas_encode_ctx_raw(
            jnp.asarray(syms), fj, cj, unroll=4, sg=sg, interpret=True)
        wk, nk, _ = re_.finish_stream_pallas(le, chunk=256, sg2=64,
                                             radix=2, interpret=True)
        assert int(nx) == int(nk)
        np.testing.assert_array_equal(np.asarray(wx)[:int(nx)],
                                      np.asarray(wk)[:int(nk)])
        np.testing.assert_array_equal(np.asarray(sx), np.asarray(st))
        out = rans_ctx.pallas_decode_ctx_grid(
            le, st, fj, cj, l, unroll=4, sg=sg, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), syms)
