"""Interpret-mode parity for the r5 kernel variants (review fix r5).

Every r5 fast path — u8-input encode kernels (compact/raw/ctx),
L-major u8-store decode variants, the carry-hi packed wide compaction,
the matmul prefix rank, and the two-hot merged fetch table — is pinned
against the pre-existing kernel/XLA implementations in CPU interpret
mode, so a regression ships through `pytest tests/` instead of only
the manual chip gate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from vcf_tpu.entropy import rans as rans_mod
from vcf_tpu.ops.pallas import rans_ctx as rc
from vcf_tpu.ops.pallas import rans_decode as rd
from vcf_tpu.ops.pallas import rans_encode as re_

G, SG, L = 4, 8, 12


@pytest.fixture(scope="module")
def grouped_setup():
    rng = np.random.default_rng(11)
    syms = jnp.asarray(rng.integers(0, 256, (G * SG, L), np.uint8))
    counts = rng.integers(1, 1000, (256,))
    fr = np.stack([
        rans_mod.quantize_freqs(np.roll(counts, i), min_all=True)
        for i in range(G)
    ]).astype(np.uint32)
    cu = np.concatenate(
        [np.zeros((G, 1), np.uint32),
         np.cumsum(fr, 1)[:, :255]], 1).astype(np.uint32)
    return syms, jnp.asarray(fr), jnp.asarray(cu)


class TestU8EncodeVariants:
    def test_raw_u8_matches_packed_raw(self, grouped_setup):
        syms, fj, cj = grouped_setup
        a = re_.pallas_encode_grouped_raw(syms, fj, cj, unroll=4, sg=SG,
                                          interpret=True)
        b = re_.pallas_encode_grouped_raw_u8(syms, fj, cj, unroll=4,
                                             sg=SG, interpret=True)
        c = re_.pallas_encode_grouped_raw_u8(
            jnp.asarray(np.asarray(syms).T), fj, cj, unroll=4, sg=SG,
            interpret=True, lmajor=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(a, c):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_compact_u8_matches_compact(self, grouped_setup):
        syms, fj, cj = grouped_setup
        a = re_.pallas_encode_grouped(syms, fj, cj, unroll=4, sg=SG,
                                      interpret=True)
        b = re_.pallas_encode_grouped_u8(syms, fj, cj, unroll=4, sg=SG,
                                         interpret=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_compact_rows_assemble_equal_raw_finish(self, grouped_setup):
        syms, fj, cj = grouped_setup
        rows, counts, _ = re_.pallas_encode_grouped(
            syms, fj, cj, unroll=4, sg=SG, interpret=True)
        w1, n1 = re_.assemble_stream(rows, counts)
        le, _ = re_.pallas_encode_grouped_raw(syms, fj, cj, unroll=4,
                                              sg=SG, interpret=True)
        w2, n2, _ = re_.finish_stream(le)
        np.testing.assert_array_equal(
            np.asarray(w1[: int(n1)]), np.asarray(w2[: int(n2)]))

    def test_ctx_u8_matches_packed_ctx(self):
        rng = np.random.default_rng(12)
        syms = jnp.asarray(
            (128 + rng.normal(0, 30, (G * SG, L))).clip(0, 255)
            .astype(np.uint8))
        counts = np.asarray(rans_mod.ctx_group_histograms(syms, G))
        fgc, cgc = rans_mod.ctx_freqs_from_counts(counts)
        fj, cj = jnp.asarray(fgc), jnp.asarray(cgc)
        a = rc.pallas_encode_ctx_raw(syms, fj, cj, unroll=4, sg=SG,
                                     interpret=True)
        b = rc.pallas_encode_ctx_raw_u8(syms, fj, cj, unroll=4, sg=SG,
                                        interpret=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestLmajorDecodeVariants:
    def test_grid_lmajor_is_transpose_of_packed(self, grouped_setup):
        syms, fj, cj = grouped_setup
        le, st = re_.pallas_encode_grouped_raw(syms, fj, cj, unroll=4,
                                               sg=SG, interpret=True)
        a = rd.pallas_decode_grouped_grid(le, st, fj, cj, L, unroll=4,
                                          sg=SG, interpret=True)
        b = rd.pallas_decode_grouped_grid(le, st, fj, cj, L, unroll=4,
                                          sg=SG, interpret=True,
                                          lmajor=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(syms))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a).T)

    def test_windowed_lmajor_roundtrip(self, grouped_setup):
        syms, fj, cj = grouped_setup
        rows, counts, st = re_.pallas_encode_grouped(
            syms, fj, cj, unroll=4, sg=SG, interpret=True)
        w, nw = re_.assemble_stream(rows, counts)
        cap = SG * max(1, -(-int(np.asarray(counts).max()) // SG))
        wpad = jnp.concatenate(
            [w[: int(nw)], jnp.zeros((cap + G * SG + 16,), jnp.uint16)])
        win = rd.build_windows(
            wpad, jnp.asarray(np.asarray(counts, np.int32)), cap)
        a = rd.pallas_decode_grouped(win, st, fj, cj, L, cap, unroll=4,
                                     sg=SG, interpret=True)
        b = rd.pallas_decode_grouped(win, st, fj, cj, L, cap, unroll=4,
                                     sg=SG, interpret=True, lmajor=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(syms))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a).T)


class TestCompactionHelpers:
    def _run(self, body, vals, flags, tri, g, sg):
        def kern(v_ref, f_ref, t_ref, o_ref):
            o_ref[:, :] = body(v_ref[:], f_ref[:] != 0,
                               t_ref[:].astype(jnp.bfloat16))
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((g, sg), lambda: (0, 0)),
                      pl.BlockSpec((g, sg), lambda: (0, 0)),
                      pl.BlockSpec((sg, sg), lambda: (0, 0))],
            out_specs=pl.BlockSpec((g, sg), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((g, sg), jnp.int32),
            interpret=True,
        )(vals, flags, tri)

    @pytest.mark.parametrize("occ", [0.01, 0.5, 0.95])
    def test_packed_wide_matches_radix4(self, occ):
        g, sg = 64, 1024          # s = 65536: the wide range
        rng = np.random.default_rng(13)
        flags = jnp.asarray((rng.random((g, sg)) < occ).astype(np.int32))
        vals = jnp.asarray(rng.integers(0, 65536, (g, sg)).astype(np.int32))
        col = jnp.arange(sg, dtype=jnp.int32)
        tri = (col[:, None] <= col[None, :]).astype(jnp.float32)
        a = self._run(lambda v, f, t: re_._push_compact(v & 0xFFFF, f,
                                                        g, sg),
                      vals, flags, tri, g, sg)
        b = self._run(lambda v, f, t: re_._push_compact_packed_wide(
            v, f, g, sg, tri=t), vals, flags, tri, g, sg)
        n = int(np.asarray(flags).sum())
        np.testing.assert_array_equal(
            (np.asarray(a).reshape(-1) & 0xFFFF)[:n],
            (np.asarray(b).reshape(-1) & 0xFFFF)[:n])

    def test_matmul_rank_matches_roll_rank(self):
        g, sg = 64, 1024
        rng = np.random.default_rng(14)
        flags = jnp.asarray((rng.random((g, sg)) < 0.1).astype(np.int32))
        vals = jnp.zeros((g, sg), jnp.int32)
        col = jnp.arange(sg, dtype=jnp.int32)
        tri = (col[:, None] <= col[None, :]).astype(jnp.float32)
        a = self._run(lambda v, f, t: rd._flat_rank(f, g, sg),
                      vals, flags, tri, g, sg)
        b = self._run(lambda v, f, t: rd._flat_rank_mm(f, t, g, sg),
                      vals, flags, tri, g, sg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merged_fetch_table_values(grouped_setup):
    """The two-hot table's f32-accumulated fetch must reproduce the
    exact (f, cum) integers for every (group, symbol)."""
    _, fj, cj = grouped_setup
    tmh = np.asarray(re_.merged_fetch_table(fj, cj), np.float32)
    fr, cu = np.asarray(fj), np.asarray(cj)
    for gi in range(G):
        for sym in (0, 1, 17, 128, 200, 255):
            b = sym >> 4
            lo = sym & 15
            f = tmh[gi, b, lo] + tmh[gi, 16 + b, lo]
            c = tmh[gi, b, 16 + lo] + tmh[gi, 16 + b, 16 + lo]
            assert f == fr[gi, sym] and c == cu[gi, sym], (gi, sym)
