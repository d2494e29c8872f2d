"""Interleaved rANS — entropy coding fully on device, gather-free.

The reference's adaptive arithmetic coder (src/CBAAC.py) is inherently
serial; SURVEY §7.3 prescribes many independent streams for TPU
throughput.  This module implements *interleaved range asymmetric
numeral systems* (Duda's rANS with Giesen's interleaving): S streams
share ONE word stream, because the decoder's renormalization schedule
is state-driven — at each step the renormalizing streams consume the
next words **in stream order**, so the device can fetch one contiguous
chunk per step (`dynamic_slice`) and route it to the renormalizing
lanes with a butterfly network (log2 S stages of shift+select).  No
gathers, no scatters, no sorts — the exact op set that runs at line
rate on this backend (docs/PERF_NOTES.md).

Encoder: processes symbols in reverse (standard rANS), emitting words
in reverse consumption order (reverse step, reverse stream rank) with a
butterfly *compaction* per step; the buffer is flipped once at the end.
Per-symbol (freq, cumfreq) come from an equality-reduce table lookup
outside the scan; the decoder inverts slot->symbol with a 256-wide
monotone count (sum of slot >= cum_v), also gather-free.

Static order-0 model: per-plane quantized frequencies (sum = 2^K_PROB),
stored zlib-compressed in the sidecar.  Rate is within ~0.1% of the
adaptive coder on stationary data and strictly better than Huffman.

NumPy reference implementations (`np_*`) define the format; the JAX
paths are tested bit-identical against them.
"""

from __future__ import annotations

import functools
import struct
import zlib
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

K_PROB = 12                 # probability resolution (sum freqs = 2^12)
RANS_L = 1 << 16            # lower bound of the normalized interval
MASK = (1 << K_PROB) - 1


# ---------------------------------------------------------------------------
# Probability quantization
# ---------------------------------------------------------------------------

def quantize_freqs(counts: np.ndarray, k: int = K_PROB,
                   min_all: bool = False) -> np.ndarray:
    """Quantize counts to integer freqs >= 1 (for present symbols) that
    sum to exactly 2^k.  Deterministic.

    min_all=True gives EVERY symbol freq >= 1 even when its count is 0 —
    required whenever the model is trained on a sample (e.g. one frame
    of a batch) rather than the exact data it will code: a zero-freq
    symbol encountered at encode time corrupts the stream silently.
    Rate cost: <= 256 parts in 2^k (~0.1% at k=12)."""
    total = 1 << k
    counts = counts.astype(np.float64)
    n_syms = counts.shape[0]
    if counts.sum() == 0:
        # all-zero counts (e.g. empty training sample): intentional
        # uniform model rather than a 0/0 division below
        counts[:] = 1.0
    present = np.ones(n_syms, bool) if min_all else counts > 0
    f = np.zeros(n_syms, np.int64)
    scaled = counts / counts.sum() * total
    f[present] = np.maximum(1, np.round(scaled[present]).astype(np.int64))
    # repair the sum by walking the largest entries (deterministic order)
    diff = total - int(f.sum())
    order = np.argsort(-f, kind="stable")
    i = 0
    while diff != 0:
        s = order[i % n_syms]
        if f[s] > 1 or diff > 0:
            step = 1 if diff > 0 else -1
            if f[s] + step >= 1:
                f[s] += step
                diff -= step
        i += 1
    return f.astype(np.uint32)


# ---------------------------------------------------------------------------
# NumPy reference: interleaved multi-stream rANS
# ---------------------------------------------------------------------------

def np_encode(syms: np.ndarray, freqs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """syms (S, L) -> (words uint16 (N,), final_states uint32 (S,)).

    Words are in decoder consumption order (forward)."""
    s_streams, l = syms.shape
    cum = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.uint64)
    f64 = freqs.astype(np.uint64)
    x = np.full(s_streams, RANS_L, np.uint64)
    emitted: List[int] = []  # reverse order
    x_max_mul = (RANS_L << 16) >> K_PROB  # (b*L) >> k
    for t in range(l - 1, -1, -1):
        for s in range(s_streams - 1, -1, -1):
            v = int(syms[s, t])
            f = int(f64[v])
            if x[s] >= f * x_max_mul:
                emitted.append(int(x[s] & 0xFFFF))
                x[s] >>= 16
            x[s] = ((x[s] // f) << K_PROB) + (x[s] % f) + int(cum[v])
    words = np.array(emitted[::-1], np.uint16)
    return words, x.astype(np.uint32)


def np_decode(words: np.ndarray, states: np.ndarray, freqs: np.ndarray,
              s_streams: int, l: int) -> np.ndarray:
    cum = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.int64)
    slot2sym = np.zeros(1 << K_PROB, np.int64)
    for v in range(256):
        slot2sym[cum[v] : cum[v] + int(freqs[v])] = v
    x = states.astype(np.uint64).copy()
    out = np.zeros((s_streams, l), np.uint8)
    ptr = 0
    for t in range(l):
        for s in range(s_streams):
            slot = int(x[s]) & MASK
            v = int(slot2sym[slot])
            out[s, t] = v
            x[s] = int(freqs[v]) * (int(x[s]) >> K_PROB) + slot - int(cum[v])
            if x[s] < RANS_L:
                x[s] = (x[s] << 16) | int(words[ptr])
                ptr += 1
    return out


# ---------------------------------------------------------------------------
# Butterfly routing (gather/scatter-free monotone routing)
# ---------------------------------------------------------------------------

def _shift_right(arr, step, fill=0):
    """arr shifted right by `step` along axis 0 (zeros in front)."""
    pad = jnp.full((step,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([pad, arr[:-step]], axis=0)


def butterfly_expand(chunk: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """out[i] = chunk[rank_i] where flagged (rank = exclusive prefix
    count of flags); zeros elsewhere.

    Monotone expansion: chunk element j must move right from position j
    to the j-th flagged index.  Destinations are strictly increasing, so
    routing the shift bits MSB-first through log2(S) stages of
    shift+select is collision-free (verified exhaustively in
    tests/test_rans.py).  The destination indices themselves come from
    compacting `arange` over the flags — also gather-free."""
    s = flags.shape[0]
    c = jnp.sum(flags.astype(jnp.int32))
    idx = jnp.arange(s, dtype=jnp.int32)
    active = idx < c
    # position of the j-th flag, packed to the front
    sel = butterfly_compact(idx, flags)
    shift = jnp.where(active, sel - idx, 0)
    val = chunk.astype(jnp.uint32)
    n_stages = max(int(np.ceil(np.log2(max(s, 2)))), 1)
    for kbit in range(n_stages - 1, -1, -1):
        step = 1 << kbit
        move = active & ((shift & step) != 0)
        val_in = _shift_right(val, step)
        act_in = _shift_right(move, step, fill=False)
        shift_in = _shift_right(shift, step)
        stay = active & ~move
        val = jnp.where(act_in, val_in, val)
        shift = jnp.where(act_in, shift_in - step, shift)
        active = act_in | stay
    return jnp.where(flags, val, 0)


def butterfly_compact(vals: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Pack flagged values to the front (stable): out[rank_i] = vals[i].

    Monotone left-compaction routed LSB-first (collision-free)."""
    s = flags.shape[0]
    ranks = jnp.cumsum(flags.astype(jnp.int32)) - flags.astype(jnp.int32)
    idx = jnp.arange(s, dtype=jnp.int32)
    shift = jnp.where(flags, idx - ranks, 0)
    val = vals
    active = flags
    n_stages = max(int(np.ceil(np.log2(max(s, 2)))), 1)
    for kbit in range(n_stages):
        step = 1 << kbit
        move = active & ((shift & step) != 0)
        # element at i moves to i - step
        val_in = jnp.concatenate([val[step:], val[:step]], axis=0)
        move_in = jnp.concatenate([move[step:], jnp.zeros(step, bool)], axis=0)
        shift_in = jnp.concatenate([shift[step:], shift[:step]], axis=0)
        stay = active & ~move
        val = jnp.where(move_in, val_in, val)
        shift = jnp.where(move_in, shift_in - step, shift)
        active = move_in | stay
    return val


# ---------------------------------------------------------------------------
# JAX vectorized encode/decode (bit-identical to the NumPy reference)
# ---------------------------------------------------------------------------

_SHIFT_EMIT = 32 - K_PROB  # x >= f * 2^_SHIFT_EMIT <=> (x >> _SHIFT_EMIT) >= f


@jax.jit
def jax_encode(syms: jnp.ndarray, freqs: jnp.ndarray, cums: jnp.ndarray):
    """syms (S, L) uint8 -> (words (S*L,) uint16 with the valid words as
    a PREFIX in decoder consumption order, n_words, states (S,) u32).

    Two-phase: the sequential scan only advances the states and records
    the (low16, emit) grids as scan outputs (~15 cheap vector ops per
    step); ONE global monotone compaction then packs the flagged words.
    This moves the routing work out of the latency-bound scan into a
    single bandwidth-bound pass (measured ~2x encode on the v5e vs a
    per-step butterfly + dynamic_update_slice).

    Order: the scan consumes symbols in reverse step order, so the
    recorded grids flipped on the step axis are exactly (t asc, s asc)
    — the decoder's consumption order (np_encode emits t desc, s desc
    and flips once at the end)."""
    s_streams, l = syms.shape
    from vcf_tpu.entropy.interleaved import lookup_tables256

    tabs = jnp.stack([freqs.astype(jnp.int32), cums.astype(jnp.int32)], axis=1)
    fc = lookup_tables256(syms, tabs)                 # (S, L, 2) via MXU
    f_arr = fc[..., 0].astype(jnp.uint32)             # (S, L)
    c_arr = fc[..., 1].astype(jnp.uint32)

    def step(x, inp):
        f, cum = inp                      # (S,) each, uint32
        emit = (x >> _SHIFT_EMIT) >= f
        low16 = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        x = jnp.where(emit, x >> 16, x)
        x = ((x // f) << K_PROB) + (x % f) + cum
        return x, (low16, emit)

    x0 = jnp.full((s_streams,), RANS_L, jnp.uint32)
    x, (lows, emits) = jax.lax.scan(
        step, x0, (f_arr.T[::-1], c_arr.T[::-1]),  # reversed symbol order
    )
    vals = lows[::-1].reshape(-1)                     # (l*S,) (t asc, s asc)
    mask = emits[::-1].reshape(-1)
    words = butterfly_compact(vals, mask)
    n_words = jnp.sum(mask.astype(jnp.int32))
    return words, n_words, x


@functools.partial(jax.jit, static_argnames=("l",))
def jax_decode(words_padded: jnp.ndarray, start: jnp.ndarray,
               states: jnp.ndarray, freqs: jnp.ndarray, cums: jnp.ndarray,
               l: int):
    """words_padded: (cap,) uint16 with valid words at [start, ...).
    Returns decoded symbols (S, l) uint8.

    The slot->symbol inversion feeds the monotone `slot >= cum`
    comparison matrix STRAIGHT into one (S, 256) @ (256, 3) MXU matmul
    against the first-difference table D[v] = tab[v] - tab[v-1]: the
    row of `ge` is a prefix of ones ending at the wanted symbol, so the
    product telescopes to tab[sym] — no one-hot construction at all.
    (Measured: one big MXU op beats three one-hot sum-reductions 5-6x;
    a "cleverer" two-level 16x16 range search with small matmuls is 6x
    SLOWER again — many small latency-bound ops lose on this backend.)
    Partial sums stay < 2^21, exact in f32 under Precision.HIGHEST."""
    s_streams = states.shape[0]
    c_f = cums.astype(jnp.float32)        # (256,)
    tab = jnp.stack(
        [jnp.arange(256, dtype=jnp.float32),
         freqs.astype(jnp.float32), c_f], axis=1)       # (256, 3)
    d_tab = tab - jnp.concatenate([jnp.zeros((1, 3), jnp.float32), tab[:-1]])

    def step(carry, _):
        x, ptr = carry
        slot = x & jnp.uint32(MASK)
        slot_f = slot.astype(jnp.float32)
        ge = slot_f[:, None] >= c_f[None, :]            # (S, 256) prefix rows
        fetched = jnp.dot(ge.astype(jnp.float32), d_tab,
                          precision=jax.lax.Precision.HIGHEST)
        sym = fetched[:, 0].astype(jnp.uint32)
        f = fetched[:, 1].astype(jnp.uint32)
        cum = fetched[:, 2].astype(jnp.uint32)
        x = f * (x >> K_PROB) + slot - cum
        renorm = x < jnp.uint32(RANS_L)
        chunk = jax.lax.dynamic_slice(words_padded, (ptr,), (s_streams,))
        routed = butterfly_expand(chunk.astype(jnp.uint32), renorm)
        x = jnp.where(renorm, (x << 16) | routed, x)
        ptr = ptr + jnp.sum(renorm.astype(jnp.int32))
        return (x, ptr), sym.astype(jnp.uint8)

    (x, ptr), out = jax.lax.scan(
        step, (states.astype(jnp.uint32), start.astype(jnp.int32)), None,
        length=l,
    )
    return out.T  # (S, l)


@functools.partial(jax.jit, static_argnames=("cap", "s_flags", "s_nz"))
def jax_sparse_encode(flat, zero_sym, fill_sym, flag_f, flag_c, nz_f, nz_c,
                      cap: int, s_flags: int, s_nz: int):
    """Fully-device sparse encode of a flat uint8 symbol stream.

    Splits `flat` (n,) into a zero-flag bitplane (packed to bytes) and a
    compacted nonzero prefix (padded to the static `cap` with
    `fill_sym`), then codes both with the interleaved device rANS —
    everything in one XLA program, no host round trip.  Requires
    n % (8 * s_flags) == 0 and cap % s_nz == 0; n_nz must be <= cap
    (checked by the caller from the returned n_nz).

    Returns (flag_words, flag_nw, flag_states,
             nz_words, nz_nw, nz_states, n_nz)."""
    n = flat.shape[0]
    flags = flat != zero_sym
    flag_bytes = pack_flags(flags)                      # (n/8,)
    nz_all = butterfly_compact(flat, flags)             # (n,) prefix = nonzeros
    n_nz = jnp.sum(flags.astype(jnp.int32))
    nz = jnp.where(jnp.arange(cap) < n_nz, nz_all[:cap],
                   fill_sym.astype(flat.dtype))
    fw, fnw, fst = jax_encode(
        flag_bytes.reshape(-1, s_flags).T, flag_f, flag_c)
    zw, znw, zst = jax_encode(nz.reshape(-1, s_nz).T, nz_f, nz_c)
    return fw, fnw, fst, zw, znw, zst, n_nz


@functools.partial(
    jax.jit, static_argnames=("n", "cap", "l_flags", "l_nz"))
def jax_sparse_decode(flag_words_padded, flag_states, nz_words_padded,
                      nz_states, zero_sym, flag_f, flag_c, nz_f, nz_c,
                      n: int, cap: int, l_flags: int, l_nz: int):
    """Inverse of jax_sparse_encode: -> flat (n,) uint8, on device."""
    fb = jax_decode(flag_words_padded, jnp.int32(0), flag_states,
                    flag_f, flag_c, l_flags)
    flags = unpack_flags(fb.T.reshape(-1))              # (n,)
    nz = jax_decode(nz_words_padded, jnp.int32(0), nz_states,
                    nz_f, nz_c, l_nz).T.reshape(-1)     # (cap,)
    nz_full = jnp.concatenate(
        [nz.astype(jnp.uint32), jnp.zeros((n - cap,), jnp.uint32)])
    routed = butterfly_expand(nz_full, flags)
    return jnp.where(flags, routed.astype(jnp.uint8),
                     zero_sym.astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Entropy-codec wrapper
# ---------------------------------------------------------------------------

from vcf_tpu.entropy.base import EntropyCodec


class RANSCodec(EntropyCodec):
    """Interleaved static rANS; encode and decode both run on device."""

    file_extension = ".rans"

    def __init__(self, n_streams: int = 65536):
        self.n_streams = n_streams

    @classmethod
    def from_config(cls, config=None):
        return cls()

    @staticmethod
    def _pick_streams(n: int, requested: int) -> int:
        """Largest power of two with >= ~512 symbols per stream, capped
        at `requested`.  More streams = shorter scan = higher device
        throughput (v5e: 1k->64k streams is ~2x encode, see
        docs/PERF_NOTES.md); ~512 symbols/stream keeps the 4-byte
        final-state sidecar under ~0.07 bits/symbol."""
        target = min(requested, max(8, n // 512))
        return 1 << max(3, int(np.floor(np.log2(target))))

    def _encode_u8(self, flat: np.ndarray) -> Tuple[bytes, bytes]:
        n = flat.size
        s_streams = self._pick_streams(n, self.n_streams)
        l = -(-n // s_streams)
        padded = np.pad(flat, (0, s_streams * l - n))
        syms = padded.reshape(l, s_streams).T
        counts = np.bincount(padded, minlength=256)
        freqs = quantize_freqs(counts)
        cums = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.uint32)
        words, n_words, states = jax_encode(
            jnp.asarray(syms), jnp.asarray(freqs.astype(np.uint32)),
            jnp.asarray(cums),
        )
        n_words = int(n_words)
        words_np = np.asarray(words[:n_words])
        payload = words_np.tobytes()
        side = struct.pack("<IIQI", s_streams, l, n, n_words)
        side += np.asarray(states).astype("<u4").tobytes()
        side += zlib.compress(freqs.astype("<u2").tobytes(), 9)
        return payload, side

    def _decode_u8(self, payload: bytes, blob: bytes) -> np.ndarray:
        s_streams, l, n, n_words = struct.unpack_from("<IIQI", blob, 0)
        off = 20
        states = np.frombuffer(blob, "<u4", s_streams, off).astype(np.uint32)
        off += 4 * s_streams
        freqs = np.frombuffer(zlib.decompress(blob[off:]), "<u2").astype(np.uint32)
        cums = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.uint32)
        words = np.frombuffer(payload, "<u2", n_words).astype(np.uint16)
        # pad so every dynamic_slice window is in range
        words_padded = np.concatenate([words, np.zeros(s_streams + 16, np.uint16)])
        syms = jax_decode(
            jnp.asarray(words_padded), jnp.int32(0),
            jnp.asarray(states), jnp.asarray(freqs), jnp.asarray(cums), l,
        )
        flat = np.asarray(syms).T.reshape(-1)
        return flat[:n]

    def encode(self, arr: np.ndarray) -> Tuple[bytes, Dict[str, bytes]]:
        arr = self.check_dtype(arr)
        if arr.dtype != np.uint8:
            flat = arr.reshape(-1)
            lo, s1 = self._encode_u8((flat & 0xFF).astype(np.uint8))
            hi, s2 = self._encode_u8((flat >> 8).astype(np.uint8))
            head = struct.pack(f"<BIIB{arr.ndim}I", 1, len(lo), len(s1),
                               arr.ndim, *arr.shape)
            return lo + hi, {"rans_model": head + s1 + s2}
        payload, side = self._encode_u8(arr.reshape(-1))
        head = struct.pack(f"<BIIB{arr.ndim}I", 0, len(payload), len(side),
                           arr.ndim, *arr.shape)
        return payload, {"rans_model": head + side}

    def decode(self, payload: bytes, side: Dict[str, bytes]) -> np.ndarray:
        blob = side["rans_model"]
        mode, split, s1_len, ndim = struct.unpack_from("<BIIB", blob, 0)
        shape = struct.unpack_from(f"<{ndim}I", blob, 10)
        body = blob[10 + 4 * ndim :]
        if mode == 0:
            out = self._decode_u8(payload, body)
            return out.reshape(shape)
        lo = self._decode_u8(payload[:split], body[:s1_len])
        hi = self._decode_u8(payload[split:], body[s1_len:])
        return ((hi.astype(np.uint16) << 8) | lo).reshape(shape)


# ---------------------------------------------------------------------------
# Sparse rANS: zero-flag bitplane + compacted nonzeros
# ---------------------------------------------------------------------------

_BIT_W = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.int32)  # np.packbits order


@jax.jit
def pack_flags(flags: jnp.ndarray) -> jnp.ndarray:
    """(8m,) bool -> (m,) uint8, bit order identical to np.packbits."""
    b = flags.reshape(-1, 8).astype(jnp.int32)
    return jnp.sum(b * jnp.asarray(_BIT_W)[None, :], axis=1).astype(jnp.uint8)


@jax.jit
def unpack_flags(packed: jnp.ndarray) -> jnp.ndarray:
    """(m,) uint8 -> (8m,) bool, inverse of pack_flags."""
    p = packed.astype(jnp.int32)
    bits = (p[:, None] >> jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0])[None, :]) & 1
    return bits.reshape(-1).astype(bool)


class SparseRANSCodec(EntropyCodec):
    """Sparse interleaved rANS — designed for quantized transform planes
    where one symbol (the quantizer's zero) dominates (90-97% of a
    deadzone-quantized DCT plane at the default QSS).

    Instead of feeding every symbol through the sequential rANS scan,
    the plane is split into (a) a zero-flag bitplane, packed 8 flags to
    the byte (pure elementwise), and (b) the nonzero symbols compacted
    to a dense prefix with ONE global monotone butterfly pass
    (bandwidth-bound).  Both byte streams are then coded with the
    interleaved device rANS.  On 97%-sparse 1080p DCT planes this is
    ~6x fewer sequential-scan symbols AND ~20% better rate than dense
    order-0 rANS (the flag bytes capture 8-neighbor correlation the
    order-0 model cannot).

    The nonzero count is data-dependent; the prefix is padded up to a
    bucket (multiples of n/32) so XLA sees a small, reusable set of
    static shapes.  Padding symbols are the most frequent nonzero, so
    they cost ~H_min bits each; the bucket rounding costs < 0.07 bpp
    worst-case and ~0 when the plane is very sparse.

    Replaces functionally: the reference's entropy stage for quantized
    planes (src/Huffman.py, src/CBAAC.py roles); the sparsity split is
    a TPU-native design, not a reference translation (SURVEY §7.3
    "sequential entropy coders on a parallel machine")."""

    file_extension = ".srans"

    def __init__(self, n_streams: int = 65536):
        self.dense = RANSCodec(n_streams)

    @classmethod
    def from_config(cls, config=None):
        return cls()

    @staticmethod
    def _bucket(n_nz: int, n: int) -> int:
        """Round n_nz up to a multiple of n/32 (>= 4096) so the padded
        nonzero stream has one of <= 32 static shapes per plane size."""
        step = max(4096, n // 32)
        return min(n, max(step, -(-n_nz // step) * step))

    def _encode_u8(self, flat: np.ndarray) -> Tuple[bytes, bytes]:
        n = flat.size
        pad8 = (-n) % 8
        padded = np.pad(flat, (0, pad8))
        counts = np.bincount(padded, minlength=256)
        zero_sym = int(np.argmax(counts))
        fj = jnp.asarray(padded)
        flags = fj != np.uint8(zero_sym)
        if pad8:
            flags = flags & (jnp.arange(padded.size) < n)
        flag_bytes = np.asarray(pack_flags(flags))
        nz_all = butterfly_compact(fj, flags)
        n_nz = int(jnp.sum(flags.astype(jnp.int32)))
        cap = self._bucket(max(n_nz, 1), padded.size)
        nz = np.array(nz_all[:cap])  # writable host copy
        if n_nz < cap:
            # pad with the most frequent nonzero symbol (cheapest bits)
            nz_counts = np.bincount(nz[:n_nz], minlength=256)
            fill = int(np.argmax(nz_counts)) if nz_counts.any() else 0
            nz[n_nz:] = fill
        p_flags, s_flags = self.dense._encode_u8(flag_bytes)
        p_nz, s_nz = self.dense._encode_u8(nz)
        head = struct.pack(
            "<QQIBII", n, n_nz, cap, zero_sym, len(p_flags), len(s_flags)
        )
        return p_flags + p_nz, head + s_flags + s_nz

    def _decode_u8(self, payload: bytes, blob: bytes) -> np.ndarray:
        n, n_nz, cap, zero_sym, pf_len, sf_len = struct.unpack_from(
            "<QQIBII", blob, 0
        )
        off = 8 + 8 + 4 + 1 + 4 + 4
        flag_bytes = self.dense._decode_u8(payload[:pf_len], blob[off:off + sf_len])
        nz = self.dense._decode_u8(payload[pf_len:], blob[off + sf_len:])
        flags = unpack_flags(jnp.asarray(flag_bytes))
        nz_full = jnp.asarray(
            np.pad(nz, (0, flags.shape[0] - cap)).astype(np.uint32)
        )
        routed = butterfly_expand(nz_full, flags)
        out = jnp.where(flags, routed.astype(jnp.uint8), np.uint8(zero_sym))
        return np.asarray(out)[:n]

    def encode(self, arr: np.ndarray) -> Tuple[bytes, Dict[str, bytes]]:
        arr = self.check_dtype(arr)
        if arr.dtype != np.uint8:
            flat = arr.reshape(-1)
            lo, s1 = self._encode_u8((flat & 0xFF).astype(np.uint8))
            hi, s2 = self._encode_u8((flat >> 8).astype(np.uint8))
            head = struct.pack(f"<BIIB{arr.ndim}I", 1, len(lo), len(s1),
                               arr.ndim, *arr.shape)
            return lo + hi, {"srans_model": head + s1 + s2}
        payload, side = self._encode_u8(arr.reshape(-1))
        head = struct.pack(f"<BIIB{arr.ndim}I", 0, len(payload), len(side),
                           arr.ndim, *arr.shape)
        return payload, {"srans_model": head + side}

    def decode(self, payload: bytes, side: Dict[str, bytes]) -> np.ndarray:
        blob = side["srans_model"]
        mode, split, s1_len, ndim = struct.unpack_from("<BIIB", blob, 0)
        shape = struct.unpack_from(f"<{ndim}I", blob, 10)
        body = blob[10 + 4 * ndim :]
        if mode == 0:
            return self._decode_u8(payload, body).reshape(shape)
        lo = self._decode_u8(payload[:split], body[:s1_len])
        hi = self._decode_u8(payload[split:], body[s1_len:])
        return ((hi.astype(np.uint16) << 8) | lo).reshape(shape)
