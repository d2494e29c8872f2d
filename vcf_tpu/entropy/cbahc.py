"""Context-Based Adaptive Huffman Codec (CBAHC).

Capability parity with src/CBAHC.py: order-N byte context model with
Laplace-smoothed counts (context window seeded with PAD = 256,
src/CBAHC.py:123-153, so the first `order` symbols are coded under
contexts distinct from any real byte context), and the Huffman code
rebuilt from the live context counts before *every* symbol
(src/CBAHC.py:184-201) with deterministic tie-breaking (:44-70).  Encoder and decoder rebuild
identical codes, so the stream carries only code bits; sidecar metadata
stores shape/order/bit-depth (parity with the
`{fn}_adaptive_huffman_tree.pkl.gz` sidecar, :206-216, minus the
pickle).

uint16 input is coded as two byte planes (low then high) sharing one
context stream per plane — a documented deviation from the reference,
which would rebuild a 65536-leaf tree per symbol.  Measured cost:
NEGATIVE — the reference's 65536-entry adaptive model starts past its
own rescale threshold (initial total 65536 > max_freq 16384) and never
adapts, rating ~15.3 bits/symbol on a LloydMax index plane where byte
planes rate 0.645x that (tests/test_reference_vectors.py::
TestUint16AlphabetDeviation, VERDICT r2 missing item 2).

The per-symbol loop runs in the native C++ runtime; a pure-Python
mirror is used when the native library is unavailable (slow; tests use
small arrays).
"""

from __future__ import annotations

import heapq
import struct
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Tuple

import numpy as np

from vcf_tpu.entropy.base import EntropyCodec
from vcf_tpu import native

# The reference seeds the context window with a PAD symbol outside the
# byte alphabet (src/CBAHC.py:123-153: PAD = 256, ctx_init = [PAD]*order),
# so the first `order` symbols are coded under contexts distinct from any
# real byte context.  We pack the window into an integer at 9 bits per
# slot so PAD is representable (VERDICT r2 missing item 1).
PAD = 256


def ctx_init(order: int) -> int:
    ctx = 0
    for _ in range(order):
        ctx = (ctx << 9) | PAD
    return ctx


def ctx_mask(order: int) -> int:
    return (1 << (9 * order)) - 1 if order else 0


# ---------------------------------------------------------------------------
# Pure-Python mirror of the native per-symbol adaptive loop.
# Must produce bit-identical streams to vcf_cbahc_encode/decode.
# ---------------------------------------------------------------------------

def _huffman_lengths_256(counts) -> np.ndarray:
    """Huffman code lengths with (freq, uid) tie-breaking: leaf uid =
    symbol value, internal uids in creation order (matches native)."""
    parent = {}
    heap = [(int(counts[s]), s) for s in range(256)]
    heapq.heapify(heap)
    uid = 256
    while len(heap) > 1:
        fa, a = heapq.heappop(heap)
        fb, b = heapq.heappop(heap)
        parent[a] = uid
        parent[b] = uid
        heapq.heappush(heap, (fa + fb, uid))
        uid += 1
    lengths = np.zeros(256, dtype=np.uint8)
    for s in range(256):
        d, n = 0, s
        while n in parent:
            n = parent[n]
            d += 1
        lengths[s] = d
    return lengths


def _canonical_codes_256(lengths: np.ndarray) -> np.ndarray:
    from vcf_tpu.entropy.huffman import canonical_codes

    return canonical_codes(lengths)


class _Contexts:
    def __init__(self, order: int):
        self.order = order
        self.mask = ctx_mask(order)
        self.models: Dict[int, np.ndarray] = {}

    def get(self, ctx: int) -> np.ndarray:
        m = self.models.get(ctx)
        if m is None:
            m = np.ones(256, dtype=np.uint32)
            self.models[ctx] = m
        return m


def _py_encode(data: np.ndarray, order: int) -> bytes:
    ctxs = _Contexts(order)
    bits = []
    ctx = ctx_init(order)
    for s in data.tolist():
        counts = ctxs.get(ctx)
        lengths = _huffman_lengths_256(counts)
        codes = _canonical_codes_256(lengths)
        ln = int(lengths[s])
        code = int(codes[s])
        bits.extend((code >> (ln - 1 - j)) & 1 for j in range(ln))
        counts[s] += 1
        if order:
            ctx = ((ctx << 9) | s) & ctxs.mask
    arr = np.array(bits, dtype=np.uint8)
    return np.packbits(arr).tobytes()


def _py_decode(payload: bytes, n_symbols: int, order: int) -> np.ndarray:
    ctxs = _Contexts(order)
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    bits = np.concatenate([bits, np.zeros(64, np.uint8)])
    out = np.empty(n_symbols, dtype=np.uint8)
    pos = 0
    ctx = ctx_init(order)
    for i in range(n_symbols):
        counts = ctxs.get(ctx)
        lengths = _huffman_lengths_256(counts)
        codes = _canonical_codes_256(lengths)
        # canonical walk
        by_len: Dict[int, Dict[int, int]] = {}
        for s in range(256):
            by_len.setdefault(int(lengths[s]), {})[int(codes[s])] = s
        code = 0
        ln = 0
        while True:
            code = (code << 1) | int(bits[pos])
            pos += 1
            ln += 1
            t = by_len.get(ln)
            if t is not None and code in t:
                s = t[code]
                break
        out[i] = s
        counts[s] += 1
        if order:
            ctx = ((ctx << 9) | s) & ctxs.mask
    return out


def _encode_stream(plane: np.ndarray, order: int) -> bytes:
    if native.available():
        return native.cbahc_encode(plane, order)
    return _py_encode(plane, order)


def _decode_stream(payload: bytes, n: int, order: int) -> np.ndarray:
    if native.available():
        return native.cbahc_decode(payload, n, order)
    return _py_decode(payload, n, order)


def tiled_encode(flat_u8: np.ndarray, order: int, tiles: int, enc_fn) -> bytes:
    """Independent per-tile adaptive streams (SURVEY §7.3 throughput
    path, shared by CBAHC/CBAAC): each tile re-learns its model so
    encode/decode parallelize across host threads at a small rate cost.
    Wire: <I n_tiles> then n_tiles <Q len> then the bodies."""
    if tiles <= 1:
        body = enc_fn(flat_u8, order)
        return struct.pack("<I", 1) + struct.pack("<Q", len(body)) + body
    n = flat_u8.size
    step = -(-n // tiles)
    parts = [flat_u8[i * step : (i + 1) * step] for i in range(tiles)]
    parts = [p for p in parts if p.size]
    with ThreadPoolExecutor(min(len(parts), 8)) as ex:
        bodies = list(ex.map(lambda p: enc_fn(p, order), parts))
    head = struct.pack("<I", len(bodies))
    head += b"".join(struct.pack("<Q", len(b)) for b in bodies)
    return head + b"".join(bodies)


def tiled_decode(blob: bytes, n: int, order: int, tiles: int, dec_fn) -> np.ndarray:
    (n_tiles,) = struct.unpack_from("<I", blob, 0)
    sizes = struct.unpack_from(f"<{n_tiles}Q", blob, 4)
    off = 4 + 8 * n_tiles
    step = -(-n // max(tiles, 1)) if n_tiles > 1 else n
    spans = []
    for t in range(n_tiles):
        cnt = min(step, n - t * step) if n_tiles > 1 else n
        spans.append((blob[off : off + sizes[t]], cnt))
        off += sizes[t]
    with ThreadPoolExecutor(min(n_tiles, 8)) as ex:
        parts = list(ex.map(lambda sp: dec_fn(sp[0], sp[1], order), spans))
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


class CBAHCCodec(EntropyCodec):
    file_extension = ".cbahc"

    def __init__(self, order: int = 1, tiles: int = 1):
        self.order = order
        self.tiles = max(1, tiles)

    @classmethod
    def from_config(cls, config=None):
        return cls(
            order=getattr(config, "context_order", 1),
            tiles=getattr(config, "context_tiles", 1),
        )

    def encode(self, arr: np.ndarray) -> Tuple[bytes, Dict[str, bytes]]:
        arr = self.check_dtype(arr)
        flat = arr.reshape(-1)
        nbits = 8 if arr.dtype == np.uint8 else 16
        if nbits == 8:
            payload = tiled_encode(flat, self.order, self.tiles, _encode_stream)
            split = len(payload)
        else:
            lo = tiled_encode((flat & 0xFF).astype(np.uint8), self.order,
                              self.tiles, _encode_stream)
            hi = tiled_encode((flat >> 8).astype(np.uint8), self.order,
                              self.tiles, _encode_stream)
            payload = lo + hi
            split = len(lo)
        # 0xFF sentinel + version byte (r5): the pre-tiles layout led
        # with nbits in {8, 16}, so 0xFF is unambiguous and v1 streams
        # keep decoding (docs/FORMATS.md)
        meta = b"\xff" + struct.pack(
            f"<BBBBIB{arr.ndim}I",
            2, nbits, self.order, self.tiles, split, arr.ndim, *arr.shape
        )
        return payload, {"adaptive_huffman_tree": meta}

    def decode(self, payload: bytes, side: Dict[str, bytes]) -> np.ndarray:
        blob = side["adaptive_huffman_tree"]
        if blob[0] == 0xFF:    # v2: tiled framing, tiles byte in header
            ver, nbits, order, tiles, split, ndim = struct.unpack_from(
                "<BBBBIB", blob, 1)
            shape = struct.unpack_from(f"<{ndim}I", blob, 10)
            n = int(np.prod(shape))
            if nbits == 8:
                out = tiled_decode(payload, n, order, tiles,
                                   _decode_stream).astype(np.uint8)
            else:
                lo = tiled_decode(payload[:split], n, order, tiles,
                                  _decode_stream).astype(np.uint16)
                hi = tiled_decode(payload[split:], n, order, tiles,
                                  _decode_stream).astype(np.uint16)
                out = (hi << 8) | lo
            return out.reshape(shape)
        # legacy (pre-r5): <BBIB> header, unframed per-plane streams
        nbits, order, split, ndim = struct.unpack_from("<BBIB", blob, 0)
        shape = struct.unpack_from(f"<{ndim}I", blob, 7)
        n = int(np.prod(shape))
        if nbits == 8:
            out = _decode_stream(payload, n, order).astype(np.uint8)
        else:
            lo = _decode_stream(payload[:split], n, order).astype(np.uint16)
            hi = _decode_stream(payload[split:], n, order).astype(np.uint16)
            out = (hi << 8) | lo
        return out.reshape(shape)
