"""Static canonical Huffman entropy codec.

Capability parity with src/Huffman.py (external `huffman_coding` +
bitarray in the reference): flatten the index array, build a Huffman
code from symbol frequencies, emit a bitstream; the code table and the
array shape ride as side information (the reference pickles the tree to
`{fn}_huffman_tree.pkl.gz`, src/Huffman.py:48-50).

TPU-era design instead of a pickled tree: *canonical* Huffman — the
sidecar stores only the per-symbol code lengths (zlib-compressed), from
which encoder and decoder rebuild identical codes.  Encoding is
vectorized NumPy (scatter code bits into a bit plane, then packbits);
decoding uses the native C++ runtime when available and a table-driven
Python fallback otherwise.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, Tuple

import heapq

import numpy as np

from vcf_tpu.entropy.base import EntropyCodec
from vcf_tpu import native

MAX_CODE_LEN = 31


def code_lengths_from_counts(counts: np.ndarray) -> np.ndarray:
    """Huffman code lengths for each symbol (0 for unused symbols).

    Deterministic: heap ties broken by insertion order (uid), like the
    reference's tie-breaking discipline (src/CBAHC.py:44-70).
    """
    symbols = np.nonzero(counts)[0]
    if symbols.size == 0:
        return np.zeros_like(counts, dtype=np.uint8)
    lengths = np.zeros(counts.shape[0], dtype=np.uint8)
    if symbols.size == 1:
        lengths[symbols[0]] = 1
        return lengths
    heap = []
    uid = 0
    for s in symbols:
        heap.append((int(counts[s]), uid, [int(s)]))
        uid += 1
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, _, leaves1 = heapq.heappop(heap)
        f2, _, leaves2 = heapq.heappop(heap)
        for s in leaves1:
            lengths[s] += 1
        for s in leaves2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, leaves1 + leaves2))
        uid += 1
    if lengths.max() > MAX_CODE_LEN:
        raise ValueError("Huffman code length exceeds 31 bits")
    return lengths


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Assign canonical codes: shorter codes first, ties by symbol value."""
    codes = np.zeros(lengths.shape[0], dtype=np.uint64)
    used = np.nonzero(lengths)[0]
    if used.size == 0:
        return codes
    order = np.lexsort((used, lengths[used]))
    seq = used[order]
    code = 0
    prev_len = int(lengths[seq[0]])
    for s in seq:
        ln = int(lengths[s])
        code <<= ln - prev_len
        codes[s] = code
        code += 1
        prev_len = ln
    return codes


def pack_codes(data: np.ndarray, codes: np.ndarray, lengths: np.ndarray) -> Tuple[bytes, int]:
    """Vectorized bitstream packing.  Returns (bytes, total_bits)."""
    sym_len = lengths[data].astype(np.int64)
    sym_code = codes[data]
    offsets = np.concatenate(([0], np.cumsum(sym_len)))
    total_bits = int(offsets[-1])
    bits = np.zeros((total_bits + 7) // 8 * 8, dtype=np.uint8)
    max_len = int(sym_len.max()) if sym_len.size else 0
    for j in range(max_len):
        mask = sym_len > j
        pos = offsets[:-1][mask] + j
        shift = (sym_len[mask] - 1 - j).astype(np.uint64)
        bits[pos] = ((sym_code[mask] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes(), total_bits


def unpack_codes(
    payload: bytes, n_symbols: int, lengths: np.ndarray
) -> np.ndarray:
    """Table-driven decode (Python fallback).  Returns int64 symbols."""
    codes = canonical_codes(lengths)
    max_len = int(lengths.max())
    # decode table over max_len-bit windows
    table_sym = np.zeros(1 << max_len, dtype=np.int64)
    table_len = np.zeros(1 << max_len, dtype=np.uint8)
    for s in np.nonzero(lengths)[0]:
        ln = int(lengths[s])
        prefix = int(codes[s]) << (max_len - ln)
        span = 1 << (max_len - ln)
        table_sym[prefix : prefix + span] = s
        table_len[prefix : prefix + span] = ln
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    # append guard bits so the final window read never overruns
    bits = np.concatenate([bits, np.zeros(max_len, np.uint8)])
    weights = (1 << np.arange(max_len - 1, -1, -1)).astype(np.int64)
    out = np.empty(n_symbols, dtype=np.int64)
    pos = 0
    for i in range(n_symbols):
        window = int(bits[pos : pos + max_len] @ weights)
        out[i] = table_sym[window]
        pos += int(table_len[window])
    return out


class HuffmanCodec(EntropyCodec):
    file_extension = ".huf"

    def encode(self, arr: np.ndarray) -> Tuple[bytes, Dict[str, bytes]]:
        arr = self.check_dtype(arr)
        n_values = 256 if arr.dtype == np.uint8 else 65536
        flat = arr.reshape(-1)
        counts = np.bincount(flat, minlength=n_values)
        lengths = code_lengths_from_counts(counts)
        if native.available():
            codes = canonical_codes(lengths)
            payload = native.huffman_encode(flat, codes, lengths)
        else:
            codes = canonical_codes(lengths)
            payload, _ = pack_codes(flat, codes, lengths)
        # side info: dtype code, ndim, shape, then zlib'd code lengths
        header = struct.pack(
            f"<BB{arr.ndim}I", 0 if arr.dtype == np.uint8 else 1, arr.ndim, *arr.shape
        )
        side = {"huffman_tree": header + zlib.compress(lengths.tobytes(), 9)}
        return payload, side

    def decode(self, payload: bytes, side: Dict[str, bytes]) -> np.ndarray:
        blob = side["huffman_tree"]
        dtype_code, ndim = struct.unpack_from("<BB", blob, 0)
        shape = struct.unpack_from(f"<{ndim}I", blob, 2)
        lengths = np.frombuffer(
            zlib.decompress(blob[2 + 4 * ndim :]), dtype=np.uint8
        )
        n_symbols = int(np.prod(shape))
        if native.available():
            out = native.huffman_decode(payload, n_symbols, lengths)
        else:
            out = unpack_codes(payload, n_symbols, lengths)
        dtype = np.uint8 if dtype_code == 0 else np.uint16
        return out.astype(dtype).reshape(shape)
