"""Entropy codecs (host-side).

Each codec turns a uint8/uint16 index array into bytes and back.  The
payload goes into the codestream's main segment; any decoder-required
side information (symbol tables, shapes) is returned as named sidecar
segments, mirroring the reference's sidecar files (SURVEY §1
"File-based inter-stage protocol").

Interface (vcf_tpu.entropy.base.EntropyCodec):

    payload, side = codec.encode(arr)      # arr: np.uint8 | np.uint16
    arr = codec.decode(payload, side)

Sequential bit-level loops live in the native C++ runtime
(vcf_tpu/native) with pure-Python fallbacks for portability.
"""

from vcf_tpu.entropy.base import EntropyCodec
from vcf_tpu.entropy.zlib_codec import ZlibCodec
from vcf_tpu.entropy.pnm import PNMCodec
from vcf_tpu.entropy.png import PNGCodec
from vcf_tpu.entropy.tiff import TIFFCodec
from vcf_tpu.entropy.huffman import HuffmanCodec
from vcf_tpu.entropy.interleaved import InterleavedHuffmanCodec
from vcf_tpu.entropy.rans import (CtxRANSCodec, GroupedRANSCodec,
                                  RANSCodec, SparseRANSCodec)
from vcf_tpu.entropy.cbahc import CBAHCCodec
from vcf_tpu.entropy.cbaac import CBAACCodec

_REGISTRY = {
    "zlib": ZlibCodec,
    "pnm": PNMCodec,
    "png": PNGCodec,
    "tiff": TIFFCodec,
    "huffman": HuffmanCodec,
    "ihuff": InterleavedHuffmanCodec,
    "rans": RANSCodec,
    "srans": SparseRANSCodec,
    "grans": GroupedRANSCodec,
    "cgrans": CtxRANSCodec,
    "cbahc": CBAHCCodec,
    "cbaac": CBAACCodec,
}


def get(name: str, config=None) -> EntropyCodec:
    """Instantiate an entropy codec by config name."""
    cls = _REGISTRY[name]
    return cls.from_config(config)


__all__ = ["EntropyCodec", "get"] + [c.__name__ for c in _REGISTRY.values()]
