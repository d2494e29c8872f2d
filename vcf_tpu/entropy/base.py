"""Entropy codec interface."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


class EntropyCodec:
    """Lossless array <-> bytes codec.

    Equivalent of the reference's L2 entropy layer contract:
    ``compress(np.uint8/16 array) -> stream`` / ``decompress -> array``
    (SURVEY §1 L2; e.g. src/TIFF.py:23-39).
    """

    #: file extension for VCF-layout output (e.g. ".tif", ".png")
    file_extension = ".bin"

    @classmethod
    def from_config(cls, config=None) -> "EntropyCodec":
        return cls()

    def encode(self, arr: np.ndarray) -> Tuple[bytes, Dict[str, bytes]]:
        raise NotImplementedError

    def decode(self, payload: bytes, side: Dict[str, bytes]) -> np.ndarray:
        raise NotImplementedError

    # ---- helpers ---------------------------------------------------------
    @staticmethod
    def check_dtype(arr: np.ndarray) -> np.ndarray:
        """The reference's entropy codecs assert uint8/uint16 input
        (src/TIFF.py:26, src/PNG.py:27, src/PNM.py:24)."""
        if arr.dtype not in (np.uint8, np.uint16):
            raise TypeError(f"entropy codec input must be uint8/uint16, got {arr.dtype}")
        return np.ascontiguousarray(arr)
