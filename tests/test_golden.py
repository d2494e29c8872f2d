"""Golden codestream fixtures: format stability across revisions.

Deterministic inputs + seeded configs must produce byte-identical
codestreams and reconstructions.  If an intentional format change
breaks these, regenerate with `python tests/test_golden.py regen`
and note the format bump in docs/FORMATS.md.
"""

import hashlib
import os
import sys

import numpy as np
import pytest

from vcf_tpu import Codec, CodecConfig, CodeStream
from vcf_tpu.io import test_image as make_test_image

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CONFIGS = {
    "dct_default_tiff": CodecConfig(),
    "dct_huffman": CodecConfig(entropy="huffman"),
    "dwt_db5_zlib": CodecConfig(spatial="dwt", qss=16, dwt_levels=3, entropy="zlib"),
    "ycocg_cbaac": CodecConfig(spatial="none", color="ycocg", qss=16, entropy="cbaac"),
    "colorvq_zlib": CodecConfig(spatial="none", color="none", quantizer="colorvq",
                                entropy="zlib", seed=1),
    # r4 additions
    "dwt_sym5_zlib": CodecConfig(spatial="dwt", qss=16, dwt_levels=2,
                                 wavelet="sym5", entropy="zlib"),
    "dwt_bior44_zlib": CodecConfig(spatial="dwt", qss=16, dwt_levels=2,
                                   wavelet="bior4.4", entropy="zlib"),
    "dct_lloydmax_zlib": CodecConfig(quantizer="lloydmax", qss=32,
                                     entropy="zlib"),
    "dct_grans": CodecConfig(entropy="grans"),
    # r5 additions
    "dwt_grans": CodecConfig(spatial="dwt", qss=16, dwt_levels=3,
                             entropy="grans"),
    "dct_cgrans": CodecConfig(entropy="cgrans"),
}


def _input():
    return make_test_image(96, 112, seed=5)


def _paths(name):
    return (
        os.path.join(GOLDEN_DIR, f"{name}.vcft"),
        os.path.join(GOLDEN_DIR, f"{name}.sha256"),
    )


def regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    img = _input()
    for name, cfg in CONFIGS.items():
        cs = Codec(cfg).encode(img)
        rec = Codec(cfg).decode(cs)
        stream_path, hash_path = _paths(name)
        cs.to_file(stream_path)
        digest = hashlib.sha256(rec.tobytes()).hexdigest()
        with open(hash_path, "w") as f:
            f.write(digest + "\n")
        print(f"regenerated {name}: {cs.total_bytes} bytes, recon {digest[:12]}")


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_decode(name):
    """Stored codestreams must still decode to bit-identical pixels."""
    stream_path, hash_path = _paths(name)
    if not os.path.exists(stream_path):
        pytest.skip("golden fixtures not generated")
    cs = CodeStream.from_file(stream_path)
    rec = Codec(CONFIGS[name]).decode(cs)
    digest = hashlib.sha256(rec.tobytes()).hexdigest()
    with open(hash_path) as f:
        expected = f.read().strip()
    assert digest == expected, f"reconstruction changed for {name}"


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_reencode(name):
    """Encoding the fixed input must reproduce the stored codestream
    byte-for-byte (deterministic encoders)."""
    stream_path, _ = _paths(name)
    if not os.path.exists(stream_path):
        pytest.skip("golden fixtures not generated")
    cs = Codec(CONFIGS[name]).encode(_input())
    with open(stream_path, "rb") as f:
        stored = f.read()
    assert cs.to_bytes() == stored, f"codestream bytes changed for {name}"


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import jax

        jax.config.update("jax_platforms", "cpu")
        regen()
