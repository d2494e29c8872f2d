"""Host-side image/video I/O."""

from vcf_tpu.io.images import read_image, write_image, test_image

__all__ = ["read_image", "write_image", "test_image"]
