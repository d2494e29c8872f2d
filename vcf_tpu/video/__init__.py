"""Temporal (video) codecs: III intra-only and IPP hybrid coding."""

from vcf_tpu.video.iii import IIICodec
from vcf_tpu.video.ipp import IPPCodec


def get(video_config, codec_config):
    if video_config.mode == "iii":
        return IIICodec(video_config, codec_config)
    if video_config.mode == "ipp":
        return IPPCodec(video_config, codec_config)
    raise ValueError(f"unknown video mode {video_config.mode!r}")


__all__ = ["IIICodec", "IPPCodec", "get"]
