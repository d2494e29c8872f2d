"""Utils (timing, container layout) tests."""

import time

import numpy as np

from vcf_tpu import Codec, CodecConfig, CodeStream
from vcf_tpu.utils.timing import StageTimer, timed_stage


class TestStageTimer:
    def test_spans_accumulate(self):
        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        d = t.as_dict()
        assert set(d) == {"a", "b"}
        assert d["a"] >= 0.01
        assert t.total >= d["a"]
        assert "total" in t.report()

    def test_timed_stage_none_is_noop(self):
        with timed_stage(None, "x"):
            pass

    def test_codec_records_timings(self, img_small):
        cfg = CodecConfig(qss=32, entropy="zlib")
        codec = Codec(cfg)
        codec.encode(img_small)
        d = codec.last_timings.as_dict()
        assert "device:analyze+quantize" in d
        assert "host:entropy" in d


class TestVCFLayout:
    def test_write_read_roundtrip(self, img_small, tmp_path):
        cfg = CodecConfig(entropy="huffman", qss=32)
        codec = Codec(cfg)
        cs = codec.encode(img_small)
        prefix = str(tmp_path / "encoded")
        total = cs.write_vcf_layout(prefix)
        assert total == cs.total_bytes
        cs2 = CodeStream.read_vcf_layout(prefix)
        assert set(cs2) == set(cs)
        rec = Codec(cfg).decode(cs2)
        rec_direct = Codec(cfg).decode(cs)
        np.testing.assert_array_equal(rec, rec_direct)
