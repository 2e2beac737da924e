"""TensorBoard event-file artifact parity (VERDICT r1 missing #1).

The reference run dir contains real TB event files (train2_seq.py:70);
ours are produced by the dependency-free writer in utils/tb_events.py.
Readability is pinned against tensorboard's own EventFileLoader (which
verifies the TFRecord CRCs), not against our writer."""

import glob
import json
import os
import struct

import pytest

from deepsense6g_tii_tpu.train.checkpoints import ScalarLogger
from deepsense6g_tii_tpu.utils.tb_events import (_crc32c, _masked_crc,
                                                 _varint)


class TestEncoding:
    def test_crc32c_known_vectors(self):
        # RFC 3720 test vectors for CRC-32C
        assert _crc32c(b"123456789") == 0xE3069283
        assert _crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_masked_crc_matches_tensorflow(self):
        # value computed by tensorflow.python.lib.io's masked crc for b"abc"
        crc = _crc32c(b"abc")
        masked = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(b"abc") == masked

    def test_varint(self):
        assert _varint(0) == b"\x00"
        assert _varint(300) == b"\xac\x02"


class TestScalarLogger:
    def test_writes_jsonl_and_readable_event_file(self, tmp_path):
        logger = ScalarLogger(str(tmp_path))
        logger.scalar("DBA_score_val/scenario_all", 0.6671, 35)
        logger.scalars("curr_acc_val",
                       {"scenario31beam0": 0.5, "scenario31beam1": 0.75}, 35)
        logger.close()

        rows = [json.loads(l) for l in
                open(tmp_path / "scalars.jsonl").read().splitlines()]
        assert rows[0] == {"tag": "DBA_score_val/scenario_all",
                           "step": 35, "value": 0.6671}

        files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
        assert len(files) == 1

        loader_mod = pytest.importorskip(
            "tensorboard.backend.event_processing.event_file_loader")
        events = list(loader_mod.EventFileLoader(files[0]).Load())
        assert events[0].file_version == "brain.Event:2"
        scalars = {}
        for e in events[1:]:
            for v in e.summary.value:
                # the loader migrates simple_value into tensor form
                val = (v.tensor.float_val[0] if v.tensor.float_val
                       else v.simple_value)
                scalars[(v.tag, e.step)] = val
        assert scalars[("DBA_score_val/scenario_all", 35)] == \
            pytest.approx(0.6671, rel=1e-6)
        assert scalars[("curr_acc_val/scenario31beam1", 35)] == \
            pytest.approx(0.75)

    def test_opt_out(self, tmp_path):
        logger = ScalarLogger(str(tmp_path), tensorboard=False)
        logger.scalar("x", 1.0, 1)
        logger.close()
        assert not glob.glob(str(tmp_path / "events.out.tfevents.*"))
        assert os.path.exists(tmp_path / "scalars.jsonl")

    def test_record_framing_crcs(self, tmp_path):
        """Every record's length and payload CRCs verify (TFRecord format)."""
        logger = ScalarLogger(str(tmp_path))
        for i in range(5):
            logger.scalar("t", float(i), i)
        logger.close()
        f = glob.glob(str(tmp_path / "events.out.tfevents.*"))[0]
        data = open(f, "rb").read()
        off, n = 0, 0
        while off < len(data):
            header = data[off:off + 8]
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", data[off + 8:off + 12])
            payload = data[off + 12:off + 12 + length]
            (pcrc,) = struct.unpack("<I",
                                    data[off + 12 + length:off + 16 + length])
            assert hcrc == _masked_crc(header)
            assert pcrc == _masked_crc(payload)
            off += 16 + length
            n += 1
        assert n == 6          # file_version + 5 scalars
