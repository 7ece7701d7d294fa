"""TensorBoard event writer: crc-checked roundtrip of scalar events."""

import glob
import os

import numpy as np
import pytest

from spatialaudiogen_tpu.utils.logging import MetricLogger
from spatialaudiogen_tpu.utils.tensorboard import (
    TBEventWriter,
    crc32c,
    decode_scalars,
    read_records,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_event_file_roundtrip(tmp_path):
    writer = TBEventWriter(str(tmp_path))
    writer.add_scalar("loss/total", 1.5, 0)
    writer.add_scalar("loss/total", 0.75, 20)
    writer.add_scalar("lr", 1e-4, 20)
    writer.close()

    records = read_records(writer.path)  # crc-validated
    assert len(records) == 4  # version event + 3 scalars
    scalars = decode_scalars(writer.path)
    assert ("loss/total", pytest.approx(1.5), 0) == scalars[0]
    assert ("loss/total", pytest.approx(0.75), 20) == scalars[1]
    assert ("lr", pytest.approx(1e-4, rel=1e-5), 20) == scalars[2]


def test_metric_logger_emits_tb_events(tmp_path):
    logger = MetricLogger(str(tmp_path))
    logger.tick(0.1)
    logger.log(5, {"total_loss": 3.25, "stft/mse": 3.0}, batch_size=4)
    logger.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    scalars = dict((t, (v, s)) for t, v, s in decode_scalars(files[0]))
    assert scalars["total_loss"] == (pytest.approx(3.25), 5)
    assert scalars["stft/mse"] == (pytest.approx(3.0), 5)
    assert os.path.exists(tmp_path / "metrics.jsonl")
