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


def test_histogram_roundtrip(tmp_path):
    import numpy as np

    from spatialaudiogen_tpu.utils.tensorboard import (TBEventWriter,
                                                       decode_histograms)

    w = TBEventWriter(str(tmp_path))
    rng = np.random.RandomState(0)
    vals = rng.randn(1000).astype(np.float32)
    w.add_histogram("params/conv1/kernel", vals, step=7)
    w.add_histogram("empty", np.zeros((0,)), step=7)  # skipped, not written
    w.close()
    histos = decode_histograms(w.path)
    assert len(histos) == 1
    tag, mn, mx, num, n_buckets = histos[0]
    assert tag == "params/conv1/kernel"
    assert num == 1000 and n_buckets > 4
    np.testing.assert_allclose(mn, vals.min(), rtol=1e-6)
    np.testing.assert_allclose(mx, vals.max(), rtol=1e-6)


def test_trainer_tb_histograms(tmp_path):
    import numpy as np

    from spatialaudiogen_tpu.config import TrainConfig
    from spatialaudiogen_tpu.data.synthetic import make_synthetic_dataset
    from spatialaudiogen_tpu.train.trainer import Trainer
    from spatialaudiogen_tpu.utils.tensorboard import decode_histograms

    root = str(tmp_path / "db")
    make_synthetic_dataset(root, n_videos=1, duration=3.0, frame_hw=(64, 128),
                           seed=3)
    model_dir = str(tmp_path / "model")
    cfg = TrainConfig(db_dir=root, model_dir=model_dir, encoders=("audio",),
                      separation="none", n_iters=3, batch_size=2, n_workers=2,
                      log_every=10, ckpt_every=0, n_data=1, seed=0,
                      tb_histograms=2, tb_activations=True)
    Trainer(cfg).train()
    import glob

    events = glob.glob(model_dir + "/events.out.tfevents.*")
    assert events
    histos = decode_histograms(events[0])
    tags = {t for t, *_ in histos}
    assert any(t.startswith("params/") and t.endswith("kernel")
               for t in tags), tags
    # gradient histograms mirror the param tree (dnn.py:692-709 parity)
    assert any(t.startswith("grads/") and t.endswith("kernel")
               for t in tags), tags
    # tapped activations from the model's ends dict (--tb_activations)
    assert any(t.startswith("acts/") for t in tags), tags
    for _, mn, mx, num, _ in histos:
        assert np.isfinite([mn, mx]).all() and num >= 1


def test_histogram_drops_non_finite(tmp_path):
    """NaN/Inf params must not crash the logging path (np.histogram raises
    on non-finite data); finite entries still record, all-bad arrays skip."""
    import numpy as np

    from spatialaudiogen_tpu.utils.tensorboard import (TBEventWriter,
                                                       decode_histograms)

    w = TBEventWriter(str(tmp_path))
    w.add_histogram("mixed", np.array([1.0, np.nan, 2.0, np.inf, 3.0]), 1)
    w.add_histogram("allbad", np.array([np.nan, np.inf]), 1)
    w.close()
    histos = decode_histograms(w.path)
    assert [h[0] for h in histos] == ["mixed"]
    _, mn, mx, num, _ = histos[0]
    assert (mn, mx, num) == (1.0, 3.0, 3.0)
