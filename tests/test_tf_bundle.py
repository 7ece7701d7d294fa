"""TF TensorBundle reader/writer: wire-format vectors + roundtrips.

The reader must accept the released TF1 checkpoints without TensorFlow
installed (reference README.md:70-78), so the format pieces are pinned to
independent known-good vectors where they exist (CRC32C check value, the
leveldb table magic, protobuf varint examples), not just to our own writer.
"""

import os

import numpy as np
import pytest

from spatialaudiogen_tpu.utils import tf_bundle as tb


def test_crc32c_check_vectors():
    # CRC-32C check value (iSCSI / RFC 3720 test vector)
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(b"") == 0
    # 32 bytes of zeros -> 0x8A9136AA (RFC 3720 B.4)
    assert tb.crc32c(b"\x00" * 32) == 0x8A9136AA
    # masking is the leveldb rot15+constant rule
    assert tb.masked_crc32c(b"") == 0xA282EAD8


def test_varint_roundtrip():
    for v in (0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1):
        enc = tb._write_varint(v)
        dec, pos = tb._read_varint(enc, 0)
        assert dec == v and pos == len(enc)
    # protobuf docs example: 300 -> AC 02
    assert tb._write_varint(300) == b"\xac\x02"


def test_bundle_entry_proto_roundtrip():
    e = tb.BundleEntry(b"")
    e.dtype, e.shape, e.offset, e.size, e.crc32c = 1, (3, 4, 5), 1024, 240, 0xDEADBEEF
    e2 = tb.BundleEntry(e.serialize())
    assert (e2.dtype, e2.shape, e2.offset, e2.size, e2.crc32c) == (
        1, (3, 4, 5), 1024, 240, 0xDEADBEEF)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {
        "audio_encoder/conv1/weights": rng.randn(7, 16, 1, 32).astype(np.float32),
        "audio_encoder/conv1/biases": rng.randn(32).astype(np.float32),
        "global_step": np.array(152000, np.int64),
        "flags/mask": rng.rand(5) > 0.5,
        "video_encoder/conv1/bn/moving_mean": rng.randn(64).astype(np.float32),
    }
    prefix = str(tmp_path / "model.ckpt-152000")
    tb.save_tf_checkpoint(prefix, tensors)
    assert os.path.exists(prefix + ".index")
    assert os.path.exists(prefix + ".data-00000-of-00001")

    back = tb.load_tf_checkpoint(prefix, verify_crc=True)
    assert set(back) == set(tensors)
    for name, arr in tensors.items():
        np.testing.assert_array_equal(back[name], arr)
        assert back[name].dtype == arr.dtype

    # all three path spellings resolve
    by_index = tb.load_tf_checkpoint(prefix + ".index")
    by_dir = tb.load_tf_checkpoint(str(tmp_path))
    assert set(by_index) == set(by_dir) == set(tensors)


def test_checkpoint_many_vars_multi_block(tmp_path):
    """>1 data block in the index (block_size forces splits) still reads back."""
    rng = np.random.RandomState(1)
    tensors = {f"scope_{i:03d}/very/long/nested/variable_name_{i:03d}/weights":
               rng.randn(4, 4).astype(np.float32) for i in range(300)}
    prefix = str(tmp_path / "model.ckpt-7")
    tb.save_tf_checkpoint(prefix, tensors)
    # small blocks: rewrite the index with a tiny block size
    entries = tb.read_index_file(prefix + ".index")["entries"]
    tb.write_index_file(prefix + ".index", entries, block_size=256)
    back = tb.load_tf_checkpoint(prefix, verify_crc=True)
    assert len(back) == 300
    for name, arr in tensors.items():
        np.testing.assert_array_equal(back[name], arr)


def test_index_crc_detects_corruption(tmp_path):
    prefix = str(tmp_path / "model.ckpt-1")
    tb.save_tf_checkpoint(prefix, {"w": np.ones((2, 2), np.float32)})
    blob = bytearray(open(prefix + ".index", "rb").read())
    blob[1] ^= 0xFF  # flip a byte inside the first block
    open(prefix + ".index", "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum|magic"):
        tb.load_tf_checkpoint(prefix)


def test_data_crc_detects_corruption(tmp_path):
    prefix = str(tmp_path / "model.ckpt-1")
    tb.save_tf_checkpoint(prefix, {"w": np.arange(16, dtype=np.float32)})
    data_fn = prefix + ".data-00000-of-00001"
    blob = bytearray(open(data_fn, "rb").read())
    blob[3] ^= 0xFF
    open(data_fn, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        tb.load_tf_checkpoint(prefix, verify_crc=True)
    # unverified load still returns (the fast path for huge checkpoints)
    assert tb.load_tf_checkpoint(prefix)["w"].shape == (16,)


def test_latest_checkpoint_state_file(tmp_path):
    for step in (5, 100, 20):
        tb.save_tf_checkpoint(str(tmp_path / f"model.ckpt-{step}"),
                              {"w": np.full((2,), step, np.float32)})
    # save_tf_checkpoint rewrote the state file each time; last write wins
    assert tb.latest_checkpoint(str(tmp_path)).endswith("model.ckpt-20")
    os.remove(str(tmp_path / "checkpoint"))
    # without the state file, the highest numbered index wins
    assert tb.latest_checkpoint(str(tmp_path)).endswith("model.ckpt-100")


def test_golden_fixture_bundle():
    """A checked-in binary bundle decodes to pinned values.

    Guards the on-disk layout against regressions in BOTH reader and writer
    (the fixture bytes are frozen in git, so a symmetric format change that
    still roundtrips will fail here).
    """
    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "tfbundle", "model.ckpt-42")
    back = tb.load_tf_checkpoint(fixture, verify_crc=True)
    assert set(back) == {"a/weights", "a/biases", "step"}
    np.testing.assert_allclose(
        back["a/weights"], np.arange(6, dtype=np.float32).reshape(2, 3) / 7.0)
    np.testing.assert_array_equal(back["a/biases"],
                                  np.array([-1.5, 2.5], np.float32))
    assert back["step"] == 42 and back["step"].dtype == np.int64


def test_scalar_shape_preserved(tmp_path):
    """0-d tensors (global_step) must keep shape () in the bundle
    (np.ascontiguousarray silently promotes 0-d to 1-d)."""
    prefix = str(tmp_path / "model.ckpt-3")
    tb.save_tf_checkpoint(prefix, {"global_step": np.array(3, np.int64),
                                   "w": np.ones((2,), np.float32)})
    back = tb.load_tf_checkpoint(prefix, verify_crc=True)
    assert back["global_step"].shape == ()
    assert int(back["global_step"]) == 3
