"""TensorBoard event-file writer: record framing + proto round-trip."""

import struct

from boxer_tpu.utils.tb_writer import (
    TensorboardWriter, _masked_crc, _scalar_event, _record)


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack("<Q", data[pos:pos + 8])
        (len_crc,) = struct.unpack("<I", data[pos + 8:pos + 12])
        assert len_crc == _masked_crc(data[pos:pos + 8])
        payload = data[pos + 12:pos + 12 + length]
        (data_crc,) = struct.unpack("<I",
                                    data[pos + 12 + length:pos + 16 + length])
        assert data_crc == _masked_crc(payload)
        out.append(payload)
        pos += 16 + length
    return out


def test_event_file_roundtrip(tmp_path):
    w = TensorboardWriter(str(tmp_path))
    w.add_scalars({"train/loss": 1.5, "train/lr": 2e-4}, step=7)
    w.add_scalar("val/mAP", 0.42, step=8)
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    # file_version event + 3 scalar events
    assert len(records) == 4
    assert b"brain.Event:2" in records[0]
    assert b"train/loss" in records[1]
    assert b"val/mAP" in records[3]
    # simple_value float appears verbatim in the encoding
    assert struct.pack("<f", 1.5) in records[1]
    assert struct.pack("<f", 0.42) in records[3]
    # step varint: field 2 wire 0 -> 0x10 then 7
    assert bytes([0x10, 7]) in records[1]


def test_tensorboard_package_parses_if_available(tmp_path):
    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            RawEventFileLoader)
    except Exception:
        import pytest

        pytest.skip("tensorboard not installed")
    w = TensorboardWriter(str(tmp_path))
    w.add_scalars({"x": 3.0}, step=1)
    w.close()
    path = str(next(tmp_path.glob("events.out.tfevents.*")))
    events = list(RawEventFileLoader(path).Load())
    assert len(events) == 2
