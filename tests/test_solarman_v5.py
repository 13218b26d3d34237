"""Byte-exact tests for the offline Solarman-V5 / Modbus-RTU codec
(round-5 verdict, Next round #3): encode/decode round-trips, known CRC16
vectors, hand-built recorded frames, corruption detection, and the full
codec path through the DataSource's register reader."""

from __future__ import annotations

import pytest

from solis_solarman_clickhouse_spark.ingest import solarman_v5 as v5


def test_crc16_known_vectors():
    # canonical CRC16/MODBUS check value for '123456789' is 0x4B37
    assert v5.crc16_modbus(b"123456789") == 0x4B37
    # a classic on-the-wire example: read 2 input registers at 0x0000
    # from slave 1 -> frame 01 04 00 00 00 02 71 CB
    body = bytes.fromhex("010400000002")
    assert v5.crc16_modbus(body) == 0xCB71  # LE on wire: 71 CB


def test_rtu_request_bytes_exact():
    frame = v5.encode_read_input_request(slave=1, addr=0, quantity=2)
    assert frame == bytes.fromhex("01040000000271cb")
    assert v5.decode_read_input_request(frame) == (1, 0, 2)


def test_rtu_response_roundtrip_and_bytes():
    # slave 1 returning registers [0x0C00, 0x0021]:
    # 01 04 04 0C 00 00 21 + CRC
    resp = v5.encode_read_input_response(1, [0x0C00, 0x0021])
    assert resp[:7] == bytes.fromhex("0104040c000021")
    assert v5.crc16_modbus(resp[:-2]).to_bytes(2, "little") == resp[-2:]
    assert v5.decode_read_input_response(resp, expect_slave=1) == [0x0C00, 0x0021]


def test_rtu_crc_corruption_detected():
    resp = bytearray(v5.encode_read_input_response(1, [7, 8, 9]))
    resp[4] ^= 0x01  # flip one data bit
    with pytest.raises(v5.V5FrameError, match="CRC"):
        v5.decode_read_input_response(bytes(resp))


def test_rtu_exception_response_raises():
    body = bytes([1, 0x84, 0x02])  # function | 0x80, exception code 2
    frame = body + v5.crc16_modbus(body).to_bytes(2, "little")
    with pytest.raises(v5.V5FrameError, match="exception code 2"):
        v5.decode_read_input_response(frame)


def test_v5_request_frame_layout():
    rtu = v5.encode_read_input_request(1, 3021, 6)
    frame = v5.encode_v5_request(seq=7, logger_serial=1_712_345_678, rtu_frame=rtu)
    # envelope sentinels
    assert frame[0] == 0xA5 and frame[-1] == 0x15
    # length field counts the payload only (15-byte V5 header + RTU)
    assert int.from_bytes(frame[1:3], "little") == 15 + len(rtu)
    # control code 0x4510 little-endian
    assert frame[3:5] == bytes([0x10, 0x45])
    # checksum = sum of everything after the start byte, pre-checksum
    assert frame[-2] == sum(frame[1:-2]) & 0xFF
    seq, serial, inner = v5.decode_v5_request(frame)
    assert (seq, serial, inner) == (7, 1_712_345_678, rtu)


def test_v5_response_roundtrip():
    rtu = v5.encode_read_input_response(1, [100, 200, 300])
    frame = v5.encode_v5_response(seq=9, logger_serial=42, rtu_frame=rtu)
    assert frame[3:5] == bytes([0x10, 0x15])  # control 0x1510 LE
    assert v5.decode_v5_response(frame, expect_seq=9, expect_serial=42) == rtu


def test_v5_validation_failures():
    rtu = v5.encode_read_input_response(1, [1])
    good = v5.encode_v5_response(3, 42, rtu)
    bad = bytearray(good)
    bad[6] ^= 0xFF  # corrupt a serial byte -> checksum fails
    with pytest.raises(v5.V5FrameError, match="checksum"):
        v5.decode_v5_response(bytes(bad))
    with pytest.raises(v5.V5FrameError, match="sequence"):
        v5.decode_v5_response(good, expect_seq=4)
    with pytest.raises(v5.V5FrameError, match="control"):
        # a request envelope is not a response
        v5.decode_v5_response(v5.encode_v5_request(3, 42, rtu))


def test_replay_device_end_to_end():
    """Full client call path against the deterministic device: the exact
    shape of reference read_input_register (solarman.py:340-361)."""
    image = {3021: 3800, 3022: 95, 3023: 3724, 3024: 92, 3025: 3648, 3026: 90}
    dev = v5.ReplayDevice(logger_serial=55, slave=1, register_image=image)
    vals = v5.read_registers_via(dev.exchange, seq=1, logger_serial=55,
                                 slave=1, addr=3021, quantity=6)
    assert vals == [3800, 95, 3724, 92, 3648, 90]
    # unknown registers read as 0 (device returns a dense span)
    assert v5.read_registers_via(dev.exchange, 2, 55, 1, 3027, 2) == [0, 0]
    with pytest.raises(v5.V5FrameError, match="serial"):
        v5.read_registers_via(dev.exchange, 3, 99, 1, 3021, 1)


def test_datasource_codec_path_matches_fixture(monkeypatch):
    """With SPARK_GRAFT_SOLARMAN_CODEC=1 every register travels encode →
    wire bytes → decode and the rows must be IDENTICAL to the direct
    fixture path — the codec is a transparent transport."""
    from solis_solarman_clickhouse_spark.ingest import datasource as ds

    direct = list(ds._rows(1, 1100, 1103, 2880))
    monkeypatch.setenv("SPARK_GRAFT_SOLARMAN_CODEC", "1")
    via_codec = list(ds._rows(1, 1100, 1103, 2880))
    assert via_codec == direct
    assert len(direct) == 3 and direct[0][0] == "INV-1"


def test_datasource_live_gate_falls_back(monkeypatch):
    """SPARK_GRAFT_SOLARMAN_HOST pointing at an unreachable peer must fall
    back to fixture replay (README-documented behavior), not raise."""
    from solis_solarman_clickhouse_spark.ingest import datasource as ds

    direct = list(ds._rows(0, 500, 501, 2880))
    monkeypatch.setenv("SPARK_GRAFT_SOLARMAN_HOST", "127.0.0.1")
    monkeypatch.setenv("SPARK_GRAFT_SOLARMAN_PORT", "1")  # nothing listens
    assert list(ds._rows(0, 500, 501, 2880)) == direct


def test_contiguous_spans():
    from solis_solarman_clickhouse_spark.ingest.datasource import (
        _contiguous_spans,
    )

    assert _contiguous_spans([3004, 3005, 3006, 3007, 3010, 3014]) == [
        (3004, 4), (3010, 1), (3014, 1),
    ]
