"""Solarman V5 / Modbus-RTU frame codec — the offline, byte-level
counterpart of the wire protocol the reference delegates to the public
``pysolarmanv5`` library (/root/reference/solarman.py:17,231-242 builds a
``PySolarmanV5Async`` per target and calls
``read_input_register_formatted``; :340-361 retries on ``V5FrameError``).

The V5 framing implemented here follows the publicly documented layout
(the de-facto spec published with the pysolarmanv5 project docs):

    request  = A5 | len(2,LE) | control 0x4510 (2,LE) | seq(2) |
               logger_serial(4,LE) | payload | checksum(1) | 15
    payload  = frame_type 0x02 (1) | sensor_type (2) |
               total_working_time (4) | power_on_time (4) |
               offset_time (4) | modbus_rtu_frame
    checksum = sum(frame[1:-2]) & 0xFF      (start byte excluded)

A response carries control code 0x1510 and a payload of
``frame_type(1) | status(1) | three u32 time fields | modbus_rtu_frame``.
The inner Modbus-RTU read-input-registers exchange (function 0x04) is::

    req  = slave(1) 04 addr_hi addr_lo qty_hi qty_lo crc_lo crc_hi
    resp = slave(1) 04 byte_count data(2*qty) crc_lo crc_hi

with the classic reflected-0xA001 CRC16 (the same polynomial the
``ingest_crc16_modbus`` registry query folds JVM-side).

No socket I/O lives in this module: it is the codec seam only. The
DataSource partition reader (``ingest/datasource.py``) replays fixture
register images by default and, behind the ``SPARK_GRAFT_SOLARMAN_HOST``
env gate, drives this codec against a real TCP peer — the plug-in point
README §"Where a live Modbus / Solarman-V5 client plugs in" documents.
``ReplayDevice`` below is the deterministic stand-in peer: it answers
encoded requests with encoded responses built from the same simulated
register images the fixture pipeline uses, so the full
encode → "wire" → decode path is exercised byte-exactly in tests without
hardware.
"""

from __future__ import annotations

import struct


class V5FrameError(ValueError):
    """Malformed / failed-validation V5 or Modbus-RTU frame."""


# ---------------------------------------------------------------- CRC16

def crc16_modbus(data: bytes) -> int:
    """Reflected CRC16/MODBUS (poly 0xA001, init 0xFFFF) over ``data``."""
    crc = 0xFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0xA001 if crc & 1 else crc >> 1
    return crc


# ----------------------------------------------------------- Modbus RTU

READ_INPUT_REGISTERS = 0x04


def encode_read_input_request(slave: int, addr: int, quantity: int) -> bytes:
    """Modbus-RTU read-input-registers request (function 0x04) with CRC."""
    if not 0 <= slave <= 0xFF:
        raise V5FrameError(f"slave id out of range: {slave}")
    if not 0 <= addr <= 0xFFFF or not 1 <= quantity <= 0x7D:
        raise V5FrameError(f"bad addr/quantity: {addr}/{quantity}")
    body = struct.pack(">BBHH", slave, READ_INPUT_REGISTERS, addr, quantity)
    return body + struct.pack("<H", crc16_modbus(body))


def decode_read_input_request(frame: bytes) -> tuple[int, int, int]:
    """Inverse of :func:`encode_read_input_request` -> (slave, addr, qty)."""
    if len(frame) != 8:
        raise V5FrameError(f"RTU request must be 8 bytes, got {len(frame)}")
    _check_rtu_crc(frame)
    slave, func, addr, qty = struct.unpack(">BBHH", frame[:-2])
    if func != READ_INPUT_REGISTERS:
        raise V5FrameError(f"unexpected function 0x{func:02x}")
    return slave, addr, qty


def encode_read_input_response(slave: int, values: list[int]) -> bytes:
    """Modbus-RTU response carrying ``values`` as big-endian u16s."""
    data = b"".join(struct.pack(">H", v & 0xFFFF) for v in values)
    body = struct.pack(">BBB", slave, READ_INPUT_REGISTERS, len(data)) + data
    return body + struct.pack("<H", crc16_modbus(body))


def decode_read_input_response(frame: bytes, expect_slave: int | None = None
                               ) -> list[int]:
    """Validate CRC / function / byte count and return the u16 registers.

    A Modbus exception response (function | 0x80) raises ``V5FrameError``
    carrying the exception code, mirroring what the reference sees as
    ``umodbus.exceptions.ModbusError`` (solarman.py:349)."""
    if len(frame) < 5:
        raise V5FrameError(f"RTU response too short: {len(frame)}")
    _check_rtu_crc(frame)
    slave, func = frame[0], frame[1]
    if expect_slave is not None and slave != expect_slave:
        raise V5FrameError(f"slave mismatch: got {slave}, want {expect_slave}")
    if func == READ_INPUT_REGISTERS | 0x80:
        raise V5FrameError(f"modbus exception code {frame[2]}")
    if func != READ_INPUT_REGISTERS:
        raise V5FrameError(f"unexpected function 0x{func:02x}")
    nbytes = frame[2]
    data = frame[3:-2]
    if nbytes != len(data) or nbytes % 2:
        raise V5FrameError(f"byte count {nbytes} != payload {len(data)}")
    return [v for (v,) in struct.iter_unpack(">H", data)]


def _check_rtu_crc(frame: bytes) -> None:
    (got,) = struct.unpack("<H", frame[-2:])
    want = crc16_modbus(frame[:-2])
    if got != want:
        raise V5FrameError(f"CRC mismatch: got 0x{got:04x}, want 0x{want:04x}")


# ------------------------------------------------------------- V5 frame

_START, _END = 0xA5, 0x15
CONTROL_REQUEST = 0x4510
CONTROL_RESPONSE = 0x1510
_FRAME_TYPE_SOLARMAN = 0x02


def _v5_wrap(control: int, seq: int, logger_serial: int, payload: bytes) -> bytes:
    head = struct.pack(
        "<BHHHI", _START, len(payload), control, seq & 0xFFFF,
        logger_serial & 0xFFFFFFFF,
    )
    frame = head + payload
    checksum = sum(frame[1:]) & 0xFF
    return frame + bytes((checksum, _END))


def _v5_unwrap(frame: bytes, expect_control: int) -> tuple[int, int, bytes]:
    """Validate envelope -> (seq, logger_serial, payload)."""
    if len(frame) < 13:
        raise V5FrameError(f"V5 frame too short: {len(frame)}")
    if frame[0] != _START or frame[-1] != _END:
        raise V5FrameError("bad start/end sentinel")
    checksum = sum(frame[1:-2]) & 0xFF
    if frame[-2] != checksum:
        raise V5FrameError(
            f"V5 checksum mismatch: got 0x{frame[-2]:02x}, want 0x{checksum:02x}"
        )
    _, length, control, seq, serial = struct.unpack("<BHHHI", frame[:11])
    payload = frame[11:-2]
    if len(payload) != length:
        raise V5FrameError(f"length field {length} != payload {len(payload)}")
    if control != expect_control:
        raise V5FrameError(
            f"control 0x{control:04x}, want 0x{expect_control:04x}"
        )
    return seq, serial, payload


def encode_v5_request(seq: int, logger_serial: int, rtu_frame: bytes) -> bytes:
    """Wrap a Modbus-RTU frame in a V5 request envelope."""
    payload = (
        struct.pack("<BHIII", _FRAME_TYPE_SOLARMAN, 0x0000, 0, 0, 0) + rtu_frame
    )
    return _v5_wrap(CONTROL_REQUEST, seq, logger_serial, payload)


def decode_v5_request(frame: bytes) -> tuple[int, int, bytes]:
    """Inverse of :func:`encode_v5_request` -> (seq, logger_serial, rtu)."""
    seq, serial, payload = _v5_unwrap(frame, CONTROL_REQUEST)
    if len(payload) < 15:
        raise V5FrameError(f"request payload too short: {len(payload)}")
    return seq, serial, payload[15:]


def encode_v5_response(seq: int, logger_serial: int, rtu_frame: bytes,
                       status: int = 0x01) -> bytes:
    """Wrap a Modbus-RTU response in a V5 response envelope."""
    payload = (
        struct.pack("<BBIII", _FRAME_TYPE_SOLARMAN, status, 0, 0, 0) + rtu_frame
    )
    return _v5_wrap(CONTROL_RESPONSE, seq, logger_serial, payload)


def decode_v5_response(frame: bytes, expect_seq: int | None = None,
                       expect_serial: int | None = None) -> bytes:
    """Validate a V5 response envelope and return the inner RTU frame."""
    seq, serial, payload = _v5_unwrap(frame, CONTROL_RESPONSE)
    if expect_seq is not None and seq != expect_seq:
        raise V5FrameError(f"sequence mismatch: got {seq}, want {expect_seq}")
    if expect_serial is not None and serial != expect_serial:
        raise V5FrameError(
            f"logger serial mismatch: got {serial}, want {expect_serial}"
        )
    if len(payload) < 14:
        raise V5FrameError(f"response payload too short: {len(payload)}")
    return payload[14:]


# ------------------------------------------------- deterministic device

class ReplayDevice:
    """In-memory stand-in for a Solarman logging stick: answers encoded V5
    request BYTES with encoded V5 response BYTES built from a register
    image function ``(addr) -> u16``. Used by tests and by the datasource's
    env-gated live branch as the no-peer fallback, so the codec path is
    identical with and without hardware."""

    def __init__(self, logger_serial: int, slave: int,
                 register_image: dict[int, int]):
        self.logger_serial = logger_serial
        self.slave = slave
        self.register_image = register_image

    def exchange(self, request: bytes) -> bytes:
        seq, serial, rtu = decode_v5_request(request)
        if serial != self.logger_serial:
            raise V5FrameError(
                f"request for serial {serial}, device is {self.logger_serial}"
            )
        slave, addr, qty = decode_read_input_request(rtu)
        if slave != self.slave:
            raise V5FrameError(f"request for slave {slave}, device is {self.slave}")
        values = [self.register_image.get(addr + i, 0) for i in range(qty)]
        return encode_v5_response(
            seq, self.logger_serial, encode_read_input_response(slave, values)
        )


def read_registers_via(exchange, seq: int, logger_serial: int, slave: int,
                       addr: int, quantity: int) -> list[int]:
    """One full read through any transport: build the V5 request, send it
    through ``exchange(bytes) -> bytes`` (a socket's sendall+recv, or a
    ReplayDevice), validate and decode the response. This is the exact
    client-side call path of the reference's ``read_input_register``
    (solarman.py:340-361) minus asyncio/retry, which Spark task retry
    subsumes (datasource.py module doc)."""
    req = encode_v5_request(seq, logger_serial,
                           encode_read_input_request(slave, addr, quantity))
    rtu = decode_v5_response(exchange(req), expect_seq=seq,
                             expect_serial=logger_serial)
    values = decode_read_input_response(rtu, expect_slave=slave)
    if len(values) != quantity:
        raise V5FrameError(f"got {len(values)} registers, want {quantity}")
    return values
