"""The ``config.tc`` terrain manifest — bincode-2-compatible.

The reference persists the set of existing tiles as
``TC { tiles: Vec<TileCoordinate> }`` encoded with bincode 2's *standard*
configuration (reference src/formats/mod.rs:8-36: ``config::standard()``),
i.e. little-endian with **varint** integer encoding:

* unsigned < 251            -> 1 byte
* 251 <= x < 2^16           -> 0xFB + u16 LE
* 2^16 <= x < 2^32          -> 0xFC + u32 LE
* 2^32 <= x < 2^64          -> 0xFD + u64 LE
* Vec<T>: length as varint u64, then elements
* struct: fields in declaration order (side, lod, x, y — all u32,
  reference src/math/coordinate.rs:156-166)

Writing the same byte stream lets datasets produced here be consumed by the
Rust reference and vice versa.
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path
from typing import List

from bevy_terrain_tpu.math.coordinate import TileCoordinate

_U16_MARKER = 0xFB
_U32_MARKER = 0xFC
_U64_MARKER = 0xFD


def _encode_varint(value: int, out: bytearray) -> None:
    if value < 0:
        raise ValueError(f"varint encodes unsigned values, got {value}")
    if value < 251:
        out.append(value)
    elif value < 1 << 16:
        out.append(_U16_MARKER)
        out += struct.pack("<H", value)
    elif value < 1 << 32:
        out.append(_U32_MARKER)
        out += struct.pack("<I", value)
    else:
        out.append(_U64_MARKER)
        out += struct.pack("<Q", value)


def _decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    first = data[pos]
    pos += 1
    if first < 251:
        return first, pos
    if first == _U16_MARKER:
        return struct.unpack_from("<H", data, pos)[0], pos + 2
    if first == _U32_MARKER:
        return struct.unpack_from("<I", data, pos)[0], pos + 4
    if first == _U64_MARKER:
        return struct.unpack_from("<Q", data, pos)[0], pos + 8
    raise ValueError(f"unsupported varint marker 0x{first:02x}")


@dataclasses.dataclass
class TC:
    """Tile manifest (reference src/formats/mod.rs:8-12)."""

    tiles: List[TileCoordinate]

    def encode(self) -> bytes:
        out = bytearray()
        _encode_varint(len(self.tiles), out)
        for t in self.tiles:
            # u32 fields; the INVALID sentinel (-1) round-trips as u32::MAX
            for v in (t.side, t.lod, t.x, t.y):
                _encode_varint(v & 0xFFFFFFFF, out)
        return bytes(out)

    @staticmethod
    def decode(data: bytes) -> "TC":
        count, pos = _decode_varint(data, 0)
        tiles = []
        for _ in range(count):
            vals = []
            for _ in range(4):
                v, pos = _decode_varint(data, pos)
                vals.append(v)
            tiles.append(TileCoordinate(*vals))
        if pos != len(data):
            raise ValueError(f"trailing bytes in TC stream: {len(data) - pos}")
        return TC(tiles)

    def save_file(self, path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_bytes(self.encode())

    @staticmethod
    def load_file(path) -> "TC":
        return TC.decode(Path(path).read_bytes())
