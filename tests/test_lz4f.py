"""Unit tests for the pure-Python LZ4 frame codec (io/lz4f.py).

Oracles: hand-assembled frames/blocks built byte-by-byte from the public
LZ4 spec (including overlap-match semantics), xxHash32 reference vectors,
and compressor->decompressor round trips on compressible, random, and
degenerate inputs.
"""

import struct

import numpy as np
import pytest

from uslam_tpu.io import lz4f


def _frame(blocks: list[tuple[bool, bytes]]) -> bytes:
    """Assemble a frame from (is_uncompressed, payload) blocks."""
    flg = (1 << 6) | (1 << 5)
    bd = 7 << 4
    out = bytearray(struct.pack("<I", 0x184D2204))
    out += bytes([flg, bd, lz4f._header_checksum(bytes([flg, bd]))])
    for uncompressed, payload in blocks:
        size = len(payload) | (0x80000000 if uncompressed else 0)
        out += struct.pack("<I", size) + payload
    out += struct.pack("<I", 0)
    return bytes(out)


class TestBlockDecode:
    def test_literals_only(self):
        # token 0x50: 5 literals, no match (final sequence).
        out = bytearray()
        lz4f.decompress_block(bytes([0x50]) + b"hello", out)
        assert bytes(out) == b"hello"

    def test_simple_match(self):
        # "abcdabcdabcd" = 4 literals + match(offset=4, len=8).
        # token: lit=4, matchlen code=8-4=4 -> 0x44; offset LE16 = 4;
        # then final literals token 0x00 (empty).
        block = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x00])
        out = bytearray()
        lz4f.decompress_block(block, out)
        assert bytes(out) == b"abcdabcdabcd"

    def test_overlap_match_rle(self):
        # Classic RLE: 1 literal "A", match offset=1 len=7 -> "AAAAAAAA".
        block = bytes([0x13]) + b"A" + struct.pack("<H", 1) + bytes([0x00])
        out = bytearray()
        lz4f.decompress_block(block, out)
        assert bytes(out) == b"A" * 8

    def test_long_runs_use_continuation_bytes(self):
        data = bytes(np.arange(300, dtype=np.uint8))  # 300 distinct literals
        # lit_len 300 -> token 15 + continuation (255, 30).
        block = bytes([0xF0, 255, 30]) + data
        out = bytearray()
        lz4f.decompress_block(block, out)
        assert bytes(out) == data

    def test_linked_block_offset_reaches_previous_block(self):
        out = bytearray(b"abcdefgh")  # previous block's output
        # 0 literals, match offset=8 len=4 -> copies "abcd".
        block = bytes([0x00]) + struct.pack("<H", 8) + bytes([0x00])
        lz4f.decompress_block(block, out)
        assert bytes(out) == b"abcdefghabcd"

    def test_bad_offset_raises(self):
        block = bytes([0x00]) + struct.pack("<H", 99) + bytes([0x00])
        with pytest.raises(ValueError):
            lz4f.decompress_block(block, bytearray())


class TestFrame:
    def test_uncompressed_blocks(self):
        data = b"underwater slam"
        assert lz4f.decompress(_frame([(True, data)])) == data

    def test_mixed_blocks(self):
        b1 = b"12345678"
        comp = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x00])
        got = lz4f.decompress(_frame([(True, b1), (False, comp)]))
        assert got == b1 + b"abcdabcdabcd"

    def test_skippable_frame(self):
        skip = struct.pack("<II", 0x184D2A50, 3) + b"xyz"
        data = b"payload!"
        assert lz4f.decompress(skip + _frame([(True, data)])) == data

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            lz4f.decompress(struct.pack("<I", 0xDEADBEEF))


class TestRoundTrip:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"a",
            b"hello world " * 500,           # highly compressible
            bytes(range(256)) * 40,          # periodic
            np.random.default_rng(0).integers(0, 256, 7001, dtype=np.uint8).tobytes(),
            np.zeros(100000, np.uint8).tobytes(),  # giant RLE
        ],
    )
    def test_roundtrip(self, data):
        assert lz4f.decompress(lz4f.compress(data)) == data

    def test_compressible_actually_shrinks(self):
        data = b"sensor_msgs/Imu " * 4096
        assert len(lz4f.compress(data)) < len(data) // 4


class TestXxh32:
    """Reference vectors from the public xxHash spec."""

    def test_known_vectors(self):
        assert lz4f._xxh32(b"") == 0x02CC5D05
        assert lz4f._xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
