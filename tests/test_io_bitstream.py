"""IO + container + bitwriter round-trip tests."""

import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.bitwriter import BitReader, BitWriter
from svt_av1_psy_tpu.bitstream.ivf import IvfWriter, read_ivf
from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus, temporal_delimiter, wrap_obu
from svt_av1_psy_tpu.io.y4m import Y4mReader, Y4mWriter, parse_header


def test_bitwriter_f_roundtrip():
    w = BitWriter()
    vals = [(5, 3), (1, 1), (0, 1), (1023, 10), (0xABCDE, 20), (1, 2)]
    for v, n in vals:
        w.f(v, n)
    w.byte_align()
    r = BitReader(w.data())
    for v, n in vals:
        assert r.f(n) == v


def test_bitwriter_uvlc_leb128_ns_su():
    w = BitWriter()
    for v in [0, 1, 2, 3, 4, 7, 8, 100, 1 << 16]:
        w.uvlc(v)
    for v, n in [(-3, 6), (3, 6), (-32, 6), (0, 4)]:
        w.su(v, n)
    for v, n in [(0, 5), (2, 5), (4, 5), (0, 7), (6, 7)]:
        w.ns(v, n)
    w.byte_align()
    for v in [0, 1, 127, 128, 300, 1 << 20]:
        w.leb128(v)
    r = BitReader(w.data())
    for v in [0, 1, 2, 3, 4, 7, 8, 100, 1 << 16]:
        assert r.uvlc() == v
    for v, n in [(-3, 6), (3, 6), (-32, 6), (0, 4)]:
        assert r.su(n) == v
    for v, n in [(0, 5), (2, 5), (4, 5), (0, 7), (6, 7)]:
        assert r.ns(n) == v
    r.byte_align()
    for v in [0, 1, 127, 128, 300, 1 << 20]:
        assert r.leb128() == v


def test_bitwriter_rejects_overflow():
    w = BitWriter()
    with pytest.raises(ValueError):
        w.f(8, 3)


def test_obu_roundtrip():
    payload = b"\x01\x02\x03\x04"
    data = temporal_delimiter() + wrap_obu(ObuType.SEQUENCE_HEADER, payload) + \
        wrap_obu(ObuType.FRAME, b"\xff" * 300, temporal_id=2, spatial_id=1)
    obus = list(parse_obus(data))
    assert [o[0] for o in obus] == [ObuType.TEMPORAL_DELIMITER,
                                    ObuType.SEQUENCE_HEADER, ObuType.FRAME]
    assert obus[1][3] == payload
    assert obus[2][1] == 2 and obus[2][2] == 1
    assert obus[2][3] == b"\xff" * 300


def test_ivf_roundtrip(tmp_path):
    p = tmp_path / "t.ivf"
    with IvfWriter(p, 352, 288, 30, 1) as w:
        w.write_frame(b"frame0", 0)
        w.write_frame(b"frame1" * 100, 1)
    hdr, frames = read_ivf(p)
    assert (hdr.width, hdr.height) == (352, 288)
    assert hdr.fourcc == b"AV01"
    assert hdr.frame_count == 2
    assert frames[0] == (0, b"frame0")
    assert frames[1][1] == b"frame1" * 100


@pytest.mark.parametrize("bit_depth", [8, 10])
def test_y4m_roundtrip(bit_depth):
    rng = np.random.default_rng(0)
    hi = (1 << bit_depth) - 1
    dt = np.uint16 if bit_depth > 8 else np.uint8
    frames = [
        (rng.integers(0, hi, (64, 96)).astype(dt),
         rng.integers(0, hi, (32, 48)).astype(dt),
         rng.integers(0, hi, (32, 48)).astype(dt))
        for _ in range(3)
    ]
    buf = io.BytesIO()
    w = Y4mWriter(buf, 96, 64, 25, 1, bit_depth)
    for f in frames:
        w.write_frame(*f)
    buf.seek(0)
    r = Y4mReader(buf)
    assert r.header.width == 96 and r.header.height == 64
    assert r.header.bit_depth == bit_depth
    assert r.header.fps_num == 25
    got = list(r)
    assert len(got) == 3
    for (gy, gu, gv), (ey, eu, ev) in zip(got, frames):
        np.testing.assert_array_equal(gy, ey)
        np.testing.assert_array_equal(gu, eu)
        np.testing.assert_array_equal(gv, ev)


def test_y4m_header_parse_errors():
    with pytest.raises(ValueError):
        parse_header(b"NOTY4M W64 H64")
    with pytest.raises(ValueError):
        parse_header(b"YUV4MPEG2 W64 H64 F30:1 C444")
    h = parse_header(b"YUV4MPEG2 W1920 H1080 F24000:1001 Ip A1:1 C420p10")
    assert h.bit_depth == 10
    assert h.frame_size_bytes == 1920 * 1080 * 3  # 1.5 * 2 bytes
