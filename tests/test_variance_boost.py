"""Variance-boost adaptive quantization (per-SB delta-q).

Covers the AQ math (monotonicity, range clamps, delta_q_res grid) and the
end-to-end property: a variance-boosted stream decodes bit-exact against
both the in-repo conformance decoder and dav1d, with per-SB qindexes
round-tripping through the delta_q syntax.  Mirrors the reference's AQ
behavior (ref rc_process.c:1406/1516/1675).
"""
import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.models.variance_boost import (
    VAR_BOOST_MAX_DELTAQ_RANGE, adjust_sb_qindex, sb_8x8_variances,
    variance_boost)


def test_sb_8x8_variances_shape_and_values():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 255, (128, 192), np.uint8)
    var = sb_8x8_variances(y)
    assert var.shape == (2, 3, 64)
    # brute-force check one subblock
    blk = y[8:16, 64:72].astype(np.int64)
    s, ss = blk.sum(), (blk * blk).sum()
    expect = (ss - ((s * s) >> 6)) >> 6
    assert var[0, 1, 8] == expect
    # flat area has zero variance
    y2 = np.full((64, 64), 57, np.uint8)
    assert (sb_8x8_variances(y2) == 0).all()


def test_boost_monotonic_in_variance():
    # lower variance must never get a smaller boost
    boosts = []
    for v in (1, 4, 16, 64, 256, 4096):
        var = np.full((1, 64), v, np.int32)
        boosts.append(int(variance_boost(180, var)[0]))
    assert boosts == sorted(boosts, reverse=True)
    assert boosts[0] > 0                    # flat gets a real boost
    assert boosts[-1] == 0                  # high variance: none
    assert boosts[0] <= VAR_BOOST_MAX_DELTAQ_RANGE


def test_adjust_grid_alignment():
    rng = np.random.default_rng(1)
    var = rng.integers(0, 2000, (4, 5, 64)).astype(np.int32)
    base, res_log2, sbq = adjust_sb_qindex(200, var)
    res = 1 << res_log2
    assert sbq.shape == (4, 5)
    # every delta must be representable on the delta_q_res grid
    assert ((sbq - base) % res == 0).all()
    assert (sbq >= 1).all() and (sbq <= 255).all()
    off = sbq - base
    assert (np.abs(off) <= VAR_BOOST_MAX_DELTAQ_RANGE // 2 +
            res).all()


@pytest.fixture(scope="module")
def vb_stream():
    from svt_av1_psy_tpu.models.intra_encoder import IntraEncoder
    W, H = 192, 128
    rng = np.random.default_rng(7)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    y = (96 + 40 * np.sin(xx / 17.0) + 30 * np.cos(yy / 23.0))
    y[:, W // 2:] += rng.normal(0, 22, (H, W // 2))   # noisy right half
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 130, np.uint8)
    enc = IntraEncoder(W, H, qindex=110, use_device_search=False)
    enc.enable_variance_boost = True
    out = enc.encode_frame(y, u, v)
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H)
    w.write_frame(out.payload, 0)
    w.close()
    return buf.getvalue(), out


def test_vb_stream_self_decode(vb_stream):
    from svt_av1_psy_tpu.decoder.driver import decode_ivf
    data, out = vb_stream
    dec = decode_ivf(data)
    np.testing.assert_array_equal(dec[0].y, out.recon_y)
    np.testing.assert_array_equal(dec[0].u, out.recon_u)
    np.testing.assert_array_equal(dec[0].v, out.recon_v)


def test_vb_stream_dav1d(vb_stream):
    from svt_av1_psy_tpu.decoder import dav1d
    data, out = vb_stream
    ref = dav1d.decode_ivf(data)
    ry = ref[0][0] if isinstance(ref[0], tuple) else ref[0].y
    np.testing.assert_array_equal(ry, out.recon_y)


def test_vb_multiple_qindexes_coded(vb_stream):
    """The stream must actually carry more than one per-block qindex."""
    from svt_av1_psy_tpu.bitstream.ivf import read_ivf
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    from svt_av1_psy_tpu.decoder.tile_parser import TileParser
    from svt_av1_psy_tpu.entropy.frame_context import FrameContext
    data, _ = vb_stream
    _, pkts = read_ivf(data)
    seq = None
    for t, _, _, p in parse_obus(pkts[0][1]):
        if t == ObuType.SEQUENCE_HEADER:
            seq = parse_sequence_header(p)
        elif t == ObuType.FRAME:
            fi = parse_frame_header(p, seq)
            assert fi.delta_q_present
            mi_r = 2 * ((seq.height + 7) >> 3)
            mi_c = 2 * ((seq.width + 7) >> 3)
            tp = TileParser(FrameContext(fi.base_q_idx),
                            p[fi.header_bytes:], mi_r, mi_c,
                            tx_mode_select=fi.tx_mode_select,
                            reduced_tx_set=fi.reduced_tx_set,
                            enable_filter_intra=seq.enable_filter_intra,
                            delta_q_present=True,
                            base_q_idx=fi.base_q_idx,
                            delta_q_res_log2=fi.delta_q_res_log2,
                            cdef_bits=fi.cdef_bits)
            tp.parse_tile()
            qs = {b.qindex for b in tp.blocks}
            assert len(qs) > 1


def test_vb_ippp_bitexact():
    """Variance boost on a key + P-frame chain stays bit-exact."""
    import io as _io

    from svt_av1_psy_tpu.decoder import dav1d
    from svt_av1_psy_tpu.decoder.driver import decode_ivf
    from svt_av1_psy_tpu.models.intra_encoder import IntraEncoder
    W, H = 128, 128
    rng = np.random.default_rng(3)
    base = rng.integers(40, 200, (H + 16, W + 16)).astype(np.uint8)
    enc = IntraEncoder(W, H, qindex=120, use_device_search=False)
    enc.enable_variance_boost = True
    enc.gop_size = 0
    outs = []
    for t in range(3):
        y = base[t:t + H, 2 * t:2 * t + W]
        y = np.ascontiguousarray(y)
        y[:32, :32] = 128          # flat low-variance corner
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 140, np.uint8)
        outs.append(enc.encode_frame(y, u, v))
    buf = _io.BytesIO()
    w = IvfWriter(buf, W, H)
    for i, o in enumerate(outs):
        w.write_frame(o.payload, i)
    w.close()
    dec = decode_ivf(buf.getvalue())
    ref = dav1d.decode_ivf(buf.getvalue())
    for i, (o, d) in enumerate(zip(outs, dec)):
        r = ref[i][0] if isinstance(ref[i], tuple) else ref[i].y
        np.testing.assert_array_equal(d.y, o.recon_y)
        np.testing.assert_array_equal(r, o.recon_y)
