"""MFMV (motion field motion vectors) + default-toolset decode conformance.

ref_default_p6.ivf / ref_default_p4_10b.ivf are reference SvtAv1EncApp
encodes with ALL DEFAULT tools enabled — use_ref_frame_mvs (MFMV, spec
7.9), DLF/CDEF/restoration, temporal filtering, compound prediction,
OBMC/warp, global motion — i.e. what a user of the reference gets out of
the box. Decoding these bit-exactly vs dav1d covers the saved motion
field (spec 7.20), the motion field projection (7.9.2), and the temporal
MV stack candidates (7.10.2 add_tpl_ref_mv) end to end.
"""
import os

import numpy as np
import pytest

_DIR = os.path.join(os.path.dirname(__file__), "golden", "streams_inter")


@pytest.mark.parametrize("name", ["ref_default_p6.ivf",
                                  "ref_default_p4_10b.ivf"])
def test_default_stream_decode_matches_dav1d(name):
    data = open(os.path.join(_DIR, name), "rb").read()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    own = own_decode(data)
    dav = dav1d_decode(data)
    assert len(own) == len(dav) == 16
    for i, (a, b) in enumerate(zip(own, dav)):
        assert np.array_equal(a.y, b.y), f"frame {i} luma"
        assert np.array_equal(a.u, b.u), f"frame {i} u"
        assert np.array_equal(a.v, b.v), f"frame {i} v"


def test_default_stream_uses_mfmv():
    from svt_av1_psy_tpu.bitstream.ivf import read_ivf
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    data = open(os.path.join(_DIR, "ref_default_p6.ivf"), "rb").read()
    _, pkts = read_ivf(data)
    seq = None
    n_mfmv = 0
    hints = [0] * 8
    for _, payload in pkts:
        for t, _, _, p in parse_obus(payload):
            if t == ObuType.SEQUENCE_HEADER:
                seq = parse_sequence_header(p)
            elif t == ObuType.FRAME:
                fi = parse_frame_header(p, seq, ref_order_hints=hints)
                if fi.use_ref_frame_mvs:
                    n_mfmv += 1
                if not fi.show_existing_frame:
                    for i in range(8):
                        if fi.refresh_frame_flags & (1 << i) or \
                                fi.frame_type == 0:
                            hints[i] = fi.order_hint
    assert n_mfmv >= 5, f"default stream should use MFMV: {n_mfmv}"


def test_mv_projection_div_mult():
    """get_mv_projection fixed-point reciprocals (spec 7.9.3)."""
    from svt_av1_psy_tpu.inter.mvref import DIV_MULT, mv_projection
    for d in range(1, 32):
        assert DIV_MULT[d] == round(16384 / d) or \
            abs(DIV_MULT[d] - 16384 // d) <= 1
    assert mv_projection((64, -32), 2, 4) == (32, -16)
    assert mv_projection((7, -7), 1, 2) == (4, -4)   # round away from 0
    assert mv_projection((0, 0), 5, 1) == (0, 0)


# ---- encoder-side MFMV (fast path, spec 7.9 projection in C) -----------

def _enc_frames(n, seed=5, W=176, H=144):
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (H + 64, W + 64)).astype(np.float64)
    out = []
    for i in range(n):
        dx = (3 * i) % 32
        y = np.clip(base[8:8 + H, dx:dx + W] +
                    rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint16)
        u = np.clip(120 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        v = np.clip(136 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        out.append((y, u, v))
    return out


def _encode_ld(mfmv, n=9, levels=2):
    from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
    enc = FastIntraEncoder(176, 144, qindex=120)
    enc.gop_size = 0
    enc.hierarchical_levels = levels
    enc.enable_mfmv = mfmv
    enc.seq.enable_ref_frame_mvs = mfmv
    payload = b""
    recons = []
    for y, u, v in _enc_frames(n):
        ef = enc.encode_frame(y, u, v)
        payload += ef.payload
        recons.append((ef.recon_y, ef.recon_u, ef.recon_v))
    return payload, recons


def test_encoder_mfmv_dav1d_bit_exact():
    """Fast-path LD pyramid with MFMV on: temporal candidates in the C
    ref-MV stacks (native/inter_backend.c tpl_add) must agree with
    dav1d's own projection (spec 7.9/7.10.2), else recon diverges."""
    from svt_av1_psy_tpu.decoder.dav1d import decode_obus
    payload, recons = _encode_ld(True)
    dec = decode_obus(payload)
    assert len(dec) == len(recons)
    for d, (ry, ru, rv) in zip(dec, recons):
        assert np.array_equal(d.y, ry)
        assert np.array_equal(d.u, ru)
        assert np.array_equal(d.v, rv)


def test_encoder_mfmv_own_decoder_and_header():
    """Our conformance decoder agrees, and the header actually signals
    use_ref_frame_mvs (spec 5.9.2)."""
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    from svt_av1_psy_tpu.decoder.driver import Decoder
    payload, recons = _encode_ld(True)
    d = Decoder()
    d.decode_temporal_unit(payload)
    assert len(d.frames) == len(recons)
    for fr, (ry, ru, rv) in zip(d.frames, recons):
        assert np.array_equal(fr.y, ry)
        assert np.array_equal(fr.u, ru)
        assert np.array_equal(fr.v, rv)
    seq = None
    hints = [0] * 8
    n_rfm = 0
    for t, _, _, p in parse_obus(payload):
        if t == ObuType.SEQUENCE_HEADER:
            seq = parse_sequence_header(p)
        elif t == ObuType.FRAME:
            fi = parse_frame_header(p, seq, ref_order_hints=hints)
            n_rfm += bool(fi.use_ref_frame_mvs)
            for i in range(8):
                if fi.refresh_frame_flags & (1 << i) or fi.frame_type == 0:
                    hints[i] = fi.order_hint
    assert seq.enable_ref_frame_mvs
    assert n_rfm >= 6


def test_encoder_mfmv_helps_rate():
    """Temporal MV candidates should cut bitrate at fixed q (better
    NEAREST/NEAR predictions -> smaller MV costs + residuals)."""
    b_off, _ = _encode_ld(False)
    b_on, _ = _encode_ld(True)
    assert len(b_on) < len(b_off), (len(b_on), len(b_off))
