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
