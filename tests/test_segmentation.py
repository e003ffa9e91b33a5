"""Segmentation decode (spec 5.9.14 / 5.11.14): aq-mode-1 streams.

ref_aq1_seg_p8.ivf is a reference SvtAv1EncApp --aq-mode 1 encode:
variance-based AV1 segments with per-segment ALT_Q deltas, spatially
coded segment maps (neg-interleave coding with the neighbor-prediction
contexts), feature-data persistence across frames, and the per-segment
qindex derivation (spec 7.12.2 get_qindex).
"""
import os

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "golden", "streams_inter")


def test_aq1_segmentation_decode_matches_dav1d():
    data = open(os.path.join(_DIR, "ref_aq1_seg_p8.ivf"), "rb").read()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    own = own_decode(data)
    dav = dav1d_decode(data)
    assert len(own) == len(dav) == 16
    for i, (a, b) in enumerate(zip(own, dav)):
        assert np.array_equal(a.y, b.y), f"frame {i} luma"
        assert np.array_equal(a.u, b.u), f"frame {i} u"
        assert np.array_equal(a.v, b.v), f"frame {i} v"


def test_stream_has_multiple_segments():
    from svt_av1_psy_tpu.bitstream.ivf import read_ivf
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    data = open(os.path.join(_DIR, "ref_aq1_seg_p8.ivf"), "rb").read()
    _, pkts = read_ivf(data)
    seq = None
    qdeltas = set()
    for _, payload in pkts:
        for t, _, _, p in parse_obus(payload):
            if t == ObuType.SEQUENCE_HEADER:
                seq = parse_sequence_header(p)
            elif t == ObuType.FRAME:
                fi = parse_frame_header(p, seq)
                assert fi.segmentation_enabled
                for i in range(8):
                    if fi.seg_feature_enabled[i][0]:
                        qdeltas.add(fi.seg_feature_data[i][0])
    assert len(qdeltas) >= 3, qdeltas


def test_neg_deinterleave_roundtrip():
    from svt_av1_psy_tpu.decoder.tile_parser import _neg_deinterleave

    def neg_interleave(x, ref, mx):
        d = x - ref
        if not ref:
            return x
        if ref >= mx - 1:
            return -x + mx - 1
        lim = ref if 2 * ref < mx else mx - ref - 1
        if abs(d) <= lim:
            return (d << 1) - 1 if d > 0 else (-d) << 1
        return x if 2 * ref < mx else (mx - 1) - x

    for mx in (2, 3, 5, 8):
        for ref in range(mx):
            for x in range(mx):
                assert _neg_deinterleave(neg_interleave(x, ref, mx),
                                         ref, mx) == x, (x, ref, mx)
