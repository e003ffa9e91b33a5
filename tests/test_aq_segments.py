"""Encoder-side aq-mode 1: variance-based AV1 segments (the reference's
svt_aom_setup_segmentation / find_segment_qps role) in the slow path —
segmentation header + spatially-coded segment maps + per-segment ALT_Q.
Round-trips bit-exact through dav1d and our own conformance decoder."""
import io

import numpy as np


def test_aq1_segments_bit_exact():
    from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.bitstream.ivf import read_ivf
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    from svt_av1_psy_tpu.models.intra_encoder import IntraEncoder

    rng = np.random.default_rng(7)
    w, h = 192, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y = np.where(xx < w // 2, 90.0,
                 90 + 70 * np.sin(xx * 0.5) * np.cos(yy * 0.4))
    y = np.clip(y + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)

    enc = IntraEncoder(w, h, qindex=140)
    enc.aq_mode = 1
    out = enc.encode_frame(y, u, v)
    buf = io.BytesIO()
    wr = IvfWriter(buf, w, h)
    wr.write_frame(out.payload, 0)
    wr.close()
    data = buf.getvalue()
    dav = dav1d_decode(data)
    own = own_decode(data)
    np.testing.assert_array_equal(np.asarray(dav[0].y), out.recon_y)
    np.testing.assert_array_equal(own[0].y, dav[0].y)
    np.testing.assert_array_equal(own[0].u, dav[0].u)
    np.testing.assert_array_equal(own[0].v, dav[0].v)

    _, pkts = read_ivf(data)
    seq = None
    for t, _, _, p in parse_obus(pkts[0][1]):
        if t == ObuType.SEQUENCE_HEADER:
            seq = parse_sequence_header(p)
        elif t == ObuType.FRAME:
            fi = parse_frame_header(p, seq)
            assert fi.segmentation_enabled
            deltas = {fi.seg_feature_data[i][0] for i in range(8)
                      if fi.seg_feature_enabled[i][0]}
            assert len(deltas) >= 3, deltas
