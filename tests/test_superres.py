"""Super-resolution (spec 5.9.8 superres_params / 7.16 normative upscale).

The fast path codes every frame at the horizontally downscaled width
(denom 9..16) and signals the normative 64-phase 8-tap upscale; the
upscaler runs per tile column with the subpel accumulator carried
across tiles and taps clamped at the mi-area edges (validated bit-exact
against dav1d, which libaom's decoder corroborates). Encoder recon ==
dav1d output is the conformance bar; the own decoder cross-checks every
width class (the python loop filter now gates mi units past the display
dims exactly like the native path / spec 7.14.1).
"""
import io
import os
import sys

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _clip(W, H, n=2):
    from make_test_clip import make_frame
    rng = np.random.default_rng(3)
    return [make_frame(W, H, t, 8, 0.02, rng) for t in range(n)]


def _encode(W, H, frames, den, nt):
    enc = FastIntraEncoder(W, H, qindex=120, n_cands=2,
                           superres_denom=den, n_tiles=nt)
    outs = [enc.encode_frame(*f) for f in frames]
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H)
    for i, o in enumerate(outs):
        w.write_frame(o.payload, i)
    w.close()
    return enc, outs, buf.getvalue()


@pytest.mark.parametrize("nt,den", [(1, 12), (4, 16), (2, 9), (4, 13),
                                    (3, 14), (1, 10)])
def test_superres_encode_dav1d_bit_exact(nt, den):
    W, H = 640, 360
    frames = _clip(W, H)
    enc, outs, data = _encode(W, H, frames, den, nt)
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav
    d = dav(data)
    assert d[0].y.shape == (H, W), "output must be the upscaled size"
    for i, (a, o) in enumerate(zip(d, outs)):
        assert np.array_equal(a.y, o.recon_y), f"frame {i} luma"
        assert np.array_equal(a.u, o.recon_u), f"frame {i} u"
        assert np.array_equal(a.v, o.recon_v), f"frame {i} v"


@pytest.mark.parametrize("nt,den", [(4, 16), (2, 15), (1, 10),
                                    (1, 12), (2, 9)])
def test_superres_own_decoder(nt, den):
    W, H = 640, 360
    frames = _clip(W, H)
    enc, outs, data = _encode(W, H, frames, den, nt)
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own
    o2 = own(data)
    for i, (a, o) in enumerate(zip(o2, outs)):
        assert np.array_equal(a.y, o.recon_y), f"frame {i} luma"
        assert np.array_equal(a.u, o.recon_u), f"frame {i} u"
        assert np.array_equal(a.v, o.recon_v), f"frame {i} v"


def test_superres_saves_bits_at_similar_quality():
    W, H = 640, 360
    frames = _clip(W, H)
    _, outs_sr, _ = _encode(W, H, frames, 12, 1)
    enc = FastIntraEncoder(W, H, qindex=120, n_cands=2, n_tiles=1)
    outs = [enc.encode_frame(*f) for f in frames]
    b_sr = sum(len(o.payload) for o in outs_sr)
    b = sum(len(o.payload) for o in outs)
    assert b_sr < b, (b_sr, b)


def test_superres_via_api():
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig
    W, H = 320, 192
    cfg = EncoderConfig(enc_mode=12, qp=30, intra_period_length=0,
                        superres_mode=1, superres_denom=12)
    enc = Encoder(cfg, W, H)
    frames = _clip(W, H, 1)
    out = enc.encode(*frames[0])
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H)
    w.write_frame(out.payload, 0)
    w.close()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav
    d = dav(buf.getvalue())
    assert d[0].y.shape == (H, W)
    assert np.array_equal(d[0].y, out.recon_y)
