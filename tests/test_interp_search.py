"""Per-block interpolation-filter search (is_filter_switchable).

The fast-path inter walk tail-searches REGULAR/SMOOTH/SHARP on the
winner's luma prediction (pred-domain SSE + exact symbol rate), codes
the switchable_interp symbol with the neighbor-filter context, and uses
the chosen kernel for luma + chroma MC (ref enc_inter_prediction
interpolation_filter_search; spec 5.11.27 read_mb_interp_filter).
"""
import io

import numpy as np


def _clip_frames(n=5, w=192, h=128, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = rng.normal(0, 1, (h * 2, w * 2)).astype(np.float32)
    from numpy.fft import irfft2, rfft2
    F = rfft2(base)
    fy = np.fft.fftfreq(h * 2)[:, None]
    fx = np.fft.rfftfreq(w * 2)[None, :]
    F *= np.exp(-((fx ** 2 + fy ** 2) * 500))
    tex = irfft2(F, s=(h * 2, w * 2))
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-9)
    out = []
    for t in range(n):
        sx = xx + 2.7 * t         # non-integer velocity -> subpel MVs
        sy = yy + 1.3 * t
        x0 = np.clip(sx.astype(np.int32), 0, w * 2 - 2)
        y0 = np.clip(sy.astype(np.int32), 0, h * 2 - 2)
        fxw, fyw = sx - x0, sy - y0
        p = (tex[y0, x0] * (1 - fxw) * (1 - fyw) +
             tex[y0, x0 + 1] * fxw * (1 - fyw) +
             tex[y0 + 1, x0] * (1 - fxw) * fyw +
             tex[y0 + 1, x0 + 1] * fxw * fyw)
        y = np.clip(40 + 180 * p, 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 119, np.uint8)
        v = np.full((h // 2, w // 2), 131, np.uint8)
        out.append((y, u, v))
    return out


def test_interp_filter_search_bit_exact_and_helps():
    from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder

    frames = _clip_frames()
    w, h = 192, 128
    results = {}
    for search in (False, True):
        enc = FastIntraEncoder(w, h, qindex=120)
        enc.gop_size = 8
        enc.interp_search = search
        buf = io.BytesIO()
        wr = IvfWriter(buf, w, h)
        for i, (y, u, v) in enumerate(frames):
            wr.write_frame(enc.encode_frame(y, u, v).payload, i)
        wr.close()
        data = buf.getvalue()
        own = own_decode(data)
        dav = dav1d_decode(data)
        assert len(own) == len(dav) == len(frames)
        for i, (a, b) in enumerate(zip(own, dav)):
            np.testing.assert_array_equal(a.y, b.y, err_msg=f"f{i} y")
            np.testing.assert_array_equal(a.u, b.u, err_msg=f"f{i} u")
            np.testing.assert_array_equal(a.v, b.v, err_msg=f"f{i} v")
        mse = np.mean([(f[0].astype(np.float64) - np.asarray(d.y)) ** 2
                       for f, d in zip(frames, dav)])
        results[search] = (len(data), mse)
    b0, m0 = results[False]
    b1, m1 = results[True]
    # the search must pay for itself in RD terms on subpel-motion content
    assert b1 * (m1 + 1) <= b0 * (m0 + 1) * 1.02, (results,)
