"""Tune-3 PSY path features: SSIM-weighted candidate distortion
(ref Source/Lib/Codec/full_loop.c:2220-2290, mode_decision.c:5118) and
max-32-tx-size (ref README.md:67-69). Streams must change vs off, stay
dav1d + own-decoder bit-exact, and the max-32 stream must contain no
64-side transform.
"""

import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder


def _clip(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    base = np.add.outer(np.linspace(50, 190, h), np.linspace(0, 45, w))
    for t in range(n):
        y = np.clip(base + 25 * np.sin(np.arange(w) / 13 + 0.4 * t)
                    + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(rng.normal(118, 6, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(rng.normal(130, 6, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        out.append((np.roll(y, 2 * t, axis=1), u, v))
    return out


def _ivf(w, h, pkts):
    buf = io.BytesIO()
    with IvfWriter(buf, w, h) as wr:
        for i, p in enumerate(pkts):
            wr.write_frame(p, i)
    return buf.getvalue()


def _encode(frames, w, h, **attrs):
    enc = FastIntraEncoder(w, h, qindex=attrs.pop("qindex", 120))
    for k, v in attrs.items():
        setattr(enc, k, v)
    pkts, recs = [], []
    for f in frames:
        o = enc.encode_frame(*f)
        pkts.append(o.payload)
        recs.append((o.recon_y, o.recon_u, o.recon_v))
    return _ivf(w, h, pkts), recs


def _assert_conformant(data, recs, n):
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode

    dec_own = own_decode(data)
    dec_dav = dav_decode(data)
    assert len(dec_own) == len(dec_dav) == n
    for (ry, ru, rv), o, d in zip(recs, dec_own, dec_dav):
        assert np.array_equal(o.y, ry) and np.array_equal(d.y, ry)
        assert np.array_equal(o.u, ru) and np.array_equal(d.u, ru)
        assert np.array_equal(o.v, rv) and np.array_equal(d.v, rv)


@pytest.mark.parametrize("gop", [1, 4])
def test_tune3_ssim_distortion_conformant(gop):
    frames = _clip(192, 128, 4, seed=6)
    off, _ = _encode(frames, 192, 128, gop_size=gop)
    on, recs = _encode(frames, 192, 128, gop_size=gop, tune_ssim=True,
                       obmc_search=gop != 1, warp_search=gop != 1)
    assert on != off, "tune 3 SSIM distortion must change decisions"
    _assert_conformant(on, recs, len(frames))


def test_max_32_tx_size():
    frames = _clip(192, 128, 2, seed=1)
    data, recs = _encode(frames, 192, 128, tx_split_search=True,
                         max_tx32=True, qindex=60)
    _assert_conformant(data, recs, len(frames))
    # no 64-side transform on any coded block: observe the tx sizes the
    # conformance decoder dequantizes at
    import svt_av1_psy_tpu.decoder.reconstruct as R
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    seen = set()
    orig = R.dequant_coeffs

    def spy(qcoeff, ts, pq, iqm=None):
        seen.add(int(ts))
        return orig(qcoeff, ts, pq, iqm=iqm)

    R.dequant_coeffs = spy
    try:
        own_decode(data)
    finally:
        R.dequant_coeffs = orig
    assert seen, "expected coded blocks"
    assert not seen & {4, 11, 12, 17, 18}, seen  # 64-side TX sizes


def test_api_tune3_route():
    """Tune 3 via the public API arms SSIM distortion + noise-norm."""
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig, Tune

    cfg = EncoderConfig(enc_mode=10, qp=35, tune=Tune(3),
                        intra_period_length=0)
    enc = Encoder(cfg, 64, 64)
    assert enc._enc.tune_ssim
    assert enc._enc.noise_norm == 3
