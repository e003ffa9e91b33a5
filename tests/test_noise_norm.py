"""PSY noise normalization (ref Source/Lib/Codec/full_loop.c:1464).

Encode-pass-only AC coefficient revival: the stream changes, stays
conformant (dav1d + own decoder bit-exact vs the encoder recon), and
AC energy in the recon goes UP vs noise-norm off (the feature's whole
point: flat/texture areas keep more of the source's high-freq energy).
"""

import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder


def _clip(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    base = np.add.outer(np.linspace(60, 180, h), np.linspace(0, 40, w))
    for t in range(n):
        y = np.clip(base + rng.normal(0, 7, (h, w)) + 3 * t, 0,
                    255).astype(np.uint8)
        u = np.clip(rng.normal(118, 5, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(rng.normal(130, 5, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        out.append((y, u, v))
    return out


def _ivf(w, h, pkts):
    buf = io.BytesIO()
    with IvfWriter(buf, w, h) as wr:
        for i, p in enumerate(pkts):
            wr.write_frame(p, i)
    return buf.getvalue()


def _ac_energy(y):
    g = np.abs(np.diff(y.astype(np.int64), axis=1)).sum() + \
        np.abs(np.diff(y.astype(np.int64), axis=0)).sum()
    return int(g)


@pytest.mark.parametrize("gop", [1, 4])
def test_noise_norm_conformant_and_energizing(gop):
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode

    frames = _clip(176, 144, 4, seed=9)
    res = {}
    for nn in (0, 3):
        enc = FastIntraEncoder(176, 144, qindex=150)
        enc.gop_size = gop
        enc.noise_norm = nn
        pkts, recs = [], []
        for f in frames:
            o = enc.encode_frame(*f)
            pkts.append(o.payload)
            recs.append((o.recon_y, o.recon_u, o.recon_v))
        res[nn] = (_ivf(176, 144, pkts), recs)
    assert res[0][0] != res[3][0], "noise-norm must change the stream"

    data, recs = res[3]
    dec_own = own_decode(data)
    dec_dav = dav_decode(data)
    for (ry, ru, rv), o, d in zip(recs, dec_own, dec_dav):
        assert np.array_equal(o.y, ry) and np.array_equal(d.y, ry)
        assert np.array_equal(o.u, ru) and np.array_equal(d.u, ru)
        assert np.array_equal(o.v, rv) and np.array_equal(d.v, rv)

    # energy preservation: summed luma gradient energy of the recon rises
    e_off = sum(_ac_energy(r[0]) for r in res[0][1])
    e_on = sum(_ac_energy(r[0]) for r in res[3][1])
    assert e_on > e_off


def test_noise_norm_strength_threshold_order():
    """Higher strength (lower ratio threshold) revives at least as many
    coefficients: stream size is monotone non-decreasing in strength on
    noisy content."""
    frames = _clip(176, 144, 2, seed=4)
    sizes = []
    for nn in (1, 4):
        enc = FastIntraEncoder(176, 144, qindex=150)
        enc.noise_norm = nn
        sizes.append(sum(len(enc.encode_frame(*f).payload) for f in frames))
    assert sizes[1] >= sizes[0]
