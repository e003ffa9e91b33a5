"""Encoder-side inter-intra search (spec 5.11.28 / 7.11.3.13).

The fast-path inter walk trials the smooth II blend (DC/V/H/SMOOTH intra
prediction mixed into the single-ref MC prediction through the
ii_weights1d masks) on 8x8..32x32 single-ref blocks with exact symbol
rates (ref Source/Lib/Codec/enc_inter_prediction.c inter-intra path;
mask tables from inter/masks.py smooth_interintra_mask).
"""
import io

import numpy as np

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder


def _clip(n=8, W=320, H=192):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_clip import make_frame
    rng = np.random.default_rng(9)
    return [make_frame(W, H, t, 8, 0.04, rng) for t in range(n)], W, H


def _encode(frames, W, H, ii):
    enc = FastIntraEncoder(W, H, qindex=120, n_cands=3, n_tiles=1)
    enc.gop_size = 0
    enc.obmc_search = False
    enc.warp_search = False
    enc.interintra_search = ii
    outs = [enc.encode_frame(*f) for f in frames]
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H)
    for i, o in enumerate(outs):
        w.write_frame(o.payload, i)
    w.close()
    return outs, buf.getvalue()


def test_interintra_bit_exact_and_chosen():
    frames, W, H = _clip()
    outs, data = _encode(frames, W, H, True)
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav
    d = dav(data)
    for i, (a, o) in enumerate(zip(d, outs)):
        assert np.array_equal(a.y, o.recon_y), f"frame {i} luma"
        assert np.array_equal(a.u, o.recon_u), f"frame {i} u"
        assert np.array_equal(a.v, o.recon_v), f"frame {i} v"

    import svt_av1_psy_tpu.decoder.reconstruct as R
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own
    n_ii = [0]
    orig = R.FrameReconstructor._decode_block

    def patched(self, b):
        if getattr(b, "interintra", False):
            n_ii[0] += 1
        return orig(self, b)

    R.FrameReconstructor._decode_block = patched
    try:
        o2 = own(data)
    finally:
        R.FrameReconstructor._decode_block = orig
    assert all(np.array_equal(a.y, b.y) for a, b in zip(d, o2))
    assert n_ii[0] >= 20, "II should be chosen on noisy LD content"


def test_wedge_interintra_chosen():
    frames, W, H = _clip()
    outs, data = _encode(frames, W, H, True)
    import svt_av1_psy_tpu.decoder.reconstruct as R
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own
    n = [0]
    orig = R.FrameReconstructor._decode_block

    def patched(self, b):
        if getattr(b, "interintra", False) and getattr(b, "ii_wedge", 0):
            n[0] += 1
        return orig(self, b)

    R.FrameReconstructor._decode_block = patched
    try:
        own(data)
    finally:
        R.FrameReconstructor._decode_block = orig
    assert n[0] >= 3, f"wedge II should be chosen sometimes, got {n[0]}"


def test_interintra_saves_bits():
    frames, W, H = _clip()
    outs0, _ = _encode(frames, W, H, False)
    outs1, _ = _encode(frames, W, H, True)
    b0 = sum(len(o.payload) for o in outs0)
    b1 = sum(len(o.payload) for o in outs1)

    def psnr(outs):
        mse = np.mean([np.mean((o.recon_y.astype(np.float64)
                                - f[0]) ** 2)
                       for o, f in zip(outs, frames)])
        return 10 * np.log10(255 ** 2 / mse)

    assert b1 < b0, (b1, b0)
    assert psnr(outs1) > psnr(outs0) - 0.05


def test_all_tools_ra_bit_exact():
    """II + OBMC/warp + masked compound + interp + CfL + fi together in
    an RA pyramid (the preset-8 feature set): the II grid mark
    (RefFrame[1] = INTRA) must keep warp-sample counts in sync."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_clip import make_frame
    from svt_av1_psy_tpu.models.ra import RaDriver
    W, H = 352, 288
    rng = np.random.default_rng(9)
    frames = [make_frame(W, H, t, 8, 0.02, rng) for t in range(17)]
    enc = FastIntraEncoder(W, H, qindex=100, n_cands=3)
    for k in ("obmc_search", "warp_search", "masked_compound_search",
              "interp_search", "tx_split_search", "interintra_search",
              "cfl_search", "fi_search"):
        setattr(enc, k, True)
    drv = RaDriver(enc, gop_levels=4)
    pkts = []
    for f in frames:
        pkts.extend(drv.push(*f))
    pkts.extend(drv.flush())
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H)
    for i, p in enumerate(pkts):
        w.write_frame(p.payload, i)
    w.close()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav
    d = dav(buf.getvalue())
    recs = {p.display_idx: p.recon for p in pkts if p.display_idx >= 0}
    assert len(d) == len(frames)
    for i in range(len(d)):
        assert np.array_equal(d[i].y, recs[i][0]), f"frame {i}"
        assert np.array_equal(d[i].u, recs[i][1])
        assert np.array_equal(d[i].v, recs[i][2])
