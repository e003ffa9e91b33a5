"""Fast-path CfL chroma prediction (spec 7.11.5).

The C walk trials a CfL candidate per chroma block: least-squares alpha
from the RECONSTRUCTED luma AC (twin of ops/intra.cfl_luma_ac/cfl_pred),
+-1 refinement, exact cfl_sign/cfl_alpha symbol rates (ref CfL alpha RD
in product_coding_loop.c). dav1d validates the streams bit-exact.
"""
import io

import numpy as np

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder


def _correlated_frame(W=320, H=192, seed=5):
    rng = np.random.default_rng(seed)
    y = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.float64)
    y += rng.normal(0, 6, (H, W))
    y = np.clip(y, 0, 255).astype(np.uint8)
    ys = y.reshape(H // 2, 2, W // 2, 2).mean((1, 3))
    u = np.clip(128 + (ys - 128) * 0.55, 0, 255).astype(np.uint8)
    v = np.clip(128 - (ys - 128) * 0.45, 0, 255).astype(np.uint8)
    return y, u, v


def _run(cfl, frame, W=320, H=192):
    enc = FastIntraEncoder(W, H, qindex=100, n_cands=3, n_tiles=1)
    enc.cfl_search = cfl
    out = enc.encode_frame(*frame)
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H)
    w.write_frame(out.payload, 0)
    w.close()
    return out, buf.getvalue()


def test_cfl_bit_exact_and_wins_chroma():
    frame = _correlated_frame()
    out0, _ = _run(False, frame)
    out1, data = _run(True, frame)
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav
    d = dav(data)[0]
    assert np.array_equal(d.y, out1.recon_y)
    assert np.array_equal(d.u, out1.recon_u)
    assert np.array_equal(d.v, out1.recon_v)

    def cmse(o):
        return (np.mean((o.recon_u.astype(np.float64) - frame[1]) ** 2) +
                np.mean((o.recon_v.astype(np.float64) - frame[2]) ** 2))

    assert len(out1.payload) <= len(out0.payload)
    assert cmse(out1) < cmse(out0), "CfL must improve correlated chroma"

    import svt_av1_psy_tpu.decoder.reconstruct as R
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own
    n = [0]
    orig = R.FrameReconstructor._decode_block

    def patched(self, b):
        if getattr(b, "uv_mode", 0) == 13:
            n[0] += 1
        return orig(self, b)

    R.FrameReconstructor._decode_block = patched
    try:
        o2 = own(data)
    finally:
        R.FrameReconstructor._decode_block = orig
    assert np.array_equal(o2[0].y, d.y)
    assert n[0] >= 30, f"CfL should be chosen widely, got {n[0]}"


def test_cfl_10bit():
    W, H = 192, 128
    rng = np.random.default_rng(7)
    y = (np.add.outer(np.arange(H), np.arange(W)) % 1024).astype(np.float64)
    y += rng.normal(0, 12, (H, W))
    y = np.clip(y, 0, 1023).astype(np.uint16)
    ys = y.reshape(H // 2, 2, W // 2, 2).mean((1, 3))
    u = np.clip(512 + (ys - 512) * 0.5, 0, 1023).astype(np.uint16)
    v = np.clip(512 - (ys - 512) * 0.4, 0, 1023).astype(np.uint16)
    enc = FastIntraEncoder(W, H, qindex=100, bd=10, n_cands=3, n_tiles=1)
    enc.cfl_search = True
    out = enc.encode_frame(y, u, v)
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H)
    w.write_frame(out.payload, 0)
    w.close()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav
    d = dav(buf.getvalue())[0]
    assert np.array_equal(d.y, out.recon_y)
    assert np.array_equal(d.u, out.recon_u)
    assert np.array_equal(d.v, out.recon_v)
