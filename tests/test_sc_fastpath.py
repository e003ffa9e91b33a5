"""Screen-content key frames in the fast path (--scm 2 detection;
ref pic_analysis_process.c SC detector + palette.c/hash_motion.c
searches): detected keys route through the full-RD palette+IBC intra
path, and inter frames referencing them stay conformant."""

import numpy as np

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig


def _text_frame(w, h, t):
    y = np.full((h, w), 235, np.uint8)
    y[: h // 8, :] = 64
    r = np.random.default_rng(5)
    for _ in range(40):
        gx = int(r.integers(4, w - 12))
        gy = int(r.integers(h // 8 + 4, h - 8))
        y[gy:gy + 2, gx:gx + int(r.integers(2, 9))] = 16
    sh = h // 4
    y[h - sh:, :] = np.roll(y[h - sh:, :], -(2 * t) % sh, axis=0)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    return y, u, v


def test_sc_key_ra_stream_decodes():
    W, H = 192, 128
    frames = [_text_frame(W, H, t) for t in range(10)]
    cfg = EncoderConfig(enc_mode=8, qp=30, intra_period_length=-1,
                        hierarchical_levels=2, tf_strength=0,
                        enable_tpl_la=0)
    enc = Encoder(cfg, W, H, bit_depth=8)
    assert getattr(enc._enc, "scm_auto", False)
    sc_routed = []
    orig = type(enc._enc)._encode_key_sc

    def spy(self, y, u, v, order_hint=None):
        sc_routed.append(True)
        return orig(self, y, u, v, order_hint)

    type(enc._enc)._encode_key_sc = spy
    try:
        payload = b""
        shown = 0
        recons = {}
        for f in frames:
            for p in enc.send_picture(*f):
                payload += p.payload
                if p.display_idx >= 0:
                    shown += 1
                    recons[p.display_idx] = tuple(p.recon)
        for p in enc.flush():
            payload += p.payload
            if p.display_idx >= 0:
                shown += 1
                recons[p.display_idx] = tuple(p.recon)
        enc.close()
    finally:
        type(enc._enc)._encode_key_sc = orig
    assert sc_routed, "text content must route the key through SC"
    assert shown == len(frames)

    # conformance: both decoders, bit-exact against our recon
    from svt_av1_psy_tpu.decoder.dav1d import decode_obus

    dav = decode_obus(payload)
    assert len(dav) == len(frames)
    for i, df in enumerate(dav):
        ry, ru, rv = recons[i]
        assert np.array_equal(df.y, ry), f"frame {i} Y mismatch"
        assert np.array_equal(df.u, ru), f"frame {i} U mismatch"
        assert np.array_equal(df.v, rv), f"frame {i} V mismatch"

    import io

    from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H, 30)
    w.write_frame(payload, 0)
    w.close()
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_ivf
    own_frames = own_ivf(buf.getvalue())
    assert len(own_frames) == len(frames)

    # the SC key must actually be cheap + near-lossless on this content
    key = recons[0]
    src = frames[0]
    assert np.array_equal(key[0], src[0]) or \
        float(np.mean((key[0].astype(np.int32) - src[0]) ** 2)) < 2.0


def test_encoder_close_joins_threads():
    import threading

    W, H = 128, 128
    rng = np.random.default_rng(0)
    frames = [(rng.integers(0, 255, (H, W), np.uint8),
               rng.integers(0, 255, (H // 2, W // 2), np.uint8),
               rng.integers(0, 255, (H // 2, W // 2), np.uint8))
              for _ in range(6)]
    cfg = EncoderConfig(enc_mode=12, qp=35, intra_period_length=0)
    with Encoder(cfg, W, H, bit_depth=8) as enc:
        for f in frames:
            enc.send_picture(*f)
    # after close: no deferred-filter threads alive
    assert not enc._enc._pending_filters
