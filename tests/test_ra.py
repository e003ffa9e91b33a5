"""Random-access pyramid (models/ra.py): dav1d bit-exactness, display
order, keyint boundaries, API routing.

The RA structure encodes mini-GoPs out of order: hidden anchors
(show_frame=0) + show_existing_frame display TUs, each frame predicting
frame-level from the nearest coded past or future anchor (ref
pd_process.c GoP typing / packetization_process.c emission order).
"""
import numpy as np
import pytest

from svt_av1_psy_tpu.decoder.dav1d import decode_obus
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
from svt_av1_psy_tpu.models.ra import RaDriver

W, H = 176, 144


def _frames(n, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (H, W)).astype(np.float64)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, 2 * i, axis=1) +
                    rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint16)
        u = np.clip(120 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        v = np.clip(136 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        out.append((y, u, v))
    return out


def _encode(frames, levels, keyint=0, tf=0):
    enc = FastIntraEncoder(W, H, qindex=120)
    enc.gop_size = 0
    drv = RaDriver(enc, gop_levels=levels, keyint=keyint, tf_strength=tf)
    pkts = []
    for (y, u, v) in frames:
        pkts += drv.push(y, u, v)
    pkts += drv.flush()
    return pkts


def _check(frames, pkts):
    shown = [p for p in pkts if p.display_idx >= 0]
    assert [p.display_idx for p in shown] == list(range(len(frames))), \
        "shown TUs must come out in display order"
    decoded = decode_obus(b"".join(p.payload for p in pkts))
    assert len(decoded) == len(frames)
    for i, d in enumerate(decoded):
        ry, ru, rv = shown[i].recon
        assert np.array_equal(d.y, ry), f"display {i} Y not bit-exact"
        assert np.array_equal(d.u, ru), f"display {i} U not bit-exact"
        assert np.array_equal(d.v, rv), f"display {i} V not bit-exact"


@pytest.mark.parametrize("levels,n", [(2, 9), (3, 17)])
def test_ra_bit_exact_full_gops(levels, n):
    frames = _frames(n)
    _check(frames, _encode(frames, levels))


def test_ra_partial_tail_gop():
    # 12 frames at L=3: one full 8-GoP + a 3-frame tail via flush()
    frames = _frames(12)
    _check(frames, _encode(frames, 3))


def test_ra_keyint_boundary():
    # key every 6 displayed frames forces partial GoPs + mid-stream keys
    frames = _frames(14)
    _check(frames, _encode(frames, 2, keyint=6))


def test_ra_temporal_filter():
    frames = _frames(9)
    _check(frames, _encode(frames, 2, tf=3))


def test_ra_hidden_anchor_packets():
    frames = _frames(9)
    pkts = _encode(frames, 2)
    hidden = [p for p in pkts if p.display_idx < 0]
    shows = [p for p in pkts if p.display_idx >= 0 and len(p.payload) < 32]
    # 2 GoPs of 4: each has an ARF + one mid anchor hidden, then shown
    # via tiny show_existing TUs
    assert len(hidden) >= 3
    assert len(shows) == len(hidden)
    for p in hidden:
        assert p.recon is None


def test_ra_api_routing():
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    cfg = EncoderConfig(enc_mode=12, qp=30, intra_period_length=-1,
                        hierarchical_levels=2, tf_strength=0)
    enc = Encoder(cfg, W, H)
    assert enc._ra is not None
    with pytest.raises(AssertionError):
        enc.encode(*_frames(1)[0])
    frames = _frames(5)
    pkts = []
    for f in frames:
        pkts += enc.send_picture(*f)
    pkts += enc.flush()
    shown = [p for p in pkts if p.display_idx >= 0]
    assert len(shown) == len(frames)
    decoded = decode_obus(b"".join(p.payload for p in pkts))
    assert len(decoded) == len(frames)


def test_ra_scene_cut_rekeys():
    """Picture decision: a scene cut closes the pending mini-GoP and
    keys on the cut frame (ref pic_analysis scene_change_detection ->
    pd_process GoP typing); the stream stays dav1d bit-exact."""
    rng = np.random.default_rng(7)
    a = rng.integers(30, 120, (H, W)).astype(np.uint16)
    b = rng.integers(140, 250, (H, W)).astype(np.uint16)   # hard cut
    frames = []
    for i in range(11):
        base = a if i < 6 else b
        y = np.clip(base + rng.normal(0, 2, (H, W)), 0, 255) \
            .astype(np.uint16)
        u = np.full((H // 2, W // 2), 120, np.uint16)
        v = np.full((H // 2, W // 2), 136, np.uint16)
        frames.append((y, u, v))
    enc = FastIntraEncoder(W, H, qindex=120)
    enc.gop_size = 0
    enc.enable_scenecut = True
    drv = RaDriver(enc, gop_levels=2, keyint=0)
    pkts = []
    for f in frames:
        pkts += drv.push(*f)
    pkts += drv.flush()
    _check(frames, pkts)
    # the cut frame must be a KEY frame (frame_type 0)
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    seq = None
    hints = [0] * 8
    keys = 0
    for p in pkts:
        for t, _, _, pl in parse_obus(p.payload):
            if t == ObuType.SEQUENCE_HEADER:
                seq = parse_sequence_header(pl)
            elif t == ObuType.FRAME:
                fi = parse_frame_header(pl, seq, ref_order_hints=hints)
                keys += fi.frame_type == 0
                for i in range(8):
                    if fi.refresh_frame_flags & (1 << i) or \
                            fi.frame_type == 0:
                        hints[i] = fi.order_hint
    assert keys >= 2, f"expected a re-key at the cut, saw {keys} keys"


def test_dynamic_mini_gop():
    """Dynamic mini-GoP (ref Docs/Appendix-Dynamic-Mini-GoP): high
    buffered motion closes the group early at a power-of-two size; calm
    content keeps the full pyramid. Streams stay dav1d bit-exact."""
    import io
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import numpy as np
    from make_test_clip import make_frame
    from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
    from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
    from svt_av1_psy_tpu.models.ra import RaDriver
    W, H = 320, 192
    rng = np.random.default_rng(9)
    frames = [make_frame(W, H, t, 8, 0.01, rng) for t in range(8)]
    for t in range(8):
        y = rng.integers(0, 255, (H, W)).astype(np.uint8)
        u = np.full((H // 2, W // 2), 128, np.uint8)
        frames.append((y, u, u.copy()))
    enc = FastIntraEncoder(W, H, qindex=120, n_cands=2, n_tiles=1)
    drv = RaDriver(enc, gop_levels=3, dynamic_gop=True)
    pkts = []
    batches = []
    for f in frames:
        got = drv.push(*f)
        if got:
            batches.append(len(got))
        pkts.extend(got)
    pkts.extend(drv.flush())
    # the calm 8-frame pyramid emits one big batch; the noisy section
    # must close early (small batches)
    assert max(batches) >= 10, batches
    assert any(b <= 4 for b in batches[1:]), batches
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
