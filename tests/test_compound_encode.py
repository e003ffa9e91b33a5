"""Encoder-side compound (bidirectional) prediction: RA frames code
LAST (past anchor) + ALTREF (future anchor) pairs with skip_mode,
NEAREST_NEARESTMV / NEAR_NEARMV / NEW_NEWMV and average blending
(native walk, ref mode_decision.c compound candidate injection +
inter_prediction.c jnt convolve). Conformance: own decoder + dav1d
bit-exact; efficiency: compound must shrink the stream on content
where bidirectional prediction helps.
"""
import io

import numpy as np
import pytest


def _moving_clip(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    big = rng.normal(0, 1, (h + 80, w + 80)).astype(np.float32)
    for _ in range(3):
        big = (big + np.roll(big, 1, 0) + np.roll(big, -1, 0) +
               np.roll(big, 1, 1) + np.roll(big, -1, 1)) / 5
    big = np.clip(128 + big * (60 / big.std()), 0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        y = big[t:t + h, 2 * t:2 * t + w].copy()
        y[40 + 2 * t:72 + 2 * t, 60 + 3 * t:92 + 3 * t] = 200
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    return frames


def _encode_ra(frames, w, h, compound=True):
    from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
    from svt_av1_psy_tpu.models.ra import RaDriver
    enc = FastIntraEncoder(w, h, qindex=120, n_tiles=1)
    drv = RaDriver(enc, gop_levels=4)
    if not compound:
        orig = drv._encode_inter

        def single_only(d, fuv, rs, refresh, show, depth, ref_slot2=None):
            return orig(d, fuv, rs, refresh, show, depth, ref_slot2=None)

        drv._encode_inter = single_only
    pkts = []
    for f in frames:
        pkts.extend(drv.push(*f))
    pkts.extend(drv.flush())
    buf = io.BytesIO()
    from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
    with IvfWriter(buf, w, h) as wr:
        for i, p in enumerate(pkts):
            wr.write_frame(p.payload, i)
    return buf.getvalue(), pkts


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_compound_ra_roundtrip_and_gain():
    w, h, n = 320, 192, 17
    frames = _moving_clip(w, h, n)
    data_c, pkts_c = _encode_ra(frames, w, h, compound=True)
    data_s, _ = _encode_ra(frames, w, h, compound=False)

    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    own = own_decode(data_c)
    assert len(own) == n
    # encoder recon == conformance decode (display order)
    shown = sorted((p for p in pkts_c if p.display_idx >= 0),
                   key=lambda p: p.display_idx)
    for i, d in enumerate(own):
        assert np.array_equal(d.y, shown[i].recon[0]), f"frame {i}"

    try:
        from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav_decode
        dav = dav_decode(data_c)
        for i, (a, b) in enumerate(zip(own, dav)):
            assert np.array_equal(a.y, b.y), f"frame {i} luma"
            assert np.array_equal(a.u, b.u), f"frame {i} u"
            assert np.array_equal(a.v, b.v), f"frame {i} v"
    except ImportError:
        pass

    # efficiency: compound must not LOSE bits, and on this motion-heavy
    # clip it should win clearly; quality stays within 0.3 dB
    assert len(data_c) < 0.9 * len(data_s), (len(data_c), len(data_s))
    py_c = np.mean([_psnr(own[i].y, frames[i][0]) for i in range(n)])
    own_s = own_decode(data_s)
    py_s = np.mean([_psnr(own_s[i].y, frames[i][0]) for i in range(n)])
    assert py_c > py_s - 0.3, (py_c, py_s)


def test_compound_blocks_in_own_stream():
    """Our RA streams actually use compound modes + skip_mode."""
    import svt_av1_psy_tpu.decoder.tile_parser as tpmod
    w, h, n = 320, 192, 9
    frames = _moving_clip(w, h, n)
    data, _ = _encode_ra(frames, w, h, compound=True)
    stats = {"comp": 0, "sm": 0, "modes": set()}
    orig = tpmod.TileParser._parse_inter_block

    def hook(self, r, c, bsize, skip, ha, hl, skip_mode=False):
        out = orig(self, r, c, bsize, skip, ha, hl, skip_mode=skip_mode)
        b = self.blocks[-1] if self.blocks else None
        if b is not None and b.is_inter and b.ref_frame2 > 0:
            stats["comp"] += 1
            stats["modes"].add(b.compound_mode)
            if b.skip_mode:
                stats["sm"] += 1
        return out

    tpmod.TileParser._parse_inter_block = hook
    try:
        from svt_av1_psy_tpu.decoder.driver import decode_ivf
        decode_ivf(data)
    finally:
        tpmod.TileParser._parse_inter_block = orig
    assert stats["comp"] > 50, stats
    assert stats["sm"] > 0, stats


def test_masked_compound_encode():
    """Encoder-side masked compound (spec 7.11.3.11-14): wedge masks from
    the normative tables + DIFFWTD from the d16 comps, comp_group_idx /
    compound_type / wedge syntax, subsampled-mask chroma blends — dav1d
    and own-decoder bit-exact, and both mask families actually chosen on
    occlusion content."""
    from svt_av1_psy_tpu.decoder.dav1d import decode_obus
    from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
    from svt_av1_psy_tpu.models.ra import RaDriver
    from svt_av1_psy_tpu.decoder.driver import Decoder
    import svt_av1_psy_tpu.decoder.tile_parser as tp
    rng = np.random.default_rng(9)
    W, H = 176, 144
    base = rng.integers(40, 200, (H + 64, W + 64)).astype(np.float64)
    frames = []
    for i in range(17):
        dx = (3 * i) % 32
        y = np.clip(base[8:8 + H, dx:dx + W] + rng.normal(0, 2, (H, W)),
                    0, 255).astype(np.uint16)
        y[40:90, (20 + 5 * i) % 100:(20 + 5 * i) % 100 + 40] = 60 + 2 * i
        u = np.clip(120 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        v = np.clip(136 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        frames.append((y, u, v))
    enc = FastIntraEncoder(W, H, qindex=120)
    enc.gop_size = 0
    enc.masked_compound_search = True
    drv = RaDriver(enc, gop_levels=3, keyint=0)
    pkts = []
    for f in frames:
        pkts += drv.push(*f)
    pkts += drv.flush()
    shown = [p for p in pkts if p.display_idx >= 0]
    data = b"".join(p.payload for p in pkts)
    dec = decode_obus(data)
    for d, s in zip(dec, shown):
        assert np.array_equal(d.y, s.recon[0])
        assert np.array_equal(d.u, s.recon[1])
        assert np.array_equal(d.v, s.recon[2])
    cnt = {0: 0, 1: 0, 2: 0}
    orig = tp.ParsedBlock.__init__

    def spy(self, *a, **k):
        orig(self, *a, **k)
        cnt[getattr(self, "comp_type", 0)] += 1

    tp.ParsedBlock.__init__ = spy
    try:
        d2 = Decoder()
        d2.decode_temporal_unit(data)
    finally:
        tp.ParsedBlock.__init__ = orig
    for f2, s in zip(d2.frames, shown):
        assert np.array_equal(f2.y, s.recon[0])
    assert cnt[1] > 0, "no wedge blocks chosen"
    assert cnt[2] > 0, "no diffwtd blocks chosen"
