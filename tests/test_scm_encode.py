"""Encoder-side screen content tools: palette + intra block copy.

Round-3 features (ref palette.c k-means search, entropy_coding.c
write_palette_* syntax, hash_motion.c IBC search): the slow-path
encoder trials a luma palette against the best intra mode on full RD
(spec 5.11.42/5.11.49 syntax) and, when intrabc is enabled, an IBC DV
candidate (spec 5.11.31) with the av1_is_dv_valid wavefront rule.
Everything is verified bit-exact against BOTH the own conformance
decoder and dav1d.
"""
import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.models.intra_encoder import IntraEncoder


def _screen_frame(H, W, seed=3):
    rng = np.random.default_rng(seed)
    y = np.full((H, W), 200, np.uint8)
    y[10:40, 10:W - 8:6] = 30              # text-like strokes
    y[H // 2:H // 2 + 30, :] = 90
    y[H // 2:H // 2 + 30, ::5] = 250
    y[H - 28:, 40:80] = 55
    u = np.full((H // 2, W // 2), 128, np.uint8)
    v = np.full((H // 2, W // 2), 110, np.uint8)
    return y, u, v


def _roundtrip(enc, frames):
    payloads = []
    recons = []
    for f in frames:
        out = enc.encode_frame(*f)
        payloads.append(out.payload)
        recons.append((out.recon_y, out.recon_u, out.recon_v))
    buf = io.BytesIO()
    w = IvfWriter(buf, enc.width, enc.height)
    for i, p in enumerate(payloads):
        w.write_frame(p, i)
    w.close()
    data = buf.getvalue()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    own = own_decode(data)
    dav = dav1d_decode(data)
    for i, (ry, ru, rv) in enumerate(recons):
        assert np.array_equal(own[i].y, ry), f"own frame {i} luma"
        assert np.array_equal(own[i].u, ru), f"own frame {i} u"
        assert np.array_equal(own[i].v, rv), f"own frame {i} v"
        assert np.array_equal(dav[i].y, ry), f"dav1d frame {i} luma"
        assert np.array_equal(dav[i].u, ru), f"dav1d frame {i} u"
        assert np.array_equal(dav[i].v, rv), f"dav1d frame {i} v"
    return sum(len(p) for p in payloads)


def test_palette_encode_bit_exact_and_smaller():
    H, W = 128, 128
    f = _screen_frame(H, W)
    enc = IntraEncoder(W, H, qindex=60, use_device_search=False)
    enc.screen_content = True
    bytes_pal = _roundtrip(enc, [f])
    n_pal = sum(1 for r in enc.records if r.palette is not None)
    assert n_pal >= 5, "palette should win on flat screen content"

    enc2 = IntraEncoder(W, H, qindex=60, use_device_search=False)
    bytes_plain = _roundtrip(enc2, [f])
    assert bytes_pal < 0.7 * bytes_plain, (bytes_pal, bytes_plain)


def test_palette_color_coding_plan_roundtrip():
    """plan_color_coding must mirror the parser's cache/delta decode."""
    from svt_av1_psy_tpu.entropy.palette import (ceil_log2,
                                                 merge_color_cache,
                                                 plan_color_coding)
    rng = np.random.default_rng(11)
    for _ in range(300):
        above = tuple(sorted(rng.choice(256, rng.integers(2, 9),
                                        replace=False))) \
            if rng.random() < 0.7 else None
        left = tuple(sorted(rng.choice(256, rng.integers(2, 9),
                                       replace=False))) \
            if rng.random() < 0.7 else None
        cache = merge_color_cache(above, left)
        n = int(rng.integers(2, 9))
        colors = tuple(sorted(rng.choice(256, n, replace=False)))
        plan = plan_color_coding(colors, cache, 8)
        assert plan is not None
        flags, new, bits_extra, _ = plan
        # replay the parser's read loop
        got = []
        i = 0
        fi = iter(flags)
        while i < len(cache) and len(got) < n:
            if next(fi, 0):
                got.append(cache[i])
            i += 1
        out = list(got)
        if new:
            v = new[0]
            out.append(v)
            bits = 5 + bits_extra
            rng_left = 255 - v
            for nxt in new[1:]:
                d = nxt - v
                assert d - 1 < (1 << bits)
                v = nxt
                out.append(v)
                rng_left -= d
                bits = min(bits, ceil_log2(rng_left))
        assert tuple(sorted(out)) == colors


def test_intrabc_encode_bit_exact():
    H, W = 256, 512
    rng = np.random.default_rng(5)
    tile = (rng.integers(0, 2, (64, 64)) * 180 + 40).astype(np.uint8)
    y = np.tile(tile, (H // 64, W // 64))
    u = np.full((H // 2, W // 2), 128, np.uint8)
    v = u.copy()
    enc = IntraEncoder(W, H, qindex=80, use_device_search=False)
    enc.screen_content = True
    enc.enable_intrabc = True
    bytes_ibc = _roundtrip(enc, [(y, u, v)])
    n_ibc = sum(1 for r in enc.records
                if getattr(r, "use_intrabc", False))
    assert n_ibc >= 10, "IBC should win on exact repeats"

    enc2 = IntraEncoder(W, H, qindex=80, use_device_search=False)
    bytes_plain = _roundtrip(enc2, [(y, u, v)])
    assert bytes_ibc < 0.2 * bytes_plain, (bytes_ibc, bytes_plain)


def test_dv_validity_rule():
    enc = IntraEncoder(512, 256, qindex=80, use_device_search=False)
    bs64 = 12                               # BLOCK_64X64
    # same SB row needs >= 5 SB64s of delay
    assert not enc._dv_valid((0, -64 * 8), 16, 80, bs64)
    assert enc._dv_valid((0, -320 * 8), 16, 80, bs64)
    # one SB row above: wavefront allows up to one SB64 right
    assert enc._dv_valid((-64 * 8, 0), 16, 16, bs64)
    # subpel and out-of-frame DVs rejected
    assert not enc._dv_valid((-4, 0), 16, 16, bs64)
    assert not enc._dv_valid((0, -8), 0, 0, bs64)
    # one row above but too far right for the wavefront rule
    assert not enc._dv_valid((-64 * 8, 64 * 8 * 2), 16, 16, bs64)


def test_scm_auto_detection():
    H, W = 128, 128
    ys, us, vs = _screen_frame(H, W)
    enc = IntraEncoder(W, H, qindex=60, use_device_search=False)
    enc.scm_auto = True
    enc.encode_frame(ys, us, vs)
    assert enc.screen_content, "flat screen frame must trip the detector"

    rng = np.random.default_rng(1)
    nat = rng.integers(0, 255, (H, W)).astype(np.uint8)
    enc2 = IntraEncoder(W, H, qindex=60, use_device_search=False)
    enc2.scm_auto = True
    enc2.encode_frame(nat, us, vs)
    assert not enc2.screen_content, "noise must not trip the detector"


def test_scm_via_api_and_multiframe():
    """--scm 1 end to end through the public API, 3 frames (palette
    neighbor cache + CDF adaptation across frames)."""
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig
    H, W = 128, 192
    cfg = EncoderConfig(enc_mode=12, qp=15, intra_period_length=0,
                        screen_content_mode=1)
    enc = Encoder(cfg, W, H)
    assert not enc._fast, "--scm 1 must route to the full RD path"
    assert enc._enc.screen_content and enc._enc.enable_intrabc
    frames = [_screen_frame(H, W, seed=s) for s in (3, 4, 5)]
    payloads = [enc.encode(*f).payload for f in frames]
    buf = io.BytesIO()
    w = IvfWriter(buf, W, H)
    for i, p in enumerate(payloads):
        w.write_frame(p, i)
    w.close()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    data = buf.getvalue()
    own = own_decode(data)
    dav = dav1d_decode(data)
    assert len(own) == len(dav) == 3
    for a, b in zip(own, dav):
        assert np.array_equal(a.y, b.y)
        assert np.array_equal(a.u, b.u)
        assert np.array_equal(a.v, b.v)
