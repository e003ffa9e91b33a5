"""Global motion (TRANSLATION): param coding, estimation, e2e conformance.

The reference codes gm params with bool-coded finite subexponential
deltas vs the primary reference frame's saved params
(ref entropy_coding.c:2958 write_global_motion_params; spec 5.9.24/25)
and estimates them with FAST corners + RANSAC (ref global_me.c:126).
Our estimator is an inlier-consensus median over the dense device HME
field; coding must be spec-exact — dav1d is the oracle.
"""
import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.bitwriter import BitReader, BitWriter
from svt_av1_psy_tpu.inter.global_motion import (
    estimate_translation, gm_mv8, mv8_to_wm01, read_translation_params,
    trans_coding_params, write_translation_params)


def test_translation_param_roundtrip():
    trans_bits, prec_diff = trans_coding_params(False)
    step = 1 << prec_diff
    rng = np.random.default_rng(3)
    cases = [(0, 0), (step, -step), (12 * step, 250 * step),
             (-255 * step, 255 * step)]
    cases += [(int(rng.integers(-255, 256)) * step,
               int(rng.integers(-255, 256)) * step) for _ in range(20)]
    prevs = [(0, 0), (4 * step, -4 * step), (-100 * step, 100 * step)]
    for wm in cases:
        for prev in prevs:
            w = BitWriter()
            write_translation_params(w, wm, prev, False)
            w.byte_align()
            r = BitReader(w.data())
            got = read_translation_params(r, prev, False)
            assert got == wm, (wm, prev, got)


def test_gm_mv8_precision_lowering():
    # hp off: odd 1/8-px components are rounded toward zero (spec
    # lower_mv_precision); our coded params are always even so lowering
    # must be the identity on them
    assert gm_mv8(mv8_to_wm01(34, -16), allow_hp=False) == (34, -16)
    assert gm_mv8(mv8_to_wm01(7, -7), allow_hp=False) == (6, -6)
    assert gm_mv8(mv8_to_wm01(7, -7), allow_hp=True) == (7, -7)
    # force_integer_mv: round to the nearest full pel
    assert gm_mv8(mv8_to_wm01(13, -13), force_int=True) == (16, -16)
    assert gm_mv8(mv8_to_wm01(11, -11), force_int=True) == (8, -8)


def test_estimate_translation_field():
    # uniform full-pel pan: exact fit
    field = np.zeros((9, 11, 2), np.int16)
    field[..., 0] = -3
    field[..., 1] = 5
    assert estimate_translation(field) == (-24, 40)
    # static scene: identity is cheaper to signal
    assert estimate_translation(np.zeros((9, 11, 2), np.int16)) is None
    # no consensus: half the field disagrees wildly
    rng = np.random.default_rng(0)
    field[4:] = rng.integers(-40, 40, field[4:].shape)
    assert estimate_translation(field) is None


def _pan_clip(w, h, n, dx, dy, seed=11):
    """Structured textured frame panned by (dx, dy) px/frame (integer
    pan). The texture must survive quantization so HME locks on."""
    rng = np.random.default_rng(seed)
    hh, ww = h + abs(dy) * n + 16, w + abs(dx) * n + 16
    # low-pass-filtered noise: aperiodic structure that survives
    # quantization (pure white noise does not; periodic patterns alias)
    big = rng.normal(0, 1, (hh, ww)).astype(np.float32)
    for _ in range(3):
        big = (big + np.roll(big, 1, 0) + np.roll(big, -1, 0) +
               np.roll(big, 1, 1) + np.roll(big, -1, 1)) / 5.0
    big = 128 + big * (70.0 / max(big.std(), 1e-6))
    big = np.clip(big, 0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        ox = t * dx if dx >= 0 else (n - 1 - t) * (-dx)
        oy = t * dy if dy >= 0 else (n - 1 - t) * (-dy)
        y = big[oy:oy + h, ox:ox + w]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y.copy(), u, v))
    return frames


def _encode(frames, w, h, enable_gm):
    from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
    enc = FastIntraEncoder(w, h, qindex=120, n_tiles=1)
    enc.gop_size = len(frames)
    enc.enable_gm = enable_gm
    return [enc.encode_frame(*f).payload for f in frames]


def _ivf(payloads, w, h):
    from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
    buf = io.BytesIO()
    with IvfWriter(buf, w, h) as wr:
        for i, p in enumerate(payloads):
            wr.write_frame(p, i)
    return buf.getvalue()


def test_gm_e2e_pan_conformance():
    """Panning clip: GM is signalled, streams shrink, and both the own
    decoder and dav1d decode bit-exactly (incl. PrevGmParams chaining
    across P frames)."""
    w, h = 320, 192
    frames = _pan_clip(w, h, n=5, dx=4, dy=-2)
    pay_gm = _encode(frames, w, h, True)
    pay_no = _encode(frames, w, h, False)

    # GM headers present on P frames
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    seq = None
    n_gm = 0
    slot_gm = [((0, 0),) * 7 for _ in range(8)]
    for p in pay_gm:
        for t, _, _, pl in parse_obus(p):
            if t == ObuType.SEQUENCE_HEADER:
                seq = parse_sequence_header(pl)
            elif t == ObuType.FRAME:
                fi = parse_frame_header(pl, seq, ref_gm=slot_gm)
                if fi.gm_trans and any(g is not None for g in fi.gm_trans):
                    n_gm += 1
                cur = tuple((g if g is not None else (0, 0))
                            for g in (fi.gm_trans or [None] * 7))
                refresh = fi.refresh_frame_flags if fi.frame_type == 1 \
                    else 0xFF
                for s in range(8):
                    if refresh & (1 << s):
                        slot_gm[s] = cur
    assert n_gm >= 3, f"GM signalled on only {n_gm} frames"

    # integer pan is perfectly predicted: GM must not cost materially
    # more (the multi-candidate HME also finds the pan per block, so
    # the non-GM stream can be equally small; 2% covers the GM headers)
    assert sum(map(len, pay_gm)) <= 1.02 * sum(map(len, pay_no))

    data = _ivf(pay_gm, w, h)
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    own = own_decode(data)
    assert len(own) == len(frames)
    try:
        from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
        dav = dav1d_decode(data)
    except Exception:
        pytest.skip("dav1d unavailable")
    for i, (a, b) in enumerate(zip(own, dav)):
        assert np.array_equal(a.y, b.y), f"frame {i} luma"
        assert np.array_equal(a.u, b.u), f"frame {i} u"
        assert np.array_equal(a.v, b.v), f"frame {i} v"


def test_gm_identity_streams_unchanged():
    """Static content: the estimator stays off and streams are
    byte-identical with the feature enabled or disabled."""
    w, h = 192, 128
    rng = np.random.default_rng(5)
    y = np.clip(rng.normal(128, 30, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    frames = [(y, u, v)] * 3
    assert _encode(frames, w, h, True) == _encode(frames, w, h, False)
