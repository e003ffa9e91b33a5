"""ROTZOOM global motion units: param-coding roundtrip, block mv
derivation, estimation recovery, and an end-to-end pan encode whose
stream must decode bit-exactly in BOTH external oracles (the spec
7.10.2.7 neighbor-substitution rule desyncs dav1d/libaom if broken
while the in-repo decoder, sharing the encoder's stack code, still
round-trips — so the external checks are the load-bearing ones).

Ref: Source/Lib/Codec/global_me.c (estimation),
entropy_coding.c write_global_motion_params (5.9.24 coding),
adaptive_mv_pred.c add_ref_mv_candidate (7.10.2.7 substitution).
"""
import numpy as np

from svt_av1_psy_tpu.inter.global_motion import (WARPEDMODEL_PREC_BITS,
                                                 estimate_rotzoom,
                                                 gm_block_mv8, norm_gm6,
                                                 read_rotzoom_params,
                                                 write_rotzoom_params)

ONE = 1 << WARPEDMODEL_PREC_BITS


class _BW:
    def __init__(self):
        self.bits = []

    def f(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)


class _BR:
    def __init__(self, bits):
        self.bits = bits
        self.i = 0

    def f(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bits[self.i]
            self.i += 1
        return v


def test_rotzoom_param_roundtrip():
    rng = np.random.default_rng(1)
    prevs = [None, (123 << 10, -55 << 10),
             (5 << 10, 6 << 10, ONE + 24, 8, -8, ONE + 24)]
    for t in range(300):
        m2 = ONE + int(rng.integers(-4000, 4000)) * 2
        m3 = int(rng.integers(-4000, 4000)) * 2
        m0 = int(rng.integers(-4000, 4000)) * 1024
        m1 = int(rng.integers(-4000, 4000)) * 1024
        mat = (m0, m1, m2, m3, -m3, m2)
        prev = prevs[t % 3]
        w = _BW()
        write_rotzoom_params(w, mat, prev, False)
        assert read_rotzoom_params(_BR(w.bits), prev) == mat


def test_gm_block_mv_center_derivation():
    # pure zoom s: mv at block center scales with center distance
    s = 0.01
    mat = (0, 0, round((1 + s) * ONE), 0, 0, round((1 + s) * ONE))
    mr, mc = gm_block_mv8(mat, mi_row=10, mi_col=20, w4=4, h4=4)
    x = 20 * 4 + 4 * 2 - 1
    y = 10 * 4 + 4 * 2 - 1
    assert abs(mc - round(s * x * 8)) <= 2     # quarter-pel lowering
    assert abs(mr - round(s * y * 8)) <= 2
    assert mc % 2 == 0 and mr % 2 == 0         # allow_hp off


def test_estimation_recovers_synthetic_field():
    rows, cols = 18, 22
    yy, xx = np.mgrid[0:rows, 0:cols].astype(float)
    xs, ys = xx * 16 + 7, yy * 16 + 7
    s, b, tx, ty = 0.012, -0.003, 3.3, 1.1
    vc = s * xs + b * ys + tx
    vr = -b * xs + s * ys + ty
    fld = np.stack([np.round(vr), np.round(vc)], axis=-1)
    mat = estimate_rotzoom(fld)
    assert mat is not None
    assert abs(mat[2] - (1 + s) * ONE) < 0.002 * ONE
    assert abs(mat[3] - b * ONE) < 0.002 * ONE
    assert abs(mat[0] / ONE - tx) < 0.5
    # static field: no model
    assert estimate_rotzoom(np.zeros((rows, cols, 2))) is None


def test_norm_gm6():
    assert norm_gm6(None) == (0, 0, ONE, 0, 0, ONE)
    assert norm_gm6((5, 6)) == (5, 6, ONE, 0, 0, ONE)
    assert norm_gm6((1, 2, 3, 4, 5, 6)) == (1, 2, 3, 4, 5, 6)


def _zoom_frame(w, h, t, rng_bg):
    """Smooth bilinear zoom+pan over an APERIODIC texture: the
    tools/make_test_clip pan class uses 8-px-periodic cells +
    nearest-neighbor resampling, which aliases the full-pel HME (field
    std ~15 px) — the consistency gate then correctly refuses to call
    that global motion. This generator gives the clean field a real
    camera zoom would."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    z = 1.0 + 0.004 * t
    sx = (xx - w / 2) * z + w / 2 + 2.0 * t + w / 4
    sy = (yy - h / 2) * z + h / 2 + 1.0 * t + h / 4
    x0 = np.clip(sx.astype(np.int32), 0, 2 * w - 2)
    y0 = np.clip(sy.astype(np.int32), 0, 2 * h - 2)
    fx = sx - x0
    fy = sy - y0
    bg = rng_bg
    y = (bg[y0, x0] * (1 - fx) * (1 - fy) + bg[y0, x0 + 1] * fx * (1 - fy)
         + bg[y0 + 1, x0] * (1 - fx) * fy + bg[y0 + 1, x0 + 1] * fx * fy)
    c = np.full((h // 2, w // 2), 128, np.uint8)
    return np.clip(y, 0, 255).astype(np.uint8), c, c.copy()


def test_pan_encode_rotzoom_external_oracles(tmp_path):
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig, PredStructure
    w, h = 352, 288
    rng = np.random.default_rng(7)
    bg = rng.normal(128, 40, (2 * h, 2 * w))
    # low-pass for HME-friendly (aperiodic, smooth) detail
    for ax in (0, 1):
        for _ in range(2):
            bg = (bg + np.roll(bg, 1, ax) + np.roll(bg, -1, ax)) / 3.0
    src = [_zoom_frame(w, h, t, bg) for t in range(10)]
    cfg = EncoderConfig(enc_mode=6, qp=32, intra_period_length=-1,
                        hierarchical_levels=2,
                        pred_structure=PredStructure.RANDOM_ACCESS)
    enc = Encoder(cfg, w, h, bit_depth=8)
    pkts = []
    for f in src:
        pkts.extend(enc.send_picture(*f))
    pkts.extend(enc.flush())
    enc.close()
    payloads = [p.payload for p in pkts]

    # a ROTZOOM model must actually have been signalled on some frame
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (
        parse_frame_header, parse_sequence_header)
    seq = None
    hints = [0] * 8
    saw_rz = False
    for pl in payloads:
        for t, _, _, p in parse_obus(pl):
            if t == ObuType.SEQUENCE_HEADER:
                seq = parse_sequence_header(p)
            elif t == ObuType.FRAME:
                fi = parse_frame_header(p, seq, ref_order_hints=hints)
                if fi.show_existing_frame:
                    continue
                for s_ in range(8):
                    if (fi.refresh_frame_flags >> s_) & 1:
                        hints[s_] = fi.order_hint
                if fi.gm_trans and any(
                        wm is not None and len(wm) == 6
                        for wm in fi.gm_trans):
                    saw_rz = True
    assert saw_rz, "pan content should signal a ROTZOOM gm"

    from svt_av1_psy_tpu.decoder.aom import decode_obus
    from svt_av1_psy_tpu.decoder.driver import Decoder
    dec = Decoder()
    for pl in payloads:
        dec.decode_temporal_unit(pl)
    aom_frames = decode_obus(payloads)
    assert len(aom_frames) == len(dec.frames) == len(src)
    for a, b in zip(aom_frames, dec.frames):
        assert np.array_equal(a.y, b.y)
        assert np.array_equal(a.u, b.u)
        assert np.array_equal(a.v, b.v)
