"""Motion modes + inter-intra decode conformance.

Golden streams are reference SvtAv1EncApp preset-4 RA encodes (keyint 16,
mfmv/filters/TF off) of synthetic clips:

- ref_ra_warp_p4.ivf: rotating/zooming texture -> warped-motion
  (WARPED_CAUSAL) blocks dominate, plus OBMC blocks. Exercises warp
  sample collection (spec 7.10.4), the integer LS affine solve + shear
  validation (ref warped_motion.c:364/1045), and the two-stage warp
  filter (ref warped_motion.c:570).
- ref_ra_masked_ii_p2.ivf: scene-transition clip -> inter-intra blends
  (spec 5.11.28/7.11.3.13), OBMC (spec 7.11.3.9), sub-8x8 chroma
  prediction groups (ref enc_inter_prediction.c:3903), and the
  get_tx_size_context inter-neighbor override.

dav1d is the independent oracle; decode must be bit-exact.
"""
import os

import numpy as np
import pytest

_DIR = os.path.join(os.path.dirname(__file__), "golden", "streams_inter")


@pytest.mark.parametrize("name", ["ref_ra_warp_p4.ivf",
                                  "ref_ra_masked_ii_p2.ivf"])
def test_motion_mode_decode_matches_dav1d(name):
    data = open(os.path.join(_DIR, name), "rb").read()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    own = own_decode(data)
    dav = dav1d_decode(data)
    assert len(own) == len(dav) == 16
    for i, (a, b) in enumerate(zip(own, dav)):
        assert np.array_equal(a.y, b.y), f"frame {i} luma"
        assert np.array_equal(a.u, b.u), f"frame {i} u"
        assert np.array_equal(a.v, b.v), f"frame {i} v"


def test_streams_exercise_motion_modes():
    """The goldens must actually contain warp/OBMC/inter-intra blocks."""
    import svt_av1_psy_tpu.decoder.reconstruct as R
    from svt_av1_psy_tpu.decoder.driver import decode_ivf

    stats = {"obmc": 0, "warp": 0, "ii": 0, "sub8": 0, "wedge": 0,
             "diffwtd": 0}
    orig = R.FrameReconstructor._decode_block

    def patched(self, b):
        if getattr(b, "is_inter", False):
            mm = getattr(b, "motion_mode", 0)
            if mm == 1:
                stats["obmc"] += 1
            elif mm == 2 and b.warp_params is not None:
                stats["warp"] += 1
            if getattr(b, "interintra", False):
                stats["ii"] += 1
            if getattr(b, "chroma_sub8x8", None):
                stats["sub8"] += 1
            ct = getattr(b, "comp_type", 0)
            if ct == 1:
                stats["wedge"] += 1
            elif ct == 2:
                stats["diffwtd"] += 1
        return orig(self, b)

    R.FrameReconstructor._decode_block = patched
    try:
        for name in ("ref_ra_warp_p4.ivf", "ref_ra_masked_ii_p2.ivf"):
            decode_ivf(open(os.path.join(_DIR, name), "rb").read())
    finally:
        R.FrameReconstructor._decode_block = orig
    assert stats["warp"] >= 50, stats
    assert stats["obmc"] >= 20, stats
    assert stats["ii"] >= 5, stats
    assert stats["sub8"] >= 1, stats
    assert stats["wedge"] >= 10, stats
    assert stats["diffwtd"] >= 50, stats


def test_warp_filter_golden_vectors():
    """warp_plane vs golden outputs generated dev-time by running the
    reference svt_av1_warp_affine_c on random valid shear params
    (tests/golden/warp_vectors.npz; same oracle role as the EC goldens)."""
    from svt_av1_psy_tpu.inter.warp import warp_plane

    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "warp_vectors.npz"))
    for i, p in enumerate(g["params"]):
        mat = [int(v) for v in p[:6]]
        wm = {"mat": mat, "alpha": int(p[6]), "beta": int(p[7]),
              "gamma": int(p[8]), "delta": int(p[9])}
        pcol, prow, pw, ph = (int(v) for v in p[10:14])
        ours = warp_plane(wm, g[f"ref{i}"], 64, 64, pcol, prow, pw, ph,
                          0, 0, bd=8)
        np.testing.assert_array_equal(ours, g[f"out{i}"].astype(np.int64),
                                      err_msg=f"case {i}")


# ---- encoder-side OBMC (fast path, native/inter_backend.c) -------------

def _obmc_frames(n, W=176, H=144, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (H + 64, W + 64)).astype(np.float64)
    out = []
    for i in range(n):
        dx = (3 * i) % 32
        y = np.clip(base[8:8 + H, dx:dx + W] +
                    rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint16)
        u = np.clip(120 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        v = np.clip(136 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        out.append((y, u, v))
    return out


def _encode_obmc(obmc, n=9):
    from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
    enc = FastIntraEncoder(176, 144, qindex=120)
    enc.gop_size = 0
    enc.hierarchical_levels = 2
    enc.obmc_search = obmc
    payload = b""
    recons = []
    for y, u, v in _obmc_frames(n):
        ef = enc.encode_frame(y, u, v)
        payload += ef.payload
        recons.append((ef.recon_y, ef.recon_u, ef.recon_v))
    return payload, recons


def test_encoder_obmc_dav1d_bit_exact():
    """Fast-path encode with OBMC search on: the C blend
    (native/inter_backend.c obmc_blend_plane, spec 7.11.3.9) must match
    dav1d's overlapped prediction or recon diverges."""
    from svt_av1_psy_tpu.decoder.dav1d import decode_obus
    payload, recons = _encode_obmc(True)
    dec = decode_obus(payload)
    assert len(dec) == len(recons)
    for d, (ry, ru, rv) in zip(dec, recons):
        assert np.array_equal(d.y, ry)
        assert np.array_equal(d.u, ru)
        assert np.array_equal(d.v, rv)


def test_encoder_obmc_own_decoder():
    from svt_av1_psy_tpu.decoder.driver import Decoder
    payload, recons = _encode_obmc(True)
    d = Decoder()
    d.decode_temporal_unit(payload)
    assert len(d.frames) == len(recons)
    for fr, (ry, ru, rv) in zip(d.frames, recons):
        assert np.array_equal(fr.y, ry)
        assert np.array_equal(fr.u, ru)
        assert np.array_equal(fr.v, rv)


def test_encoder_obmc_signalled_and_used():
    """is_motion_mode_switchable must be in the header, and at least one
    block should actually pick OBMC_CAUSAL on shifting content."""
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    from svt_av1_psy_tpu.decoder.tile_parser import TileParser  # noqa: F401
    payload, _ = _encode_obmc(True)
    seq = None
    n_sw = 0
    hints = [0] * 8
    for t, _, _, p in parse_obus(payload):
        if t == ObuType.SEQUENCE_HEADER:
            seq = parse_sequence_header(p)
        elif t == ObuType.FRAME:
            fi = parse_frame_header(p, seq, ref_order_hints=hints)
            n_sw += bool(fi.is_motion_mode_switchable)
            for i in range(8):
                if fi.refresh_frame_flags & (1 << i) or fi.frame_type == 0:
                    hints[i] = fi.order_hint
    assert n_sw >= 6, f"OBMC frames signalled: {n_sw}"
    # streams with and without the search must differ (the symbol is
    # coded for every eligible block)
    p_off, _ = _encode_obmc(False)
    assert payload != p_off


def _zoom_frames(n, W=176, H=144, seed=5):
    """Slight zoom + pan: affine motion that favors WARPED_CAUSAL."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, (H + 96, W + 96)).astype(np.float64)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        s = 1.0 + 0.004 * i
        sy = np.clip((yy - H / 2) / s + H / 2 + i * 1.5 + 16, 0, H + 95)
        sx = np.clip((xx - W / 2) / s + W / 2 + i * 2.5 + 16, 0, W + 95)
        y = np.clip(base[sy.astype(int), sx.astype(int)] +
                    rng.normal(0, 1.5, (H, W)), 0, 255).astype(np.uint16)
        u = np.clip(120 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        v = np.clip(136 + rng.normal(0, 2, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        out.append((y, u, v))
    return out


def _encode_warp(n=9):
    from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
    enc = FastIntraEncoder(176, 144, qindex=120)
    enc.gop_size = 0
    enc.hierarchical_levels = 2
    enc.obmc_search = True
    enc.warp_search = True
    payload = b""
    recons = []
    for y, u, v in _zoom_frames(n):
        ef = enc.encode_frame(y, u, v)
        payload += ef.payload
        recons.append((ef.recon_y, ef.recon_u, ef.recon_v))
    return payload, recons


def test_encoder_warp_dav1d_bit_exact():
    """Encoder-side WARPED_CAUSAL: the C sample collection, integer LS
    affine solve, shear params, and two-stage warp filter
    (native/inter_backend.c, spec 7.10.4/7.11.3.3) must all agree with
    dav1d's reconstruction of the same signalled blocks."""
    from svt_av1_psy_tpu.decoder.dav1d import decode_obus
    payload, recons = _encode_warp()
    dec = decode_obus(payload)
    assert len(dec) == len(recons)
    for d, (ry, ru, rv) in zip(dec, recons):
        assert np.array_equal(d.y, ry)
        assert np.array_equal(d.u, ru)
        assert np.array_equal(d.v, rv)


def test_encoder_warp_chosen_and_own_decoder():
    """At least one WARPED_CAUSAL block is chosen on zooming content,
    and our conformance decoder agrees bit-exactly."""
    import svt_av1_psy_tpu.decoder.reconstruct as rc
    from svt_av1_psy_tpu.decoder.driver import Decoder
    payload, recons = _encode_warp()
    n_warp = [0]
    orig = rc.FrameReconstructor._predict_inter_block

    def counting(self, b, hc):
        if getattr(b, "motion_mode", 0) == 2:
            n_warp[0] += 1
        return orig(self, b, hc)

    rc.FrameReconstructor._predict_inter_block = counting
    try:
        d = Decoder()
        d.decode_temporal_unit(payload)
    finally:
        rc.FrameReconstructor._predict_inter_block = orig
    assert len(d.frames) == len(recons)
    for fr, (ry, ru, rv) in zip(d.frames, recons):
        assert np.array_equal(fr.y, ry)
        assert np.array_equal(fr.u, ru)
        assert np.array_equal(fr.v, rv)
    assert n_warp[0] > 0, "no WARPED_CAUSAL blocks chosen"
