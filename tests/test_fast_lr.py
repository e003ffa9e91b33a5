"""Fast-path loop restoration (Wiener): dav1d bit-exactness.

The fast path searches Wiener params on frame N's post-CDEF recon and
signals them on frame N+1 (cross-frame cache, models/lr_search.py); the
commit walk emits read_lr syntax natively (native/lr_syntax.c). These
tests pin the whole chain against dav1d, including the stripe-aligned
unit-row extents (libaom RESTORATION_UNIT_OFFSET: unit row r covers
pixel rows [r*size - 8>>subY, (r+1)*size - 8>>subY)) that round 1's
unshifted mapping got wrong.

Reference counterparts (behavioral): restoration_pick.c:1471,
entropy_coding.c loop_restoration_write_sb_coeffs.
"""
import numpy as np
import pytest

from svt_av1_psy_tpu.decoder.dav1d import decode_obus
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
from svt_av1_psy_tpu.models.lr_search import LrDecision, search_lr_frame

W, H = 176, 144


def _frames(n, seed=7, noise=6.0):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, W)[None, :] * np.ones((H, 1))
    out = []
    for i in range(n):
        y = np.clip(base + rng.normal(0, noise, (H, W)) + i,
                    0, 255).astype(np.uint16)
        u = np.clip(128 + rng.normal(0, 4, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        v = np.clip(128 + rng.normal(0, 4, (H // 2, W // 2)),
                    0, 255).astype(np.uint16)
        out.append((y, u, v))
    return out


def _forced_dec(mask_mod):
    """All-plane Wiener decision with a checkerboard of NONE units —
    exercises per-unit type symbols, subexp tap refs, and the shifted
    unit-row extents."""
    us = (64, 32, 32)
    units = [{}, {}, {}]
    flat = [None] * 3
    lr_type = [0, 0, 0]
    ucols = [0] * 3
    urows = [0] * 3
    for p in range(3):
        pw, ph = (W, H) if p == 0 else (W // 2, H // 2)
        uc = max((pw + us[p] // 2) // us[p], 1)
        ur = max((ph + us[p] // 2) // us[p], 1)
        lr_type[p] = 1
        fa = np.zeros((ur * uc, 10), np.int16)
        tv = (1, -3, 6) if p == 0 else (0, -3, 6)
        th = (2, -2, 4) if p == 0 else (0, -2, 4)
        for r in range(ur):
            for c in range(uc):
                if (r + c) % mask_mod == 0:
                    units[p][(r, c)] = {"type": 1, "vfilter": tv,
                                        "hfilter": th}
                    fa[r * uc + c, 0] = 1
                    fa[r * uc + c, 1:4] = tv
                    fa[r * uc + c, 4:7] = th
                else:
                    units[p][(r, c)] = {"type": 0}
        flat[p] = fa
        ucols[p] = uc
        urows[p] = ur
    return LrDecision(tuple(lr_type), us, units, flat, ucols, urows, 1.0)


def _check_stream(payloads, recons):
    decoded = decode_obus(b"".join(payloads))
    assert len(decoded) == len(recons)
    for i, d in enumerate(decoded):
        for got, want in ((d.y, recons[i][0]), (d.u, recons[i][1]),
                          (d.v, recons[i][2])):
            assert np.array_equal(got, want), f"frame {i} not bit-exact"


@pytest.mark.parametrize("mask_mod", [1, 2])
def test_forced_wiener_bit_exact(mask_mod):
    enc = FastIntraEncoder(W, H, qindex=140)
    enc.gop_size = 0
    enc.enable_lr = True
    payloads, recons = [], []
    for fi, (y, u, v) in enumerate(_frames(3)):
        enc._lr_pending = _forced_dec(mask_mod) if fi >= 1 else None
        out = enc.encode_frame(y, u, v)
        enc._lr_pending = None
        payloads.append(out.payload)
        recons.append((out.recon_y, out.recon_u, out.recon_v))
    _check_stream(payloads, recons)


def test_searched_lr_bit_exact_and_signalled():
    enc = FastIntraEncoder(W, H, qindex=140)
    enc.gop_size = 0
    enc.enable_lr = True
    payloads, recons = [], []
    signalled = 0
    for (y, u, v) in _frames(6):
        if enc._lr_pending is not None:
            signalled += 1
        out = enc.encode_frame(y, u, v)
        payloads.append(out.payload)
        recons.append((out.recon_y, out.recon_u, out.recon_v))
    assert signalled >= 1, "search never produced LR params on noisy input"
    _check_stream(payloads, recons)


def test_searched_lr_key_frames_bit_exact():
    enc = FastIntraEncoder(W, H, qindex=140)
    enc.gop_size = 1
    enc.enable_lr = True
    payloads, recons = [], []
    for (y, u, v) in _frames(3):
        out = enc.encode_frame(y, u, v)
        payloads.append(out.payload)
        recons.append((out.recon_y, out.recon_u, out.recon_v))
    _check_stream(payloads, recons)


def test_search_reduces_sse():
    """The Wiener solve must actually help on noisy content: predicted
    gain positive and realized SSE reduced on the search frame."""
    (y, u, v), = _frames(1, noise=8.0)
    rng = np.random.default_rng(3)
    rec = np.clip(y.astype(np.float64) +
                  rng.normal(0, 3, y.shape), 0, 255).astype(np.uint16)
    dims = [(W, H), (W // 2, H // 2), (W // 2, H // 2)]
    dec = search_lr_frame((y, u, v), (rec, u.copy(), v.copy()), dims,
                          rdmult=50.0, bd=8)
    assert dec is not None and dec.lr_type[0] == 1
    assert dec.est_gain > 0
