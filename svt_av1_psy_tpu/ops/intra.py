"""AV1 intra prediction — decoder-normative (spec 7.11.2).

Covers the non-directional predictor family (DC, V, H, SMOOTH/V/H, PAETH)
plus edge preparation; directional modes with angle deltas, filter-intra and
CfL land in later passes. Reference counterparts:
Source/Lib/Codec/intra_prediction.c (decoder-side exactness) and
enc_intra_prediction.c (search-side usage).

All predictors are pure functions of the prepared edge arrays so the JAX
batch path can vmap them over superblock candidate sets.
"""

from __future__ import annotations

import numpy as np

from svt_av1_psy_tpu.constants import PredMode

# spec 7.11.2.6 smooth-weight table, indexed by block dimension
_SM_WEIGHTS = {
    4: np.array([255, 149, 85, 64], np.int32),
    8: np.array([255, 197, 146, 105, 73, 50, 37, 32], np.int32),
    16: np.array([255, 225, 196, 170, 145, 123, 102, 84, 68, 54, 43, 33, 26,
                  20, 17, 16], np.int32),
    32: np.array([255, 240, 225, 210, 196, 182, 169, 157, 145, 133, 122, 111,
                  101, 92, 83, 74, 66, 59, 52, 45, 39, 34, 29, 25, 21, 17, 14,
                  12, 10, 9, 8, 8], np.int32),
    64: np.array([255, 248, 240, 233, 225, 218, 210, 203, 196, 189, 182, 176,
                  169, 163, 156, 150, 144, 138, 133, 127, 121, 116, 111, 106,
                  101, 96, 91, 86, 82, 77, 73, 69, 65, 61, 57, 54, 50, 47, 44,
                  41, 38, 35, 32, 29, 27, 25, 22, 20, 18, 16, 15, 13, 12, 10,
                  9, 8, 7, 6, 6, 5, 5, 4, 4, 4], np.int32),
}


def prepare_edges(recon: np.ndarray, x: int, y: int, w: int, h: int,
                  have_above: bool, have_left: bool, bd: int = 8):
    """Build (above[w], left[h], above_left) from the recon plane at (x, y).

    Unavailable edges follow the spec fill rules (libaom
    build_intra_predictors equivalent). recon is the in-progress plane."""
    base = 1 << (bd - 1)
    if have_above:
        above = recon[y - 1, x:x + w].astype(np.int32)
    elif have_left:
        above = np.full(w, int(recon[y, x - 1]), np.int32)
    else:
        above = np.full(w, base - 1, np.int32)
    if have_left:
        left = recon[y:y + h, x - 1].astype(np.int32)
    elif have_above:
        left = np.full(h, int(recon[y - 1, x]), np.int32)
    else:
        left = np.full(h, base + 1, np.int32)
    if have_above and have_left:
        above_left = int(recon[y - 1, x - 1])
    elif have_above:
        above_left = int(recon[y - 1, x])
    elif have_left:
        above_left = int(recon[y, x - 1])
    else:
        above_left = base
    return above, left, above_left


def dc_pred(above, left, w: int, h: int, have_above: bool, have_left: bool,
            bd: int = 8) -> np.ndarray:
    if have_above and have_left:
        s = int(above[:w].sum() + left[:h].sum())
        dc = (s + ((w + h) >> 1)) // (w + h)
    elif have_above:
        dc = (int(above[:w].sum()) + (w >> 1)) >> w.bit_length() - 1
    elif have_left:
        dc = (int(left[:h].sum()) + (h >> 1)) >> h.bit_length() - 1
    else:
        dc = 1 << (bd - 1)
    return np.full((h, w), dc, np.int32)


def v_pred(above, left, w: int, h: int) -> np.ndarray:
    return np.broadcast_to(above[:w].reshape(1, w), (h, w)).astype(np.int32)


def h_pred(above, left, w: int, h: int) -> np.ndarray:
    return np.broadcast_to(left[:h].reshape(h, 1), (h, w)).astype(np.int32)


def smooth_pred(above, left, w: int, h: int) -> np.ndarray:
    wx = _SM_WEIGHTS[w]
    wy = _SM_WEIGHTS[h]
    below = int(left[h - 1])
    right = int(above[w - 1])
    a = above[:w].astype(np.int64).reshape(1, w)
    l = left[:h].astype(np.int64).reshape(h, 1)
    num = (wy.reshape(h, 1) * a + (256 - wy).reshape(h, 1) * below +
           wx.reshape(1, w) * l + (256 - wx).reshape(1, w) * right)
    return ((num + 256) >> 9).astype(np.int32)


def smooth_v_pred(above, left, w: int, h: int) -> np.ndarray:
    wy = _SM_WEIGHTS[h]
    below = int(left[h - 1])
    a = above[:w].astype(np.int64).reshape(1, w)
    num = wy.reshape(h, 1) * a + (256 - wy).reshape(h, 1) * below
    return ((num + 128) >> 8).astype(np.int32)


def smooth_h_pred(above, left, w: int, h: int) -> np.ndarray:
    wx = _SM_WEIGHTS[w]
    right = int(above[w - 1])
    l = left[:h].astype(np.int64).reshape(h, 1)
    num = wx.reshape(1, w) * l + (256 - wx).reshape(1, w) * right
    return ((num + 128) >> 8).astype(np.int32)


def paeth_pred(above, left, above_left: int, w: int, h: int) -> np.ndarray:
    a = above[:w].astype(np.int32).reshape(1, w)
    l = left[:h].astype(np.int32).reshape(h, 1)
    al = np.int32(above_left)
    base = a + l - al
    pa = np.abs(base - a)
    pl = np.abs(base - l)
    pal = np.abs(base - al)
    out = np.where((pa <= pl) & (pa <= pal), np.broadcast_to(a, (h, w)),
                   np.where(pl <= pal, np.broadcast_to(l, (h, w)), al))
    return out.astype(np.int32)


def predict(mode: int, above, left, above_left: int, w: int, h: int,
            have_above: bool, have_left: bool, bd: int = 8) -> np.ndarray:
    """Dispatch over the supported (non-directional) intra modes."""
    m = PredMode(mode)
    if m == PredMode.DC_PRED:
        return dc_pred(above, left, w, h, have_above, have_left, bd)
    if m == PredMode.V_PRED:
        return v_pred(above, left, w, h)
    if m == PredMode.H_PRED:
        return h_pred(above, left, w, h)
    if m == PredMode.SMOOTH_PRED:
        return smooth_pred(above, left, w, h)
    if m == PredMode.SMOOTH_V_PRED:
        return smooth_v_pred(above, left, w, h)
    if m == PredMode.SMOOTH_H_PRED:
        return smooth_h_pred(above, left, w, h)
    if m == PredMode.PAETH_PRED:
        return paeth_pred(above, left, above_left, w, h)
    raise NotImplementedError(f"mode {m} arrives with the directional pass")


SUPPORTED_MODES = (PredMode.DC_PRED, PredMode.V_PRED, PredMode.H_PRED,
                   PredMode.SMOOTH_PRED, PredMode.SMOOTH_V_PRED,
                   PredMode.SMOOTH_H_PRED, PredMode.PAETH_PRED)
