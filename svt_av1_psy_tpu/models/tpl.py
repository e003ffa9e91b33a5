"""TPL: temporal-dependency-model adaptive quantization.

The lookahead TPL pass of the reference (ref Source/Lib/Codec/
tpl_model.c: tpl_mc_flow dependency propagation, generate_r0beta ->
sb_setup_lambda per-SB qindex offsets) re-designed for the two-phase
architecture:

- the device HME (ops/jax_backend.hme_search) motion-searches each
  LOOKAHEAD frame against the frame being encoded (telescoping, with a
  per-hop decay standing in for the reference's recursive backward
  induction over mc_dep_cost),
- each future block's prediction benefit max(0, intra_cost - inter_cost)
  is splatted through its motion vector onto the referenced area of the
  current frame (area-weighted, the tpl_model_update_b analog),
- per-superblock offsets are -strength * log2(1 + credit/self_cost):
  blocks the future leans on get a lower qindex, normalized zero-mean so
  the frame's average rate is unchanged (the beta = r0/rk rule).

Costs are computed at half resolution in matched units: inter cost is
the HME SAD itself, intra cost is the gradient activity of the same 8x8
half-res block.
"""

from __future__ import annotations

import numpy as np


def _activity_halfres(yh: np.ndarray) -> np.ndarray:
    """Per-8x8 gradient activity of a half-res plane (intra-cost proxy,
    same abs-pixel-diff units as the HME SAD)."""
    a = yh.astype(np.int32)
    gx = np.abs(np.diff(a, axis=1))
    gy = np.abs(np.diff(a, axis=0))
    act = np.zeros_like(a)
    act[:, :-1] += gx
    act[:-1, :] += gy
    hh, wh = a.shape
    n8r, n8c = hh // 8, wh // 8
    return act[:n8r * 8, :n8c * 8].reshape(n8r, 8, n8c, 8).sum((1, 3))


def _downsample2(y: np.ndarray) -> np.ndarray:
    a = y.astype(np.int32)
    h2, w2 = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
    a = a[:h2, :w2]
    return (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2]
            + a[1::2, 1::2] + 2) >> 2


def tpl_sb_offsets(cur_y: np.ndarray, future_ys, strength: float = 4.0,
                   decay: float = 0.7, max_hops: int = 3):
    """Per-superblock qindex offsets for `cur_y` given lookahead frames.

    cur_y: (H, W) luma (any uint dtype); future_ys: iterable of future
    source lumas nearest-first. Returns (sb_rows, sb_cols) int32 offsets
    (<= 0 where the future depends on the block, > 0 elsewhere;
    zero-mean) or None when there is no usable lookahead."""
    future_ys = [f for f in future_ys][:max_hops]
    if not future_ys:
        return None
    import jax
    import jax.numpy as jnp

    from svt_av1_psy_tpu.models.fast_intra import _jitted_hme

    H, W = cur_y.shape
    ph = (H + 15) // 16 * 16
    pw = (W + 15) // 16 * 16

    def pad(p):
        return np.pad(np.asarray(p), ((0, ph - H), (0, pw - W)),
                      mode="edge")

    cp = pad(cur_y)
    credit = np.zeros((ph // 2, pw // 2), np.float64)
    hme = _jitted_hme()
    for k, fy in enumerate(future_ys):
        fp = pad(fy)
        mv16, sad16 = jax.device_get(hme(jnp.asarray(fp), jnp.asarray(cp)))
        mv16 = np.asarray(mv16, np.int64)
        sad16 = np.asarray(sad16, np.int64)
        act = _activity_halfres(_downsample2(fp))
        ben = np.clip(act - sad16, 0, None).astype(np.float64) \
            * (decay ** (k + 1))
        n8r, n8c = ben.shape
        hh, wh = credit.shape
        for br in range(n8r):
            for bc in range(n8c):
                b = ben[br, bc]
                if b <= 0:
                    continue
                # splat through the (half-res) motion vector onto the
                # referenced 8x8 area of the current frame
                y0 = br * 8 + int(mv16[br, bc, 0]) // 2
                x0 = bc * 8 + int(mv16[br, bc, 1]) // 2
                y0 = max(0, min(y0, hh - 8))
                x0 = max(0, min(x0, wh - 8))
                credit[y0:y0 + 8, x0:x0 + 8] += b / 64.0

    self_cost = _activity_halfres(_downsample2(cp)).astype(np.float64)
    cost_px = np.repeat(np.repeat(self_cost / 64.0, 8, 0), 8, 1)
    sb_rows = (H + 63) // 64
    sb_cols = (W + 63) // 64

    def sb_sum(plane):
        p = np.zeros((sb_rows * 32, sb_cols * 32), np.float64)
        p[:plane.shape[0], :plane.shape[1]] = \
            plane[:sb_rows * 32, :sb_cols * 32]
        return p.reshape(sb_rows, 32, sb_cols, 32).sum((1, 3))

    cred_sb = sb_sum(credit)
    cost_sb = sb_sum(cost_px)
    r = cred_sb / np.maximum(cost_sb, 1.0)
    off = -strength * np.log2(1.0 + r)
    off -= off.mean()                      # rate-neutral (beta rule)
    return np.clip(np.rint(off), -12, 12).astype(np.int32)


def snap_sb_q(base_q: int, sbq: np.ndarray):
    """Snap absolute per-SB qindex values to the delta_q_res grid the
    bitstream signals (same res-by-operating-point rule as
    variance_boost.adjust_sb_qindex, ref rc_process.c:1675)."""
    sbq = np.clip(sbq, 1, 255).astype(np.int32)
    if base_q >= 160:
        res_log2 = 3
    elif base_q >= 120:
        res_log2 = 2
    elif base_q >= 80:
        res_log2 = 1
    else:
        res_log2 = 0
    if res_log2:
        res = 1 << res_log2
        mask = ~(res - 1)
        rem = base_q & ~mask
        sbq = (sbq & mask) + rem
        sbq = np.where(sbq == 0, res, sbq)
    return sbq.astype(np.int32), res_log2
