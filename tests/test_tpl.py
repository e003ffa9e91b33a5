"""TPL lookahead AQ tests (ref Source/Lib/Codec/src_ops_process.c:519
dispenser, :1572 synthesizer, :1784 driver; generate_r0beta -> per-SB
qindex offsets).

Our design: device HME motion-searches lookahead frames against the
frame being encoded, prediction benefit is splatted through the MVs
onto the referenced area, per-SB offsets are -strength*log2(1+credit/
self_cost), zero-mean (models/tpl.py)."""

import numpy as np
import pytest

from svt_av1_psy_tpu.decoder.dav1d import decode_obus
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
from svt_av1_psy_tpu.models.tpl import snap_sb_q, tpl_sb_offsets


def _moving_clip(w, h, n=4, seed=11):
    """Static textured background + moving block: future frames lean on
    the background, so TPL should lower q there."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(40, 200, (h, w)).astype(np.uint8)
    frames = []
    for t in range(n):
        y = bg.copy()
        x0 = 8 + 6 * t
        y[32:64, x0:x0 + 32] = 255
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, u.copy()))
    return frames


def test_tpl_offsets_shape_and_neutrality():
    frames = _moving_clip(192, 128)
    off = tpl_sb_offsets(frames[0][0], [f[0] for f in frames[1:]])
    assert off is not None
    assert off.shape == (2, 3)          # ceil(128/64) x ceil(192/64)
    assert off.dtype == np.int32
    # rate-neutral by construction (zero-mean before rounding)
    assert abs(off.mean()) <= 1.0
    assert off.min() >= -12 and off.max() <= 12
    # no lookahead -> disabled
    assert tpl_sb_offsets(frames[0][0], []) is None


def test_tpl_offsets_favor_referenced_area():
    """On a clip where the future is a still copy of the current frame,
    every block earns credit; on pure-noise lookahead (nothing predicts)
    offsets collapse to ~0."""
    rng = np.random.default_rng(3)
    still = rng.integers(0, 255, (128, 192)).astype(np.uint8)
    off_still = tpl_sb_offsets(still, [still.copy(), still.copy()])
    noise = [rng.integers(0, 255, (128, 192)).astype(np.uint8)
             for _ in range(2)]
    off_noise = tpl_sb_offsets(still, noise)
    # still content: strong uniform dependency -> spread is small but the
    # pre-normalized credit is high; noise: near-zero credit everywhere
    assert np.abs(off_noise).max() <= np.abs(off_still).max() + 1


def test_snap_sb_q_grid():
    sbq = np.array([[57, 63], [70, 121]], np.int32)
    out, res_log2 = snap_sb_q(120, sbq)
    assert res_log2 == 2
    res = 1 << res_log2
    # every value on the base_q residue grid, non-zero
    assert np.all((out - 120) % res == 0)
    assert np.all(out > 0)
    # low base_q -> full resolution, values unchanged
    out0, r0 = snap_sb_q(40, sbq)
    assert r0 == 0 and np.array_equal(out0, sbq)


@pytest.mark.parametrize("n_tiles", [1, 2])
def test_tpl_bitexact(n_tiles):
    """Key + P frames with TPL per-SB delta-q must decode bit-exact in
    dav1d (delta_q syntax on both walk types)."""
    w, h = 192, 128
    frames = _moving_clip(w, h)
    enc = FastIntraEncoder(w, h, qindex=120, n_tiles=n_tiles)
    enc.gop_size = 0
    outs = []
    for i, f in enumerate(frames):
        enc.tpl_offsets = tpl_sb_offsets(f[0],
                                         [g[0] for g in frames[i + 1:]])
        outs.append(enc.encode_frame(*f))
    decoded = decode_obus(b"".join(o.payload for o in outs))
    assert len(decoded) == len(outs)
    for d, o in zip(decoded, outs):
        assert np.array_equal(d.y, o.recon_y)
        assert np.array_equal(d.u, o.recon_u)
        assert np.array_equal(d.v, o.recon_v)


def test_tpl_with_variance_boost_bitexact():
    """TPL offsets compose with variance-boost absolute sb q."""
    w, h = 192, 128
    frames = _moving_clip(w, h)
    enc = FastIntraEncoder(w, h, qindex=120)
    enc.enable_variance_boost = True
    enc.tpl_offsets = tpl_sb_offsets(frames[0][0],
                                     [f[0] for f in frames[1:]])
    out = enc.encode_frame(*frames[0])
    d = decode_obus(out.payload)[0]
    assert np.array_equal(d.y, out.recon_y)
    assert np.array_equal(d.u, out.recon_u)
    assert np.array_equal(d.v, out.recon_v)


def test_tpl_gop_q_propagation_chain():
    """r0/beta backward induction on a constructed 3-frame dependency
    chain (the VERDICT round-3 done-criterion): anchor frames that the
    rest of the chain predicts from must get a FINER qstep than frames
    nothing references; credit must flow transitively A <- B <- C."""
    from svt_av1_psy_tpu.models.tpl import tpl_gop_q
    from svt_av1_psy_tpu.ops.quant import ac_q

    rng = np.random.default_rng(5)
    h, w = 64, 64
    # textured base frame; B and C are pure translations of A (fully
    # predictable), so all credit should flow back to A
    base = rng.integers(0, 255, (h + 16, w + 16)).astype(np.uint8)
    a = base[:h, :w]
    b = base[2:h + 2, 2:w + 2]          # B predicts perfectly from A
    c = base[4:h + 4, 4:w + 4]          # C predicts perfectly from B
    frames = {0: a, 1: b, 2: c}
    # plan: display 2 = ARF off base 0, display 1 = mid (0, 2)
    plan = [(2, 0, 0, 0), (1, 0, 2, 1)]
    q = tpl_gop_q(frames, plan, base_q=160, bd=8, strength=1.0,
                  key_d=0)
    # the ladder includes the key/base anchor's q (the kf_boost role)
    assert {0, 1, 2} <= set(q)
    # fully-predictable chain: the key takes a deep r0 boost, the ARF
    # (display 2) is referenced by the mid -> finer qstep; the mid
    # (display 1) is a leaf -> stays at base q
    assert ac_q(q[0], 8) < ac_q(q[2], 8), q
    assert ac_q(q[2], 8) < ac_q(160, 8), q
    assert q[1] == 160, q

    # transitivity: a longer chain 4 <- 2 <- 1/3 gives the deep anchor
    # (display 4) at least as much boost as in the short chain
    d = base[6:h + 6, 6:w + 6]
    e = base[8:h + 8, 8:w + 8]
    frames5 = {0: a, 1: b, 2: c, 3: d, 4: e}
    plan5 = [(4, 0, 0, 0), (2, 0, 4, 1), (1, 0, 2, 2), (3, 2, 4, 2)]
    q5 = tpl_gop_q(frames5, plan5, base_q=160, bd=8, strength=1.0,
                   key_d=0)
    # the mid anchor (2) is referenced by TWO frames + transitively
    # carries their flow; it must be boosted at least as much as a
    # leaf and the never-referenced leaves stay at base
    assert ac_q(q5[2], 8) < ac_q(160, 8), q5
    assert q5[1] == 160 and q5[3] == 160, q5
