"""Unit tests for the inter partition tree (models/inter_tree) and the
device fullpel SAD tree (ops/jax_backend.hme_sad_tree).

Reference model: the open-loop ME SAD tree of
Source/Lib/Codec/motion_estimation.c:781 feeding MD depth decisions."""

import numpy as np
import pytest

from svt_av1_psy_tpu.models.inter_tree import inter_split_maps


def _maps(n16r=8, n16c=8, fill=1):
    return {16: np.full((n16r, n16c), fill, np.uint8),
            32: np.full((n16r // 2, n16c // 2), fill, np.uint8),
            64: np.full((n16r // 4, n16c // 4), fill, np.uint8)}


def test_poor_prediction_keeps_intra_depth():
    """Cells with large prediction error keep the intra tree's 8x8
    splits; well-predicted cells drop them."""
    n16r = n16c = 8
    sad16 = np.zeros((n16r, n16c), np.int64)
    sad16[:4] = 64 * 1000          # poor upper half
    sad32 = np.zeros((4, 4), np.int64)
    sad64 = np.zeros((2, 2), np.int64)
    out = inter_split_maps([(sad16, sad32, sad64)], _maps(), qindex=120)
    assert out[16][:4].all()       # poor cells keep the split
    assert not out[16][4:].any()   # clean cells drop it


def test_gain_rule_adds_splits():
    """A node whose children's summed SADs beat its single-MV SAD by
    more than the bias splits even where the intra tree wouldn't
    (scroll seams, occlusion boundaries)."""
    n16r = n16c = 8
    sad16 = np.zeros((n16r, n16c), np.int64)
    sad32 = np.zeros((4, 4), np.int64)
    sad32[0, 0] = 10 ** 6          # children (0) beat the single MV
    sad64 = np.zeros((2, 2), np.int64)
    out = inter_split_maps([(sad16, sad32, sad64)], _maps(fill=0),
                           qindex=120)
    assert out[32][0, 0] == 1
    assert out[32][1:, :].sum() == 0


def test_multi_edge_min():
    """A block predicted well by ANY reference needn't split."""
    n16r = n16c = 8
    bad = (np.full((n16r, n16c), 64 * 1000, np.int64),
           np.zeros((4, 4), np.int64), np.zeros((2, 2), np.int64))
    good = (np.zeros((n16r, n16c), np.int64),
            np.zeros((4, 4), np.int64), np.zeros((2, 2), np.int64))
    out = inter_split_maps([bad, good], _maps(), qindex=120)
    assert not out[16].any()


def test_hme_sad_tree_matches_numpy():
    """Device SAD tree vs a numpy brute-force of the same definition."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from svt_av1_psy_tpu.ops.jax_backend import hme_sad_tree

    rng = np.random.default_rng(3)
    H = W = 128
    src = rng.integers(0, 255, (H, W), np.uint8)
    ref = rng.integers(0, 255, (H, W), np.uint8)
    n16r = n16c = H // 16
    mv16 = (2 * rng.integers(-4, 5, (n16r, n16c, 2))).astype(np.int16)
    s32, s64 = hme_sad_tree(jnp.asarray(src), jnp.asarray(ref),
                            jnp.asarray(mv16))
    s32, s64 = np.asarray(s32), np.asarray(s64)

    def halfres(p):
        p = p.astype(np.int64)
        return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] +
                p[1::2, 1::2] + 2) >> 2

    sh, rh = halfres(src), halfres(ref)
    mvh = mv16.astype(np.int64) >> 1

    def node_sad(sh, rh, r0, c0, bs, off):
        tot = 0
        for i in range(bs):
            for j in range(bs):
                y = min(max(r0 + i + off[0], 0), rh.shape[0] - 1)
                x = min(max(c0 + j + off[1], 0), rh.shape[1] - 1)
                tot += abs(int(sh[r0 + i, c0 + j]) - int(rh[y, x]))
        return tot

    # 32-level: best of the 4 children's MVs
    exp32 = np.zeros_like(s32)
    best_off32 = {}
    for br in range(n16r // 2):
        for bc in range(n16c // 2):
            cands = [mvh[2 * br + i, 2 * bc + j]
                     for i in (0, 1) for j in (0, 1)]
            sads = [node_sad(sh, rh, br * 16, bc * 16, 16, o)
                    for o in cands]
            k = int(np.argmin(sads))
            exp32[br, bc] = sads[k]
            best_off32[(br, bc)] = cands[k]
    assert np.array_equal(s32, exp32)
    # 64-level: best of the 4 children's (32-level winning) MVs
    exp64 = np.zeros_like(s64)
    for br in range(n16r // 4):
        for bc in range(n16c // 4):
            cands = [best_off32[(2 * br + i, 2 * bc + j)]
                     for i in (0, 1) for j in (0, 1)]
            sads = [node_sad(sh, rh, br * 32, bc * 32, 32, o)
                    for o in cands]
            exp64[br, bc] = min(sads)
    assert np.array_equal(s64, exp64)
