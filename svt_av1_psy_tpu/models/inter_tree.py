"""Inter-frame partition tree from the device full-pel SAD tree.

The reference drives inter partition depth from its open-loop ME tree
(ref motion_estimation.c open_loop_me_fullpel_search_sblock:781 — the
fullpel search produces SADs for the whole 8x8..64x64 block tree and
MD's depth decisions follow inter prediction quality). Our fast path
previously reused the INTRA source-SAD split tree on inter frames,
which on noisy content splits to 8x8 over most of the frame — an order
of magnitude more commit-walk RD trials than the reference runs, and a
partition-bit tax the low-rate tail cannot afford.

ops/jax_backend.hme_sad_tree supplies, per prediction edge, SADs at 32
and 64 granularity with each node evaluated at its children's winning
MVs (best single MV). The split rule is then the same cost shape the
device intra tree uses, but over INTER prediction error:

    split(node) when  sum(children SADs) + bias < node SAD
                 — finer MVs genuinely reduce prediction error by more
                   than the extra MV/mode/partition bits cost, or
              when  the intra tree splits AND prediction is poor
                 — occlusion reveals / uncovered detail code through
                   the walk's intra fallback, which needs depth.

16x16 -> 8x8 splits are allowed only where the intra tree wanted one
AND the inter prediction is poor: fine partitions purely for source
detail are exactly what inter skip blocks absorb for free.

Multiple edges (LAST[, ALTREF][, GOLDEN]) combine by elementwise min
at every level — a block predicted well by ANY reference needn't
split, and the walk's per-block RD picks the actual reference.
"""

from __future__ import annotations

import os

import numpy as np


def _pool_sum(a: np.ndarray, f: int = 2) -> np.ndarray:
    r, c = a.shape
    return a.reshape(r // f, f, c // f, f).sum(axis=(1, 3))


def _pool_max(a: np.ndarray, f: int) -> np.ndarray:
    r, c = a.shape
    return a.reshape(r // f, f, c // f, f).max(axis=(1, 3))


def inter_split_maps(edges: list, intra_split: dict, qindex: int,
                     bd: int = 8):
    """Build {64: s64, 32: s32, 16: s16} split maps for an inter frame.

    edges: list of (sad16, sad32, sad64) int arrays per prediction
    edge — half-res SADs from the device HME + SAD tree.
    intra_split: the device intra split maps (content-detail depth for
    the poor-prediction fallback). qindex/bd set the bias scale."""
    from svt_av1_psy_tpu.ops.quant import ac_q

    assert edges
    qstep = ac_q(qindex, bd) / (8.0 * (1 << (bd - 8)))
    s16 = edges[0][0].astype(np.int64)
    s32 = edges[0][1].astype(np.int64)
    s64 = edges[0][2].astype(np.int64)
    for e16, e32, e64 in edges[1:]:
        s16 = np.minimum(s16, e16.astype(np.int64))
        s32 = np.minimum(s32, e32.astype(np.int64))
        s64 = np.minimum(s64, e64.astype(np.int64))

    # split bias: the extra partition/mode/MV bits of coding 4 children
    # instead of 1 block, in half-res SAD units (lambda-ish: scales
    # with the quantizer). Tunable for the BD harness sweep.
    bias_k = float(os.environ.get("SVT_TREE_BIAS", "16"))
    noise_k = float(os.environ.get("SVT_TREE_NOISE", "0.5"))
    bias = bias_k * qstep

    # mean abs prediction error per half-res pixel, per 16x16 cell
    mad16 = s16.astype(np.float64) / 64.0
    poor16 = mad16 > noise_k * qstep

    i16 = np.asarray(intra_split[16]).astype(bool)
    i32 = np.asarray(intra_split[32]).astype(bool)
    i64 = np.asarray(intra_split[64]).astype(bool)

    split32 = (_pool_sum(s16) + bias < s32) | \
        (i32 & _pool_max(poor16.astype(np.uint8), 2).astype(bool))
    split64 = (_pool_sum(s32) + bias < s64) | \
        (i64 & _pool_max(poor16.astype(np.uint8), 4).astype(bool))
    split16 = i16 & poor16
    return {64: split64.astype(np.uint8), 32: split32.astype(np.uint8),
            16: split16.astype(np.uint8)}
