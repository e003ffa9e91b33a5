"""All-intra encoder model — the first end-to-end slice (SURVEY.md §7 step 2).

Fixed-QP KEY-frame encoder: 64x64 superblocks, PARTITION_NONE, largest-TX
DCT, non-directional intra mode search, no in-loop filters. Each stage here
is the trusted numpy reference for the batched JAX/Pallas path that replaces
it (the role the reference's C_DEFAULT kernels play for its SIMD backends,
ref: Source/Lib/C_DEFAULT/).

The model IS the conformance decoder for its own stream: recon is produced
with the normative inverse path, so dav1d's output must match bit-exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from svt_av1_psy_tpu.bitstream.headers import (FrameParams, SequenceParams,
                                               key_frame_temporal_unit)
from svt_av1_psy_tpu.constants import BlockSize, PredMode, TxSize, TxType
from svt_av1_psy_tpu.entropy.frame_context import FrameContext
from svt_av1_psy_tpu.entropy.tile_writer import (BlockRecord, TileWriter,
                                                 TxbData)
from svt_av1_psy_tpu.ops import intra as intra_ops
from svt_av1_psy_tpu.ops.quant import build_plane_quant, quantize_b
from svt_av1_psy_tpu.ops.transforms import (forward_transform_2d,
                                            inverse_transform_add)

SB = 64


@dataclass
class EncodedFrame:
    payload: bytes            # temporal unit (TD + [seq hdr] + frame OBU)
    recon_y: np.ndarray
    recon_u: np.ndarray
    recon_v: np.ndarray


def _code_plane_block(src: np.ndarray, recon: np.ndarray, x: int, y: int,
                      w: int, h: int, mode: int, tx_size: int, pq, bd: int):
    """Predict/transform/quantize/recon one plane block in place.

    Returns (qcoeff_compact, sse, ncoef)."""
    have_above = y > 0
    have_left = x > 0
    above, left, al = intra_ops.prepare_edges(recon, x, y, w, h,
                                              have_above, have_left, bd)
    pred = intra_ops.predict(mode, above, left, al, w, h,
                             have_above, have_left, bd)
    resid = src[y:y + h, x:x + w].astype(np.int32) - pred
    coeff = forward_transform_2d(resid, tx_size, int(TxType.DCT_DCT), bd)
    qcoeff, dqcoeff = quantize_b(coeff, tx_size, pq)
    rec = inverse_transform_add(dqcoeff, pred, tx_size, int(TxType.DCT_DCT),
                                bd)
    recon[y:y + h, x:x + w] = rec
    sse = int(((src[y:y + h, x:x + w].astype(np.int64) - rec) ** 2).sum())
    return qcoeff, sse, int(np.count_nonzero(qcoeff))


def _search_mode(src, recon, x, y, w, h, bd):
    """Pick the intra mode minimizing residual SAD (bring-up heuristic;
    the RD funnel replaces this — SURVEY.md §7 step 5)."""
    have_above = y > 0
    have_left = x > 0
    above, left, al = intra_ops.prepare_edges(recon, x, y, w, h,
                                              have_above, have_left, bd)
    block = src[y:y + h, x:x + w].astype(np.int32)
    best_mode, best_cost = int(PredMode.DC_PRED), None
    for m in intra_ops.SUPPORTED_MODES:
        pred = intra_ops.predict(int(m), above, left, al, w, h,
                                 have_above, have_left, bd)
        cost = int(np.abs(block - pred).sum())
        if best_cost is None or cost < best_cost:
            best_mode, best_cost = int(m), cost
    return best_mode


class IntraEncoder:
    """Fixed-QP all-intra encoder (KEY frames only)."""

    def __init__(self, width: int, height: int, qindex: int, bd: int = 8):
        assert width % SB == 0 and height % SB == 0, \
            "partial superblocks arrive with the partition pass"
        self.width, self.height = width, height
        self.qindex = qindex
        self.bd = bd
        self.seq = SequenceParams(width=width, height=height, bit_depth=bd,
                                  enable_cdef=False, enable_restoration=False)
        self.pq_y = build_plane_quant(qindex, bd=bd)
        self.pq_uv = build_plane_quant(qindex, bd=bd)
        self.frame_index = 0

    def encode_frame(self, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> EncodedFrame:
        w, h = self.width, self.height
        bd = self.bd
        dtype = np.uint8 if bd == 8 else np.uint16
        recon_y = np.zeros((h, w), dtype)
        recon_u = np.zeros((h // 2, w // 2), dtype)
        recon_v = np.zeros((h // 2, w // 2), dtype)

        mi_rows, mi_cols = h // 4, w // 4
        fc = FrameContext(self.qindex)
        tw = TileWriter(fc, mi_rows, mi_cols, sb_size=SB)

        for sby in range(0, h, SB):
            for sbx in range(0, w, SB):
                mi_r, mi_c = sby // 4, sbx // 4
                tw.write_partition_none(mi_r, mi_c, int(BlockSize.BLOCK_64X64))

                y_mode = _search_mode(y, recon_y, sbx, sby, SB, SB, bd)
                qy, _, ny = _code_plane_block(
                    y, recon_y, sbx, sby, SB, SB, y_mode,
                    int(TxSize.TX_64X64), self.pq_y, bd)
                cx, cy = sbx // 2, sby // 2
                uv_mode = _search_mode(u, recon_u, cx, cy, 32, 32, bd)
                qu, _, nu = _code_plane_block(
                    u, recon_u, cx, cy, 32, 32, uv_mode,
                    int(TxSize.TX_32X32), self.pq_uv, bd)
                qv, _, nv = _code_plane_block(
                    v, recon_v, cx, cy, 32, 32, uv_mode,
                    int(TxSize.TX_32X32), self.pq_uv, bd)

                skip = (ny + nu + nv) == 0
                rec = BlockRecord(
                    mi_row=mi_r, mi_col=mi_c,
                    bsize=int(BlockSize.BLOCK_64X64),
                    y_mode=y_mode, uv_mode=uv_mode, skip=skip,
                    txbs_y=[TxbData(qy, int(TxSize.TX_64X64),
                                    int(TxType.DCT_DCT))],
                    txbs_u=[TxbData(qu, int(TxSize.TX_32X32),
                                    int(TxType.DCT_DCT))],
                    txbs_v=[TxbData(qv, int(TxSize.TX_32X32),
                                    int(TxType.DCT_DCT))])
                tw.write_block(rec)
                tw._update_partition_ctx(mi_r, mi_c,
                                         int(BlockSize.BLOCK_64X64))

        tile = tw.finish()
        fr = FrameParams(base_q_idx=self.qindex,
                         order_hint=self.frame_index & 0x7F)
        payload = key_frame_temporal_unit(
            self.seq, fr, tile, with_seq_header=(self.frame_index == 0))
        self.frame_index += 1
        return EncodedFrame(payload=payload, recon_y=recon_y,
                            recon_u=recon_u, recon_v=recon_v)
