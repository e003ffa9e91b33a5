"""Tile symbol writer: partition tree, mode info, residuals + neighbor state.

Encoder mirror of the reference's per-tile entropy coding kernel
(ref: Source/Lib/Codec/ec_process.c:208, entropy_coding.c write_modes /
write_modes_b) driven by block records the encoder model produced. Maintains
every normative neighbor-context array (partition ctx, mode/skip rows,
per-plane packed coefficient contexts) so the emitted symbol+CDF sequence is
exactly what a conforming decoder expects.

One TileWriter per tile; tiles are independent (the TPU shard axis, SURVEY.md
§2.2 P4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from svt_av1_psy_tpu.constants import (BLOCK_SIZE_HIGH, BLOCK_SIZE_WIDE,
                                       PredMode, TxSize, BlockSize)
from svt_av1_psy_tpu.entropy import coeff_coder as cc
from svt_av1_psy_tpu.entropy.frame_context import FrameContext
from svt_av1_psy_tpu.entropy.range_coder import RangeEncoder

# intra_mode_context (libaom): mode -> kf_y cdf context bucket
_INTRA_MODE_CTX = [0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0]

# partition ctx byte per block dimension (above uses width, left height)
_PART_CTX = {4: 15, 8: 14, 16: 12, 32: 8, 64: 0, 128: 0}

# max_txsize_rect_lookup: largest tx for a block size (spec Max_Tx_Size_Rect)
MAX_TX_SIZE_RECT = [
    TxSize.TX_4X4, TxSize.TX_4X8, TxSize.TX_8X4, TxSize.TX_8X8,
    TxSize.TX_8X16, TxSize.TX_16X8, TxSize.TX_16X16, TxSize.TX_16X32,
    TxSize.TX_32X16, TxSize.TX_32X32, TxSize.TX_32X64, TxSize.TX_64X32,
    TxSize.TX_64X64, TxSize.TX_64X64, TxSize.TX_64X64, TxSize.TX_64X64,
    TxSize.TX_4X16, TxSize.TX_16X4, TxSize.TX_8X32, TxSize.TX_32X8,
    TxSize.TX_16X64, TxSize.TX_64X16,
]


def is_directional(mode: int) -> bool:
    return PredMode.V_PRED <= mode <= PredMode.D67_PRED


def use_angle_delta(bsize: int) -> bool:
    return (BLOCK_SIZE_WIDE[bsize] >= 8 and BLOCK_SIZE_HIGH[bsize] >= 8)


def cfl_allowed(bsize: int) -> bool:
    return (BLOCK_SIZE_WIDE[bsize] <= 32 and BLOCK_SIZE_HIGH[bsize] <= 32)


@dataclass
class TxbData:
    """One coded transform block: compact qcoeff + signaling info."""
    qcoeff: np.ndarray        # (ch, cw) int32, compact for 64-side
    tx_size: int
    tx_type: int


@dataclass
class BlockRecord:
    """One coded block (mode decision output) in coding order."""
    mi_row: int
    mi_col: int
    bsize: int
    y_mode: int
    uv_mode: int
    angle_delta_y: int = 0
    angle_delta_uv: int = 0
    skip: bool = False
    txbs_y: list = field(default_factory=list)    # list[TxbData]
    txbs_u: list = field(default_factory=list)
    txbs_v: list = field(default_factory=list)


class TileWriter:
    def __init__(self, fc: FrameContext, mi_rows: int, mi_cols: int,
                 sb_size: int = 64, ss_x: int = 1, ss_y: int = 1):
        self.fc = fc
        self.enc = RangeEncoder()
        self.mi_rows = mi_rows
        self.mi_cols = mi_cols
        self.sb_mi = sb_size // 4
        self.ss_x, self.ss_y = ss_x, ss_y
        # neighbor state
        self.above_part = np.zeros(mi_cols, np.uint8)
        self.left_part = np.zeros(mi_rows, np.uint8)
        self.above_mode = np.full(mi_cols, int(PredMode.DC_PRED), np.uint8)
        self.left_mode = np.full(mi_rows, int(PredMode.DC_PRED), np.uint8)
        self.above_skip = np.zeros(mi_cols, np.uint8)
        self.left_skip = np.zeros(mi_rows, np.uint8)
        # per-plane packed coefficient contexts (4-px units, chroma subsampled)
        self.above_coef = [np.zeros(mi_cols, np.uint8),
                           np.zeros((mi_cols + ss_x) >> ss_x, np.uint8),
                           np.zeros((mi_cols + ss_x) >> ss_x, np.uint8)]
        self.left_coef = [np.zeros(mi_rows, np.uint8),
                          np.zeros((mi_rows + ss_y) >> ss_y, np.uint8),
                          np.zeros((mi_rows + ss_y) >> ss_y, np.uint8)]

    # --- partition ------------------------------------------------------
    def write_partition_none(self, mi_row: int, mi_col: int, bsize: int):
        """PARTITION_NONE at a square size >= 8x8 fully inside the frame."""
        w4 = BLOCK_SIZE_WIDE[bsize] // 4
        bsl = (w4).bit_length() - 1          # 8x8 -> 1 ... 128 -> 5
        above = (int(self.above_part[mi_col]) >> bsl) & 1
        left = (int(self.left_part[mi_row]) >> bsl) & 1
        ctx = (bsl - 1) * 4 + left * 2 + above
        nsyms = 4 if bsl == 1 else (8 if bsl == 5 else 10)
        self.enc.encode_symbol(0, self.fc.partition[ctx], nsyms=nsyms,
                               adapt=True)

    def _update_partition_ctx(self, mi_row, mi_col, bsize):
        w4 = BLOCK_SIZE_WIDE[bsize] // 4
        h4 = BLOCK_SIZE_HIGH[bsize] // 4
        self.above_part[mi_col:mi_col + w4] = _PART_CTX[BLOCK_SIZE_WIDE[bsize]]
        self.left_part[mi_row:mi_row + h4] = _PART_CTX[BLOCK_SIZE_HIGH[bsize]]

    # --- mode info ------------------------------------------------------
    def write_block(self, b: BlockRecord):
        """Write mode info + residual for one block (KEY-frame intra)."""
        enc, fc = self.enc, self.fc
        r, c = b.mi_row, b.mi_col
        w4 = BLOCK_SIZE_WIDE[b.bsize] // 4
        h4 = BLOCK_SIZE_HIGH[b.bsize] // 4
        have_above = r > 0
        have_left = c > 0

        # skip (coded first in intra_frame_mode_info, spec 5.11.8)
        skip_ctx = int(self.above_skip[c]) + int(self.left_skip[r])
        enc.encode_symbol(int(b.skip), fc.skip[skip_ctx], adapt=True)

        # y mode (kf_y_cdf with above/left mode contexts)
        am = int(self.above_mode[c]) if have_above else int(PredMode.DC_PRED)
        lm = int(self.left_mode[r]) if have_left else int(PredMode.DC_PRED)
        enc.encode_symbol(b.y_mode,
                          fc.kf_y[_INTRA_MODE_CTX[am]][_INTRA_MODE_CTX[lm]],
                          adapt=True)
        if is_directional(b.y_mode) and use_angle_delta(b.bsize):
            enc.encode_symbol(b.angle_delta_y + 3,
                              fc.angle_delta[b.y_mode - PredMode.V_PRED],
                              adapt=True)

        # uv mode
        cfl_ok = cfl_allowed(b.bsize)
        enc.encode_symbol(b.uv_mode, fc.uv_mode[int(cfl_ok)][b.y_mode],
                          nsyms=14 if cfl_ok else 13, adapt=True)
        if b.uv_mode != PredMode.UV_CFL_PRED and is_directional(b.uv_mode) \
                and use_angle_delta(b.bsize):
            enc.encode_symbol(b.angle_delta_uv + 3,
                              fc.angle_delta[b.uv_mode - PredMode.V_PRED],
                              adapt=True)

        # neighbor updates for mode/skip
        self.above_mode[c:c + w4] = b.y_mode
        self.left_mode[r:r + h4] = b.y_mode
        self.above_skip[c:c + w4] = int(b.skip)
        self.left_skip[r:r + h4] = int(b.skip)

        # residual
        if b.skip:
            self._reset_skip_context(b)
            return
        self._write_residual(b)

    def _reset_skip_context(self, b: BlockRecord):
        r, c = b.mi_row, b.mi_col
        w4 = BLOCK_SIZE_WIDE[b.bsize] // 4
        h4 = BLOCK_SIZE_HIGH[b.bsize] // 4
        self.above_coef[0][c:c + w4] = 0
        self.left_coef[0][r:r + h4] = 0
        cw4 = max(1, w4 >> self.ss_x)
        ch4 = max(1, h4 >> self.ss_y)
        for p in (1, 2):
            self.above_coef[p][(c >> self.ss_x):(c >> self.ss_x) + cw4] = 0
            self.left_coef[p][(r >> self.ss_y):(r >> self.ss_y) + ch4] = 0

    # --- residual -------------------------------------------------------
    def _write_residual(self, b: BlockRecord):
        from svt_av1_psy_tpu.constants import TX_SIZE_HIGH, TX_SIZE_WIDE

        for plane, txbs in ((0, b.txbs_y), (1, b.txbs_u), (2, b.txbs_v)):
            ss_x = self.ss_x if plane else 0
            ss_y = self.ss_y if plane else 0
            base_c = b.mi_col >> ss_x
            base_r = b.mi_row >> ss_y
            # raster order of tx blocks within the plane block
            off_c = 0
            off_r = 0
            plane_w4 = max(1, (BLOCK_SIZE_WIDE[b.bsize] // 4) >> ss_x)
            for txb in txbs:
                tw4 = TX_SIZE_WIDE[txb.tx_size] // 4
                th4 = TX_SIZE_HIGH[txb.tx_size] // 4
                self._write_txb(plane, b, txb, base_r + off_r, base_c + off_c)
                off_c += tw4
                if off_c >= plane_w4:
                    off_c = 0
                    off_r += th4

    def _write_txb(self, plane: int, b: BlockRecord, txb: TxbData,
                   u_row: int, u_col: int):
        """u_row/u_col: position in the plane's 4-px unit grid."""
        from svt_av1_psy_tpu.constants import TX_SIZE_HIGH, TX_SIZE_WIDE

        enc, fc = self.enc, self.fc
        tw4 = TX_SIZE_WIDE[txb.tx_size] // 4
        th4 = TX_SIZE_HIGH[txb.tx_size] // 4
        above = self.above_coef[plane][u_col:u_col + tw4]
        left = self.left_coef[plane][u_row:u_row + th4]
        ptype = 1 if plane else 0
        txs_ctx = cc.txs_entropy_ctx(txb.tx_size)

        bw = BLOCK_SIZE_WIDE[b.bsize] >> (self.ss_x if plane else 0)
        bh = BLOCK_SIZE_HIGH[b.bsize] >> (self.ss_y if plane else 0)
        covers = (TX_SIZE_WIDE[txb.tx_size] >= bw and
                  TX_SIZE_HIGH[txb.tx_size] >= bh)
        larger = (bw * bh >
                  TX_SIZE_WIDE[txb.tx_size] * TX_SIZE_HIGH[txb.tx_size])
        sctx = cc.txb_skip_ctx(above, left, plane, covers, larger)

        all_zero = not np.any(txb.qcoeff)
        enc.encode_symbol(int(all_zero), fc.txb_skip[txs_ctx][sctx],
                          adapt=True)
        if all_zero:
            cul = 0
        else:
            # tx_type signaling: DCT-only sets write nothing (the only sets
            # the first slice emits); extended sets arrive with TX_MODE_SELECT
            sgn_ctx = cc.dc_sign_ctx(above, left)
            cul = cc.encode_txb(enc, fc, txb.qcoeff, txb.tx_size,
                                txb.tx_type, ptype, sctx, sgn_ctx)
        self.above_coef[plane][u_col:u_col + tw4] = cul
        self.left_coef[plane][u_row:u_row + th4] = cul

    def finish(self) -> bytes:
        return self.enc.done()
