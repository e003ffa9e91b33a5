"""Tile symbol parser — the decode-side mirror of entropy/tile_writer.py.

Part of the in-repo conformance decoder (role of libaom's RefDecoder in the
reference's e2e tests). Decodes KEY-frame tile data into block records +
quantized coefficients, maintaining the same normative neighbor contexts as
the writer. Used to (a) cross-parse bitstreams from other AV1 encoders to
validate context derivation, and (b) trace-diff our own encoder's streams.

Every symbol is appended to `trace` as (name, value) for debugging.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from svt_av1_psy_tpu.constants import (BLOCK_SIZE_HIGH, BLOCK_SIZE_WIDE,
                                       TX_SIZE_HIGH, TX_SIZE_SQR,
                                       TX_SIZE_SQR_UP, TX_SIZE_WIDE,
                                       BlockSize, PredMode, TxSize, TxType,
                                       get_scan)
from svt_av1_psy_tpu.entropy import coeff_coder as cc
from svt_av1_psy_tpu.entropy.frame_context import FrameContext
from svt_av1_psy_tpu.entropy.range_coder import RangeDecoder
from svt_av1_psy_tpu.entropy.tile_writer import (_INTRA_MODE_CTX, _PART_CTX,
                                                 MAX_TX_SIZE_RECT,
                                                 cfl_allowed, has_chroma,
                                                 is_directional,
                                                 use_angle_delta)

from svt_av1_psy_tpu.entropy.tx_trees import (SUB_TX as _SUB_TX,
                                              max_tx_depth as _max_tx_depth_fn,
                                              tx_size_cat as _tx_size_cat_fn)

from svt_av1_psy_tpu.entropy.tx_sets import (EXT_TX_INV, EXT_TX_SET_SIZES,
                                             intra_tx_set, uv_tx_type)


@dataclass
class ParsedBlock:
    mi_row: int
    mi_col: int
    bsize: int
    y_mode: int
    uv_mode: int
    angle_delta_y: int = 0
    angle_delta_uv: int = 0
    skip: bool = False
    tx_size: int = 0
    cfl_joint_sign: int = -1
    cfl_idx_u: int = 0
    cfl_idx_v: int = 0
    use_filter_intra: bool = False
    filter_intra_mode: int = 0
    txbs: list = field(default_factory=list)   # (plane, u_row, u_col, TxSize, TxType, qcoeff|None)


class TileParser:
    def __init__(self, fc: FrameContext, data: bytes, mi_rows: int,
                 mi_cols: int, *, sb_size: int = 64,
                 tx_mode_select: bool = False, reduced_tx_set: bool = False,
                 delta_q_present: bool = False, allow_update_cdf: bool = True,
                 enable_filter_intra: bool = False, cdef_bits: int = -1):
        self.fc = fc
        self.dec = RangeDecoder(data)
        self.mi_rows, self.mi_cols = mi_rows, mi_cols
        self.sb_mi = sb_size // 4
        self.tx_mode_select = tx_mode_select
        self.reduced_tx_set = reduced_tx_set
        self.delta_q_present = delta_q_present
        self.adapt = allow_update_cdf
        self.enable_filter_intra = enable_filter_intra
        self.ss_x = self.ss_y = 1
        self.trace: list = []
        self.events: list = []   # ('part',r,c,bsize,part) | ('block',ParsedBlock) | ('pctx',r,c,bsize,sub)
        self.blocks: list[ParsedBlock] = []
        self.read_deltas = False
        # cdef_idx per 64x64 unit (-1 = unset; spec 5.11.56 read_cdef).
        # cdef_bits < 0 disables the syntax (no cdef in frame header).
        self.cdef_bits = cdef_bits
        self.cdef_idx = np.full(((mi_rows + 15) // 16, (mi_cols + 15) // 16),
                                -1, np.int32)

        self.above_part = np.zeros(mi_cols, np.uint8)
        self.left_part = np.zeros(mi_rows, np.uint8)
        self.above_mode = np.full(mi_cols, int(PredMode.DC_PRED), np.uint8)
        self.left_mode = np.full(mi_rows, int(PredMode.DC_PRED), np.uint8)
        self.above_skip = np.zeros(mi_cols, np.uint8)
        self.left_skip = np.zeros(mi_rows, np.uint8)
        # txfm context: above stores tx widths, left tx heights (px per 4-unit)
        self.above_txw = np.full(mi_cols, 64, np.int32)
        self.left_txh = np.full(mi_rows, 64, np.int32)
        self.above_coef = [np.zeros(mi_cols, np.uint8),
                           np.zeros((mi_cols + 1) >> 1, np.uint8),
                           np.zeros((mi_cols + 1) >> 1, np.uint8)]
        self.left_coef = [np.zeros(mi_rows, np.uint8),
                          np.zeros((mi_rows + 1) >> 1, np.uint8),
                          np.zeros((mi_rows + 1) >> 1, np.uint8)]

    # --- symbol helpers --------------------------------------------------
    def _sym(self, name, cdf, nsyms=None):
        v = self.dec.decode_symbol(cdf, nsyms=nsyms, adapt=self.adapt)
        self.trace.append((name, v))
        return v

    def _lit(self, name, bits):
        v = self.dec.decode_literal(bits)
        self.trace.append((name, v))
        return v

    # --- top level -------------------------------------------------------
    def parse_tile(self):
        for sbr in range(0, self.mi_rows, self.sb_mi):
            for sbc in range(0, self.mi_cols, self.sb_mi):
                self.read_deltas = self.delta_q_present
                self._parse_partition(sbr, sbc, int(BlockSize.BLOCK_64X64))
        return self.blocks

    def _parse_partition(self, r, c, bsize):
        if r >= self.mi_rows or c >= self.mi_cols:
            return
        w4 = BLOCK_SIZE_WIDE[bsize] // 4
        h4 = BLOCK_SIZE_HIGH[bsize] // 4
        has_rows = r + h4 // 2 < self.mi_rows
        has_cols = c + w4 // 2 < self.mi_cols
        bsl = w4.bit_length() - 1
        if bsize == int(BlockSize.BLOCK_8X8):
            nsyms = 4
        elif bsize == int(BlockSize.BLOCK_128X128):
            nsyms = 8
        else:
            nsyms = 10
        if bsize < int(BlockSize.BLOCK_8X8):
            part = 0
            ctx = 0
        else:
            above = (int(self.above_part[c]) >> (bsl - 1)) & 1
            left = (int(self.left_part[r]) >> (bsl - 1)) & 1
            ctx = (bsl - 1) * 4 + left * 2 + above
        if bsize < int(BlockSize.BLOCK_8X8):
            pass
        elif has_rows and has_cols:
            part = self._sym(f"partition@{r},{c},{bsize}",
                             self.fc.partition[ctx], nsyms=nsyms)
        elif not has_rows and not has_cols:
            part = 3
        else:
            from svt_av1_psy_tpu.entropy.tile_writer import TileWriter as _TW

            icdf = _TW._gather_bool_icdf(self.fc.partition[ctx],
                                         not has_rows, bsize)
            bit = self.dec.decode_symbol(icdf, nsyms=2, adapt=False)
            self.trace.append((f"split_or_{'horz' if not has_rows else 'vert'}"
                               f"@{r},{c}", bit))
            if bit:
                part = 3
            else:
                part = 1 if not has_rows else 2

        self.events.append(('part', r, c, bsize, part))
        half4 = w4 // 2
        sub = _subsize(bsize, part)
        if part == 0:                       # NONE
            self._parse_block(r, c, bsize)
            self._update_part_ctx(r, c, bsize, bsize)
        elif part == 3:                     # SPLIT
            self._parse_partition(r, c, sub)
            self._parse_partition(r, c + half4, sub)
            self._parse_partition(r + half4, c, sub)
            self._parse_partition(r + half4, c + half4, sub)
        elif part == 1:                     # HORZ
            self._parse_block(r, c, sub)
            if r + h4 // 2 < self.mi_rows:
                self._parse_block(r + half4, c, sub)
            self._update_part_ctx(r, c, bsize, sub)
        elif part == 2:                     # VERT
            self._parse_block(r, c, sub)
            if c + w4 // 2 < self.mi_cols:
                self._parse_block(r, c + half4, sub)
            self._update_part_ctx(r, c, bsize, sub)
        else:
            sq = _subsize(bsize, 3)         # quarter square
            if part == 4:                   # HORZ_A: 2 squares / wide rect
                self._parse_block(r, c, sq)
                self._parse_block(r, c + half4, sq)
                self._parse_block(r + half4, c, sub)
                self._update_part_ctx(r, c, sub, sq)
                self._update_part_ctx(r + half4, c, sub, sub)
            elif part == 5:                 # HORZ_B: wide rect / 2 squares
                self._parse_block(r, c, sub)
                self._parse_block(r + half4, c, sq)
                self._parse_block(r + half4, c + half4, sq)
                self._update_part_ctx(r, c, sub, sub)
                self._update_part_ctx(r + half4, c, sub, sq)
            elif part == 6:                 # VERT_A: 2 squares | tall rect
                self._parse_block(r, c, sq)
                self._parse_block(r + half4, c, sq)
                self._parse_block(r, c + half4, sub)
                self._update_part_ctx(r, c, sub, sq)
                self._update_part_ctx(r, c + half4, sub, sub)
            elif part == 7:                 # VERT_B: tall rect | 2 squares
                self._parse_block(r, c, sub)
                self._parse_block(r, c + half4, sq)
                self._parse_block(r + half4, c + half4, sq)
                self._update_part_ctx(r, c, sub, sub)
                self._update_part_ctx(r, c + half4, sub, sq)
            elif part == 8:                 # HORZ_4
                q4 = h4 // 4
                for i in range(4):
                    if r + i * q4 >= self.mi_rows:
                        break
                    self._parse_block(r + i * q4, c, sub)
                self._update_part_ctx(r, c, bsize, sub)
            elif part == 9:                 # VERT_4
                q4 = w4 // 4
                for i in range(4):
                    if c + i * q4 >= self.mi_cols:
                        break
                    self._parse_block(r, c + i * q4, sub)
                self._update_part_ctx(r, c, bsize, sub)
            else:
                raise NotImplementedError(f"partition {part}")

    def _update_part_ctx(self, r, c, bsize, subsize):
        self.events.append(('pctx', r, c, bsize, subsize))
        w4 = BLOCK_SIZE_WIDE[bsize] // 4
        h4 = BLOCK_SIZE_HIGH[bsize] // 4
        self.above_part[c:c + w4] = _PART_CTX[BLOCK_SIZE_WIDE[subsize]]
        self.left_part[r:r + h4] = _PART_CTX[BLOCK_SIZE_HIGH[subsize]]

    # --- block -----------------------------------------------------------
    def _parse_block(self, r, c, bsize):
        fc = self.fc
        w4 = BLOCK_SIZE_WIDE[bsize] // 4
        h4 = BLOCK_SIZE_HIGH[bsize] // 4
        have_above = r > 0
        have_left = c > 0

        skip_ctx = int(self.above_skip[c]) + int(self.left_skip[r])
        skip = bool(self._sym(f"skip@{r},{c}", fc.skip[skip_ctx]))

        # read_cdef (spec 5.11.56): first non-skip block per 64x64 unit
        if self.cdef_bits >= 0 and not skip:
            r64, c64 = r >> 4, c >> 4
            if self.cdef_idx[r64, c64] < 0:
                v = 0
                for _ in range(self.cdef_bits):
                    v = (v << 1) | self._lit("cdef_idx_bit", 1)
                for i in range(r64, min((r + h4 + 15) >> 4,
                                        self.cdef_idx.shape[0])):
                    for j in range(c64, min((c + w4 + 15) >> 4,
                                            self.cdef_idx.shape[1])):
                        self.cdef_idx[i, j] = v

        # read_delta_qindex (sb-size blocks with skip don't read)
        if self.read_deltas:
            if getattr(self, 'dbg_dq_nonskip_only', False):
                dq_code = not skip
            else:
                dq_code = not (w4 == self.sb_mi and h4 == self.sb_mi and skip)
            if dq_code:
                abs_q = self._sym("delta_q_abs", fc.delta_q)
                if abs_q == 3:
                    rem = self._lit("delta_q_rem_bits", 3) + 1
                    abs_q = self._lit("delta_q_abs_bits", rem) + (1 << rem) + 1
                sign = 0
                if abs_q:
                    sign = self._lit("delta_q_sign", 1)
                self.events.append(('dq', abs_q, sign))
            self.read_deltas = False

        am = int(self.above_mode[c]) if have_above else int(PredMode.DC_PRED)
        lm = int(self.left_mode[r]) if have_left else int(PredMode.DC_PRED)
        y_mode = self._sym(
            f"y_mode@{r},{c}",
            fc.kf_y[_INTRA_MODE_CTX[am]][_INTRA_MODE_CTX[lm]])
        ad_y = 0
        if is_directional(y_mode) and use_angle_delta(bsize):
            ad_y = self._sym("angle_y",
                             fc.angle_delta[y_mode - PredMode.V_PRED]) - 3

        hc = has_chroma(r, c, bsize)
        cfl_ok = cfl_allowed(bsize)
        uv_mode = int(PredMode.DC_PRED)
        if hc:
            uv_mode = self._sym(f"uv_mode@{r},{c}",
                                fc.uv_mode[int(cfl_ok)][y_mode],
                                nsyms=14 if cfl_ok else 13)
        ad_uv = 0
        cfl_js, cfl_u, cfl_v = -1, 0, 0
        if not hc:
            pass
        elif uv_mode == int(PredMode.UV_CFL_PRED):
            cfl_js = self._sym("cfl_sign", fc.cfl_sign)
            sign_u = ((cfl_js + 1) * 11) >> 5
            sign_v = (cfl_js + 1) - 3 * sign_u
            if sign_u != 0:
                cfl_u = self._sym("cfl_alpha_u",
                                  fc.cfl_alpha[cfl_js + 1 - 3])
            if sign_v != 0:
                cfl_v = self._sym("cfl_alpha_v",
                                  fc.cfl_alpha[sign_v * 3 + sign_u - 3])
        elif is_directional(uv_mode) and use_angle_delta(bsize):
            ad_uv = self._sym("angle_uv",
                              fc.angle_delta[uv_mode - PredMode.V_PRED]) - 3

        # palette: requires allow_screen_content_tools (assumed off)
        use_fi, fi_mode = False, 0
        if (self.enable_filter_intra and y_mode == int(PredMode.DC_PRED)
                and BLOCK_SIZE_WIDE[bsize] <= 32
                and BLOCK_SIZE_HIGH[bsize] <= 32):
            use_fi = bool(self._sym("filter_intra", fc.filter_intra[bsize]))
            if use_fi:
                fi_mode = self._sym("filter_intra_mode", fc.filter_intra_mode)

        # tx size
        max_tx = int(MAX_TX_SIZE_RECT[bsize])
        tx_size = max_tx
        if self.tx_mode_select and bsize > int(BlockSize.BLOCK_4X4) \
                and not (skip and getattr(self, 'dbg_no_skip_txd', False)):
            max_depth = _max_tx_depth(bsize)
            if max_depth > 0:
                cat = _tx_size_cat(bsize)
                ctx = self._tx_size_ctx(r, c, bsize, have_above, have_left)
                depth = self._sym(f"tx_depth@{r},{c}",
                                  fc.tx_size[cat][ctx],
                                  nsyms=max_depth + 1)
                for _ in range(depth):
                    tx_size = int(_SUB_TX[tx_size])
        blk = ParsedBlock(mi_row=r, mi_col=c, bsize=bsize, y_mode=y_mode,
                          uv_mode=uv_mode, angle_delta_y=ad_y,
                          angle_delta_uv=ad_uv, skip=skip, tx_size=tx_size,
                          cfl_joint_sign=cfl_js, cfl_idx_u=cfl_u,
                          cfl_idx_v=cfl_v, use_filter_intra=use_fi,
                          filter_intra_mode=fi_mode)

        # txfm context update
        self.above_txw[c:c + w4] = TX_SIZE_WIDE[tx_size]
        self.left_txh[r:r + h4] = TX_SIZE_HIGH[tx_size]
        self.above_mode[c:c + w4] = y_mode
        self.left_mode[r:r + h4] = y_mode
        self.above_skip[c:c + w4] = int(skip)
        self.left_skip[r:r + h4] = int(skip)

        if skip:
            self.above_coef[0][c:c + w4] = 0
            self.left_coef[0][r:r + h4] = 0
            for p in (1, 2):
                cw4 = max(1, w4 >> 1)
                ch4 = max(1, h4 >> 1)
                self.above_coef[p][(c >> 1):(c >> 1) + cw4] = 0
                self.left_coef[p][(r >> 1):(r >> 1) + ch4] = 0
        else:
            self._parse_residual(blk)
        self.blocks.append(blk)
        self.events.append(('block', blk))

    def _tx_size_ctx(self, r, c, bsize, have_above, have_left) -> int:
        max_tx = int(MAX_TX_SIZE_RECT[bsize])
        aw = int(self.above_txw[c]) >= TX_SIZE_WIDE[max_tx]
        lh = int(self.left_txh[r]) >= TX_SIZE_HIGH[max_tx]
        if have_above and have_left:
            return int(aw) + int(lh)
        if have_above:
            return int(aw)
        if have_left:
            return int(lh)
        return 0

    # --- residual --------------------------------------------------------
    def _parse_residual(self, blk: ParsedBlock):
        bsize = blk.bsize
        hc = has_chroma(blk.mi_row, blk.mi_col, bsize)
        for plane in range(3 if hc else 1):
            ss = 1 if plane else 0
            bw = BLOCK_SIZE_WIDE[bsize] >> ss
            bh = BLOCK_SIZE_HIGH[bsize] >> ss
            if plane == 0:
                tx = blk.tx_size
            else:
                tx = _chroma_tx_size(bsize)
            tw, th = TX_SIZE_WIDE[tx], TX_SIZE_HIGH[tx]
            base_r = blk.mi_row >> ss
            base_c = blk.mi_col >> ss
            for oy in range(0, bh, th):
                for ox in range(0, bw, tw):
                    self._parse_txb(blk, plane, tx,
                                    base_r + oy // 4, base_c + ox // 4,
                                    bw, bh)

    def _parse_txb(self, blk, plane, tx_size, u_row, u_col, bw, bh):
        fc = self.fc
        tw4 = TX_SIZE_WIDE[tx_size] // 4
        th4 = TX_SIZE_HIGH[tx_size] // 4
        above = self.above_coef[plane][u_col:u_col + tw4]
        left = self.left_coef[plane][u_row:u_row + th4]
        ptype = 1 if plane else 0
        txs_ctx = cc.txs_entropy_ctx(tx_size)
        covers = (TX_SIZE_WIDE[tx_size] >= bw and TX_SIZE_HIGH[tx_size] >= bh)
        larger = bw * bh > TX_SIZE_WIDE[tx_size] * TX_SIZE_HIGH[tx_size]
        sctx = cc.txb_skip_ctx(above, left, plane, covers, larger)
        all_zero = self._sym(f"txb_skip p{plane}@{u_row},{u_col}",
                             fc.txb_skip[txs_ctx][sctx])
        if all_zero:
            self.above_coef[plane][u_col:u_col + tw4] = 0
            self.left_coef[plane][u_row:u_row + th4] = 0
            blk.txbs.append((plane, u_row, u_col, tx_size,
                             int(TxType.DCT_DCT), None))
            return

        # tx type
        if plane == 0:
            from svt_av1_psy_tpu.entropy.tx_sets import FIMODE_TO_INTRADIR
            tx_set = intra_tx_set(tx_size, self.reduced_tx_set)
            if tx_set == 0:
                tx_type = int(TxType.DCT_DCT)
            else:
                mode = (FIMODE_TO_INTRADIR[blk.filter_intra_mode]
                        if blk.use_filter_intra else blk.y_mode)
                s = self._sym(
                    "tx_type",
                    fc.intra_ext_tx[tx_set][TX_SIZE_SQR[tx_size]][mode],
                    nsyms=EXT_TX_SET_SIZES[tx_set])
                tx_type = EXT_TX_INV[tx_set][s]
        else:
            tx_type = uv_tx_type(blk.uv_mode, tx_size, self.reduced_tx_set)

        qcoeff, cul = self._parse_coeffs(tx_size, tx_type, ptype, above, left)
        self.above_coef[plane][u_col:u_col + tw4] = cul
        self.left_coef[plane][u_row:u_row + th4] = cul
        blk.txbs.append((plane, u_row, u_col, tx_size, tx_type, qcoeff))

    def _parse_coeffs(self, tx_size, tx_type, ptype, above, left):
        from svt_av1_psy_tpu.ops.quant import adjusted_tx_size

        fc = self.fc
        adj = adjusted_tx_size(tx_size)
        w, h = TX_SIZE_WIDE[adj], TX_SIZE_HIGH[adj]
        real_w, real_h = TX_SIZE_WIDE[tx_size], TX_SIZE_HIGH[tx_size]
        bwl = w.bit_length() - 1
        txs_ctx = cc.txs_entropy_ctx(tx_size)
        tx_class = cc.tx_class_of(tx_type)
        scan = get_scan(tx_size, tx_type)

        ems = cc.eob_multi_size(tx_size)
        eob_multi_ctx = 0 if tx_class == cc.TX_CLASS_2D else 1
        eob_pt = 1 + self._sym("eob_pt",
                               fc.eob_flag(ems)[ptype][eob_multi_ctx],
                               nsyms=ems + 5)
        _, _, nbits = cc.get_eob_pos_token_from_pt(eob_pt)
        if nbits > 0:
            hi = self._sym("eob_hi", fc.eob_extra[txs_ctx][ptype][eob_pt])
            extra = hi << (nbits - 1)
            for i in range(1, nbits):
                extra |= self._lit("eob_bit", 1) << (nbits - 1 - i)
        else:
            extra = 0
        group_start = 1 if eob_pt == 1 else (
            2 if eob_pt == 2 else (1 << (eob_pt - 2)) + 1)
        eob = group_start + extra

        qcoeff = np.zeros((h, w), np.int32)
        levels = np.zeros((h + 4, w + cc.TX_PAD_HOR), np.uint8)
        for ci in range(eob - 1, -1, -1):
            pos = int(scan[ci])
            row, col = pos >> bwl, pos & (w - 1)
            if ci == eob - 1:
                ctx = cc.base_eob_ctx(ci, w, h)
                level = 1 + self._sym(
                    "base_eob", fc.coeff_base_eob[txs_ctx][ptype][ctx])
            else:
                ctx = cc.base_ctx(levels, row, col, w, h, tx_class,
                                  real_w, real_h)
                level = self._sym("base",
                                  fc.coeff_base[txs_ctx][ptype][ctx])
            if level > cc.NUM_BASE_LEVELS:
                bctx = cc.br_ctx(levels, row, col, tx_class)
                cdf_br = fc.coeff_br[min(txs_ctx, cc.MAX_TX_32_CTX)][ptype][bctx]
                idx = 0
                while idx < cc.COEFF_BASE_RANGE:
                    k = self._sym("br", cdf_br, nsyms=cc.BR_CDF_SIZE)
                    level += k
                    if k < cc.BR_CDF_SIZE - 1:
                        break
                    idx += cc.BR_CDF_SIZE - 1
            levels[row, col] = min(level, 127)
            qcoeff[row, col] = level

        sctx = cc.dc_sign_ctx(above, left)
        cul = 0
        for ci in range(eob):
            pos = int(scan[ci])
            row, col = pos >> bwl, pos & (w - 1)
            level = int(qcoeff[row, col])
            if level:
                if ci == 0:
                    sign = self._sym("dc_sign", fc.dc_sign[ptype][sctx])
                else:
                    sign = self._lit("sign", 1)
                if level > cc.COEFF_BASE_RANGE + cc.NUM_BASE_LEVELS:
                    level += self._read_golomb()
                qcoeff[row, col] = -level if sign else level
                cul += level
        cul = min(cc.COEFF_CONTEXT_MASK, cul)
        dc = int(qcoeff[0, 0])
        if dc < 0:
            cul |= 1 << cc.COEFF_CONTEXT_BITS
        elif dc > 0:
            cul += 2 << cc.COEFF_CONTEXT_BITS
        return qcoeff, cul

    def _read_golomb(self) -> int:
        length = 1
        while self.dec.decode_literal(1) == 0:
            length += 1
            if length > 32:
                raise ValueError("golomb desync")
        v = 1
        for _ in range(length - 1):
            v = (v << 1) | self.dec.decode_literal(1)
        self.trace.append(("golomb", v - 1))
        return v - 1


def _subsize(bsize: int, part: int) -> int:
    """spec Partition_Subsize (all 10 partition types)."""
    B = BlockSize
    b = B(bsize)
    # (NONE, HORZ, VERT, SPLIT, HORZ_A, HORZ_B, VERT_A, VERT_B, H4, V4)
    table = {
        B.BLOCK_4X4: (B.BLOCK_4X4,) + (None,) * 9,
        B.BLOCK_8X8: (B.BLOCK_8X8, B.BLOCK_8X4, B.BLOCK_4X8, B.BLOCK_4X4,
                      B.BLOCK_8X4, B.BLOCK_8X4, B.BLOCK_4X8, B.BLOCK_4X8,
                      None, None),
        B.BLOCK_16X16: (B.BLOCK_16X16, B.BLOCK_16X8, B.BLOCK_8X16,
                        B.BLOCK_8X8, B.BLOCK_16X8, B.BLOCK_16X8,
                        B.BLOCK_8X16, B.BLOCK_8X16, B.BLOCK_16X4,
                        B.BLOCK_4X16),
        B.BLOCK_32X32: (B.BLOCK_32X32, B.BLOCK_32X16, B.BLOCK_16X32,
                        B.BLOCK_16X16, B.BLOCK_32X16, B.BLOCK_32X16,
                        B.BLOCK_16X32, B.BLOCK_16X32, B.BLOCK_32X8,
                        B.BLOCK_8X32),
        B.BLOCK_64X64: (B.BLOCK_64X64, B.BLOCK_64X32, B.BLOCK_32X64,
                        B.BLOCK_32X32, B.BLOCK_64X32, B.BLOCK_64X32,
                        B.BLOCK_32X64, B.BLOCK_32X64, B.BLOCK_64X16,
                        B.BLOCK_16X64),
        B.BLOCK_128X128: (B.BLOCK_128X128, B.BLOCK_128X64, B.BLOCK_64X128,
                          B.BLOCK_64X64, B.BLOCK_128X64, B.BLOCK_128X64,
                          B.BLOCK_64X128, B.BLOCK_64X128, None, None),
    }
    sub = table[b][part]
    assert sub is not None, (bsize, part)
    return int(sub)


_max_tx_depth = _max_tx_depth_fn
_tx_size_cat = _tx_size_cat_fn


def _chroma_tx_size(bsize: int) -> int:
    """Max chroma tx for a 4:2:0 block: max rect tx of the ss'd bsize,
    capped at 32x32."""
    w = max(4, BLOCK_SIZE_WIDE[bsize] >> 1)
    h = max(4, BLOCK_SIZE_HIGH[bsize] >> 1)
    for ts in range(19):
        if TX_SIZE_WIDE[ts] == min(w, 32) and TX_SIZE_HIGH[ts] == min(h, 32):
            return ts
    raise ValueError((w, h))
