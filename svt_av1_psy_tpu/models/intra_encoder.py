"""All-intra encoder model — partition tree + arbitrary resolutions.

KEY-frame encoder: recursive square partitioning 64→32→16→8 decided by a
device-computed open-loop mode search (ops/jax_backend.block_mode_costs — the
P2-style batched stage of SURVEY.md §7), then a host commit pass that
re-predicts from exact recon edges (the wavefront the format demands),
transforms/quantizes with the reference-exact integer path and emits symbols
through the tile writer.

Arbitrary resolutions follow the spec's MI geometry: MiCols = 2*((w+7)>>3);
partial superblocks use boundary partition coding and clamped edge reads
(spec 5.11.4 / 7.11.2).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from svt_av1_psy_tpu.bitstream.headers import (FrameParams, SequenceParams,
                                               key_frame_temporal_unit)
from svt_av1_psy_tpu.constants import (BLOCK_SIZE_HIGH, BLOCK_SIZE_WIDE,
                                       BlockSize, Partition, PredMode, TxSize,
                                       TxType)
from svt_av1_psy_tpu.entropy.frame_context import FrameContext
from svt_av1_psy_tpu.entropy.tile_writer import (BlockRecord, TileWriter,
                                                 TxbData)
from svt_av1_psy_tpu.entropy.tx_sets import uv_tx_type
from svt_av1_psy_tpu.ops import intra as intra_ops
from svt_av1_psy_tpu.ops.quant import build_plane_quant, quantize_b, ac_q
from svt_av1_psy_tpu.ops.transforms import (forward_transform_2d,
                                            inverse_transform_add)

SB = 64
_SQ_BSIZE = {64: int(BlockSize.BLOCK_64X64), 32: int(BlockSize.BLOCK_32X32),
             16: int(BlockSize.BLOCK_16X16), 8: int(BlockSize.BLOCK_8X8)}
_SQ_TX = {64: int(TxSize.TX_64X64), 32: int(TxSize.TX_32X32),
          16: int(TxSize.TX_16X16), 8: int(TxSize.TX_8X8),
          4: int(TxSize.TX_4X4)}


@dataclass
class EncodedFrame:
    payload: bytes
    recon_y: np.ndarray          # display-size crops
    recon_u: np.ndarray
    recon_v: np.ndarray


import functools


@functools.lru_cache(maxsize=1)
def _jitted_block_costs():
    import jax

    from svt_av1_psy_tpu.ops.jax_backend import block_mode_costs

    return jax.jit(block_mode_costs, static_argnums=(1, 2))


def _pad_to(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _clamped_edges(recon, x, y, w, h, max_x, max_y, have_above, have_left,
                   bd):
    """spec 7.11.2 edge prep with Min(maxX, …) coordinate clamping."""
    base = 1 << (bd - 1)
    xs = np.minimum(np.arange(x, x + w), max_x)
    ys = np.minimum(np.arange(y, y + h), max_y)
    if have_above:
        above = recon[y - 1, xs].astype(np.int32)
    elif have_left:
        above = np.full(w, int(recon[y, x - 1]), np.int32)
    else:
        above = np.full(w, base - 1, np.int32)
    if have_left:
        left = recon[ys, x - 1].astype(np.int32)
    elif have_above:
        left = np.full(h, int(recon[y - 1, x]), np.int32)
    else:
        left = np.full(h, base + 1, np.int32)
    if have_above and have_left:
        al = int(recon[y - 1, x - 1])
    elif have_above:
        al = int(recon[y - 1, x])
    elif have_left:
        al = int(recon[y, x - 1])
    else:
        al = base
    return above, left, al


class IntraEncoder:
    """Fixed-QP all-intra encoder (KEY frames only), arbitrary resolution."""

    def __init__(self, width: int, height: int, qindex: int, bd: int = 8,
                 min_block: int = 8, use_device_search: bool = True,
                 backend: str = "native"):
        if backend == "native":
            try:
                from svt_av1_psy_tpu import native
                native.ensure_txfms()
            except Exception:
                backend = "python"
        self.backend = backend
        assert width % 2 == 0 and height % 2 == 0
        self.width, self.height = width, height
        self.qindex = qindex
        self.bd = bd
        self.min_block = min_block
        self.use_device_search = use_device_search
        self.mi_cols = 2 * ((width + 7) >> 3)
        self.mi_rows = 2 * ((height + 7) >> 3)
        self.aw = self.mi_cols * 4            # MI-aligned dims
        self.ah = self.mi_rows * 4
        self.paw = (self.aw + SB - 1) // SB * SB   # SB-padded for search
        self.pah = (self.ah + SB - 1) // SB * SB
        self.seq = SequenceParams(width=width, height=height, bit_depth=bd,
                                  enable_cdef=False, enable_restoration=False)
        self.pq_y = build_plane_quant(qindex, bd=bd)
        self.pq_uv = build_plane_quant(qindex, bd=bd)
        self.frame_index = 0

    # --- open-loop decisions (device) -----------------------------------
    def _decide(self, yp: np.ndarray):
        """Per-size best modes/costs + split decisions from source pixels."""
        import jax.numpy as jnp

        sizes = [s for s in (64, 32, 16, 8) if s >= self.min_block]
        costs = {}
        bests = {}
        arr = jnp.asarray(yp.astype(np.int32))
        for s in sizes:
            c, b = _jitted_block_costs()(arr, s, self.bd)
            costs[s] = np.asarray(jnp.min(c, axis=2)).astype(np.int64)
            bests[s] = np.asarray(b)
        # bottom-up split decision: split if children SAD + bias < parent SAD
        bias = 8 * ac_q(self.qindex, self.bd)
        split = {}
        eff = {sizes[-1]: costs[sizes[-1]]}
        for s in sizes[-2::-1]:       # from second-smallest up
            child = eff[s // 2]
            agg = (child[0::2, 0::2] + child[0::2, 1::2] +
                   child[1::2, 0::2] + child[1::2, 1::2])
            do_split = agg + bias < costs[s]
            split[s] = do_split
            eff[s] = np.where(do_split, agg + bias, costs[s])
        return bests, split

    # --- commit pass ------------------------------------------------------
    def encode_frame(self, y, u, v) -> EncodedFrame:
        bd = self.bd
        dtype = np.uint8 if bd == 8 else np.uint16
        yp = _pad_to(np.asarray(y), self.pah, self.paw)
        up = _pad_to(np.asarray(u), self.pah // 2, self.paw // 2)
        vp = _pad_to(np.asarray(v), self.pah // 2, self.paw // 2)
        self._src = (yp, up, vp)
        self.recon_y = np.zeros((self.pah, self.paw), dtype)
        self.recon_u = np.zeros((self.pah // 2, self.paw // 2), dtype)
        self.recon_v = np.zeros((self.pah // 2, self.paw // 2), dtype)
        self.max_x = self.aw - 1
        self.max_y = self.ah - 1

        if self.use_device_search:
            self.bests, self.split = self._decide(yp)
        else:
            self.bests, self.split = None, None

        fc = FrameContext(self.qindex)
        self.tw = TileWriter(fc, self.mi_rows, self.mi_cols, sb_size=SB,
                             backend=self.backend)
        for sby in range(0, self.ah, SB):
            for sbx in range(0, self.aw, SB):
                self._code_partition(sby // 4, sbx // 4, 64)

        tile = self.tw.finish()
        fr = FrameParams(base_q_idx=self.qindex,
                         order_hint=self.frame_index & 0x7F)
        payload = key_frame_temporal_unit(
            self.seq, fr, tile, with_seq_header=(self.frame_index == 0))
        self.frame_index += 1
        return EncodedFrame(
            payload=payload,
            recon_y=self.recon_y[:self.height, :self.width].copy(),
            recon_u=self.recon_u[:(self.height + 1) // 2,
                                 :(self.width + 1) // 2].copy(),
            recon_v=self.recon_v[:(self.height + 1) // 2,
                                 :(self.width + 1) // 2].copy())

    def _want_split(self, r, c, size) -> bool:
        if size <= self.min_block:
            return False
        if self.split is None:
            return False
        br, bc = (r * 4) // size, (c * 4) // size
        return bool(self.split[size][br, bc])

    def _code_partition(self, r, c, size):
        if r >= self.mi_rows or c >= self.mi_cols:
            return
        tw = self.tw
        bsize = _SQ_BSIZE[size]
        has_rows, has_cols = tw._partition_bounds(r, c, bsize)
        full = has_rows and has_cols
        # partial blocks: force SPLIT until the block fits (min size always
        # fits: MI geometry is 8px-aligned)
        if not full and size > 8:
            part = int(Partition.SPLIT)
        elif self._want_split(r, c, size):
            part = int(Partition.SPLIT)
        else:
            part = int(Partition.NONE)
        if size == 8:
            assert part == int(Partition.NONE)
        tw.write_partition(r, c, bsize, part)
        half4 = size // 8
        if part == int(Partition.SPLIT):
            self._code_partition(r, c, size // 2)
            self._code_partition(r, c + half4, size // 2)
            self._code_partition(r + half4, c, size // 2)
            self._code_partition(r + half4, c + half4, size // 2)
        else:
            self._code_block(r, c, size)
            tw.update_partition_ctx(r, c, bsize, bsize)

    # --- block coding -----------------------------------------------------
    def _best_mode(self, size, r, c):
        if self.bests is not None:
            b = self.bests[size][(r * 4) // size, (c * 4) // size]
            from svt_av1_psy_tpu.ops.jax_backend import SEARCH_MODE_ORDER
            return int(SEARCH_MODE_ORDER[int(b)])
        return int(PredMode.DC_PRED)

    def _code_plane(self, plane, src, recon, x, y, w, h, mode, ts, tt, pq):
        max_x = self.max_x if plane == 0 else (self.aw // 2) - 1
        max_y = self.max_y if plane == 0 else (self.ah // 2) - 1
        have_above = y > 0
        have_left = x > 0
        above, left, al = _clamped_edges(recon, x, y, w, h, max_x, max_y,
                                         have_above, have_left, self.bd)
        pred = intra_ops.predict(mode, above, left, al, w, h,
                                 have_above, have_left, self.bd)
        resid = src[y:y + h, x:x + w].astype(np.int32) - pred
        if self.backend == "native":
            from svt_av1_psy_tpu import native
            coeff = native.fwd_txfm2d(resid, ts, tt, self.bd)
            qcoeff, dqcoeff = native.quantize_b(coeff, ts, pq)
            rec = np.clip(pred + native.inv_txfm2d(dqcoeff, ts, tt, self.bd),
                          0, (1 << self.bd) - 1)
        else:
            coeff = forward_transform_2d(resid, ts, tt, self.bd)
            qcoeff, dqcoeff = quantize_b(coeff, ts, pq)
            rec = inverse_transform_add(dqcoeff, pred, ts, tt, self.bd)
        # clamped recon write (recon arrays are SB-padded, so plain slices)
        recon[y:y + h, x:x + w] = rec.astype(recon.dtype)
        return qcoeff

    def _code_block(self, r, c, size):
        yp, up, vp = self._src
        x, y = c * 4, r * 4
        y_mode = self._best_mode(size, r, c)
        cs = max(size // 2, 4)
        uv_mode = y_mode

        ts_y = _SQ_TX[size]
        qy = self._code_plane(0, yp, self.recon_y, x, y, size, size,
                              y_mode, ts_y, int(TxType.DCT_DCT), self.pq_y)
        ts_uv = _SQ_TX[cs]
        tt_uv = uv_tx_type(uv_mode, ts_uv, False)
        qu = self._code_plane(1, up, self.recon_u, x // 2, y // 2, cs, cs,
                              uv_mode, ts_uv, tt_uv, self.pq_uv)
        qv = self._code_plane(2, vp, self.recon_v, x // 2, y // 2, cs, cs,
                              uv_mode, ts_uv, tt_uv, self.pq_uv)

        skip = not (np.any(qy) or np.any(qu) or np.any(qv))
        rec = BlockRecord(
            mi_row=r, mi_col=c, bsize=_SQ_BSIZE[size],
            y_mode=y_mode, uv_mode=uv_mode, skip=skip,
            txbs_y=[TxbData(qy, ts_y, int(TxType.DCT_DCT))],
            txbs_u=[TxbData(qu, ts_uv, tt_uv)],
            txbs_v=[TxbData(qv, ts_uv, tt_uv)])
        self.tw.write_block(rec)
