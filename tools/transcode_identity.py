#!/usr/bin/env python
"""Transcode-identity harness: parse a tile with the conformance parser,
replay every symbol through the TileWriter, and byte-compare.

Proves writer/parser symbol-level fidelity against ANY conforming encoder's
output (we use the reference SvtAv1EncApp). A byte divergence pinpoints the
first writer bug; identity proves the writer produces decodable streams for
that feature set.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from svt_av1_psy_tpu.bitstream.ivf import read_ivf
from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
from svt_av1_psy_tpu.constants import TX_SIZE_HIGH, TX_SIZE_WIDE
from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                   parse_sequence_header)
from svt_av1_psy_tpu.decoder.tile_parser import TileParser
from svt_av1_psy_tpu.entropy.frame_context import FrameContext
from svt_av1_psy_tpu.entropy.tile_writer import (BlockRecord, TileWriter,
                                                 TxbData)
from svt_av1_psy_tpu.ops.quant import adjusted_tx_size


def replay(events, fc, mi_rows, mi_cols, *, tx_mode_select, reduced_tx_set,
           enable_filter_intra, cdef_bits=-1, cdef_grid=None,
           lr=None, **inter_kw) -> bytes:
    tw = TileWriter(fc, mi_rows, mi_cols, tx_mode_select=tx_mode_select,
                    reduced_tx_set=reduced_tx_set,
                    enable_filter_intra=enable_filter_intra,
                    cdef_bits=cdef_bits, **inter_kw)
    tw.cdef_grid = cdef_grid
    if lr is not None:
        tw.init_lr(*lr)
    pending_dq = None
    for ev in events:
        kind = ev[0]
        if kind == 'part':
            _, r, c, bsize, part = ev
            if lr is not None and bsize == 12 and (r % 16) == 0 and \
                    (c % 16) == 0:
                tw.write_lr(r, c)
            tw.write_partition(r, c, bsize, part)
        elif kind == 'pctx':
            _, r, c, bsize, sub = ev
            tw.update_partition_ctx(r, c, bsize, sub)
        elif kind == 'dq':
            pending_dq = (ev[1], ev[2])
        elif kind == 'block':
            b = ev[1]
            txbs = {0: [], 1: [], 2: []}
            for (plane, ur, uc, ts, tt, q) in b.txbs:
                if q is None:
                    adj = adjusted_tx_size(ts)
                    q = np.zeros((TX_SIZE_HIGH[adj], TX_SIZE_WIDE[adj]),
                                 np.int32)
                txbs[plane].append(TxbData(q, ts, tt))
            rec = BlockRecord(
                mi_row=b.mi_row, mi_col=b.mi_col, bsize=b.bsize,
                y_mode=b.y_mode, uv_mode=b.uv_mode,
                angle_delta_y=b.angle_delta_y, angle_delta_uv=b.angle_delta_uv,
                skip=b.skip, tx_size=b.tx_size,
                is_inter=b.is_inter, ref_frame=b.ref_frame, mv=b.mv,
                inter_mode=b.inter_mode, ref_mv_idx=b.ref_mv_idx,
                interp_filters=b.interp_filters,
                cfl_joint_sign=b.cfl_joint_sign, cfl_idx_u=b.cfl_idx_u,
                cfl_idx_v=b.cfl_idx_v, use_filter_intra=b.use_filter_intra,
                filter_intra_mode=b.filter_intra_mode,
                tx_leaves=b.tx_leaves, txfm_splits=b.txfm_splits,
                txbs_y=txbs[0], txbs_u=txbs[1], txbs_v=txbs[2])
            tw.write_block(rec, delta_q=pending_dq)
            pending_dq = None
    return tw.finish()


def run_identity(ivf_path: str, max_frames: int = 99) -> bool:
    hdr, pkts = read_ivf(ivf_path)
    seq = None
    all_ok = True
    for i, (_, data) in enumerate(pkts[:max_frames]):
        for t, _, _, payload in parse_obus(data):
            if t == ObuType.SEQUENCE_HEADER:
                seq = parse_sequence_header(payload)
            elif t == ObuType.FRAME:
                fi = parse_frame_header(payload, seq)
                tile = payload[fi.header_bytes:]
                mi_cols = 2 * ((seq.width + 7) >> 3)
                mi_rows = 2 * ((seq.height + 7) >> 3)
                kw = dict(tx_mode_select=fi.tx_mode_select,
                          reduced_tx_set=fi.reduced_tx_set,
                          enable_filter_intra=seq.enable_filter_intra)
                tp = TileParser(FrameContext(fi.base_q_idx), tile,
                                mi_rows, mi_cols,
                                delta_q_present=fi.delta_q_present, **kw)
                tp.parse_tile()
                out = replay(tp.events, FrameContext(fi.base_q_idx),
                             mi_rows, mi_cols, **kw)
                ok = out == tile
                if not ok:
                    n = min(len(out), len(tile))
                    div = next((j for j in range(n) if out[j] != tile[j]), n)
                    print(f"frame {i}: DIVERGE at byte {div}/{len(tile)} "
                          f"(ref {tile[max(0,div-2):div+3].hex()} vs "
                          f"mine {out[max(0,div-2):div+3].hex()})")
                    all_ok = False
                else:
                    print(f"frame {i}: IDENTICAL ({len(tile)} bytes)")
    return all_ok


if __name__ == "__main__":
    ok = run_identity(sys.argv[1])
    sys.exit(0 if ok else 1)
