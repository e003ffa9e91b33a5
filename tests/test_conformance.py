"""Conformance suite over golden AV1 streams produced by a third-party
encoder (SVT-AV1), covering the full intra toolset: partition trees incl.
extended partitions, directional prediction with edge filter/upsample, CfL,
filter-intra, TX_MODE_SELECT depth trees, ADST/identity transform types,
quantizer matrices and delta-q.

Two properties per stream (the reference's e2e strategy, SURVEY.md §4.3):
  1. transcode identity: parse -> re-encode with the TileWriter is
     byte-identical (proves writer symbol/context fidelity);
  2. recon exactness: parse -> reconstruct equals dav1d's decode bit-exactly
     (proves the normative prediction/dequant/inverse pipeline).
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from svt_av1_psy_tpu.bitstream.ivf import read_ivf
from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
from svt_av1_psy_tpu.decoder import dav1d
from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                   parse_sequence_header)
from svt_av1_psy_tpu.decoder.reconstruct import FrameReconstructor
from svt_av1_psy_tpu.decoder.tile_parser import TileParser
from svt_av1_psy_tpu.entropy.frame_context import FrameContext
from tools.transcode_identity import replay

STREAMS = sorted(
    (pathlib.Path(__file__).parent / "golden" / "streams").glob("*.ivf"))


def _frames(path):
    hdr, pkts = read_ivf(path)
    seq = None
    for _, data in pkts:
        for t, _, _, payload in parse_obus(data):
            if t == ObuType.SEQUENCE_HEADER:
                seq = parse_sequence_header(payload)
            elif t == ObuType.FRAME:
                yield seq, parse_frame_header(payload, seq), payload


@pytest.mark.parametrize("path", STREAMS, ids=lambda p: p.stem)
def test_transcode_identity(path):
    for seq, fi, payload in _frames(path):
        tile = payload[fi.header_bytes:]
        mi_cols = 2 * ((seq.width + 7) >> 3)
        mi_rows = 2 * ((seq.height + 7) >> 3)
        cbits = fi.cdef_bits if seq.enable_cdef else -1
        kw = dict(tx_mode_select=fi.tx_mode_select,
                  reduced_tx_set=fi.reduced_tx_set,
                  enable_filter_intra=seq.enable_filter_intra)
        tp = TileParser(FrameContext(fi.base_q_idx), tile, mi_rows, mi_cols,
                        delta_q_present=fi.delta_q_present, cdef_bits=cbits,
                        **kw)
        tp.parse_tile()
        out = replay(tp.events, FrameContext(fi.base_q_idx), mi_rows,
                     mi_cols, cdef_bits=cbits, cdef_grid=tp.cdef_idx, **kw)
        assert out == tile


@pytest.mark.parametrize("path", STREAMS, ids=lambda p: p.stem)
def test_recon_matches_dav1d(path):
    decoded = dav1d.decode_ivf(str(path))
    i = 0
    for seq, fi, payload in _frames(path):
        tp = TileParser(FrameContext(fi.base_q_idx),
                        payload[fi.header_bytes:],
                        2 * ((seq.height + 7) >> 3),
                        2 * ((seq.width + 7) >> 3),
                        delta_q_present=fi.delta_q_present,
                        tx_mode_select=fi.tx_mode_select,
                        reduced_tx_set=fi.reduced_tx_set,
                        enable_filter_intra=seq.enable_filter_intra,
                        cdef_bits=fi.cdef_bits if seq.enable_cdef else -1)
        blocks = tp.parse_tile()
        fr = FrameReconstructor(
            seq.width, seq.height, fi,
            enable_intra_edge_filter=seq.enable_intra_edge_filter)
        y, u, v = fr.decode_blocks(blocks)
        lf = (fi.filter_level[0], fi.filter_level[1],
              fi.filter_level_uv[0], fi.filter_level_uv[1])
        if any(lf):
            fr.apply_dlf(lf, fi.sharpness)
        if seq.enable_cdef and fi.cdef_y_pri is not None:
            sets = [(yp, ys + (ys == 3), up, us + (us == 3))
                    for yp, ys, up, us in zip(fi.cdef_y_pri, fi.cdef_y_sec,
                                              fi.cdef_uv_pri,
                                              fi.cdef_uv_sec)]
            fr.apply_cdef(sets, fi.cdef_damping, cdef_idx=tp.cdef_idx)
        d = decoded[i]
        H, W = seq.height, seq.width
        np.testing.assert_array_equal(y[:H, :W], d.y)
        np.testing.assert_array_equal(u[:(H + 1) // 2, :(W + 1) // 2], d.u)
        np.testing.assert_array_equal(v[:(H + 1) // 2, :(W + 1) // 2], d.v)
        i += 1
