"""Loop restoration: transcode identity of reference LR streams (syntax
mirror) on top of the decode conformance covered by
test_inter_conformance."""
import glob
import os

import pytest

from svt_av1_psy_tpu.bitstream.ivf import read_ivf
from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                   parse_sequence_header)
from svt_av1_psy_tpu.decoder.tile_parser import TileParser
from svt_av1_psy_tpu.entropy.frame_context import FrameContext
from tools.transcode_identity import replay

STREAMS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "golden", "streams_inter", "ref_lr_*.ivf")))


@pytest.mark.parametrize("path", STREAMS, ids=lambda p: os.path.basename(p))
def test_lr_transcode_identity(path):
    _, frames = read_ivf(open(path, "rb").read())
    seq = None
    for _, pl in frames:
        for t, _, _, p in parse_obus(pl):
            if t == ObuType.SEQUENCE_HEADER:
                seq = parse_sequence_header(p)
            elif t == ObuType.FRAME:
                fi = parse_frame_header(p, seq)
                mi_r = 2 * ((seq.height + 7) >> 3)
                mi_c = 2 * ((seq.width + 7) >> 3)
                kw = dict(tx_mode_select=fi.tx_mode_select,
                          reduced_tx_set=fi.reduced_tx_set,
                          enable_filter_intra=seq.enable_filter_intra,
                          cdef_bits=fi.cdef_bits if seq.enable_cdef else -1)
                tile = p[fi.header_bytes:]
                tp = TileParser(FrameContext(fi.base_q_idx), tile,
                                mi_r, mi_c,
                                delta_q_present=fi.delta_q_present,
                                lr_type=fi.lr_type,
                                lr_unit_size=fi.lr_unit_size,
                                frame_width=seq.width,
                                frame_height=seq.height, **kw)
                tp.parse_tile()
                out = replay(tp.events, FrameContext(fi.base_q_idx),
                             mi_r, mi_c, cdef_grid=tp.cdef_idx,
                             lr=(fi.lr_type, fi.lr_unit_size, tp.lr_units,
                                 seq.width, seq.height), **kw)
                assert out == tile
