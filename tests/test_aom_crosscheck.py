"""Cross-decoder conformance: hand-built split-txb streams vs libaom.

Regression for the txb_skip_ctx bug where `max` used `top + left` instead of
`top | left` (ref entropy_coding.c get_txb_skip_ctx): streams whose interior
txbs had neighbor cul-level pairs (2,2), (1,3) or (2,3) desynced every AV1
decoder while staying self-consistent.  libaom reports such streams as
corrupt frames (unlike dav1d, which decodes garbage silently), so it is the
sharper oracle here.
"""
import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.headers import (FrameParams, SequenceParams,
                                               key_frame_temporal_unit)
from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.entropy.frame_context import FrameContext
from svt_av1_psy_tpu.entropy.tile_writer import (BlockRecord, Partition,
                                                 TileWriter, TxbData)

try:
    from svt_av1_psy_tpu.decoder import aom
    aom._load()
    HAVE_AOM = True
except OSError:  # pragma: no cover - environment without libaom
    HAVE_AOM = False

Q = 200
BSIZE_16X16 = 6


def _build_stream(dcs, tx_type=3):
    """One 16x16 D203 block, four 8x8 txbs with the given DC levels."""
    fc = FrameContext(Q)
    tw = TileWriter(fc, 4, 4, sb_size=64, backend="python",
                    tx_mode_select=True)
    tw.write_partition(0, 0, BSIZE_16X16, int(Partition.NONE))
    txbs = []
    for v in dcs:
        qc = np.zeros((8, 8), np.int32)
        qc[0, 0] = v
        txbs.append(TxbData(qc, 1, tx_type))
    qc0 = np.zeros((8, 8), np.int32)
    rec = BlockRecord(mi_row=0, mi_col=0, bsize=BSIZE_16X16,
                      y_mode=7, uv_mode=0, skip=False, tx_size=1,
                      txbs_y=txbs,
                      txbs_u=[TxbData(qc0.copy(), 1, 0)],
                      txbs_v=[TxbData(qc0.copy(), 1, 0)])
    tw.write_block(rec)
    tile = tw.finish()
    seq = SequenceParams(width=16, height=16, bit_depth=8,
                         enable_cdef=False, enable_restoration=False)
    fp = FrameParams(base_q_idx=Q, order_hint=0, tx_mode_select=True)
    payload = key_frame_temporal_unit(seq, fp, tile, with_seq_header=True)
    buf = io.BytesIO()
    ivf = IvfWriter(buf, 16, 16)
    ivf.write_frame(payload, 0)
    ivf.close()
    return buf.getvalue()


@pytest.mark.skipif(not HAVE_AOM, reason="libaom not available")
@pytest.mark.parametrize("dcs", [
    # neighbor cul pairs hitting every skip_contexts cell the bug flipped
    [1, 3, 1, 1],   # txb4 sees (top=3, left=1)
    [1, 1, 3, 1],   # txb4 sees (top=1, left=3)
    [2, 2, 2, 2],   # txb4 sees (2, 2)
    [3, 3, 2, 1],   # txb4 sees (3, 2)
    [3, 3, 2, 2],
    # and the cells where + and | agree, as a control
    [1, 1, 1, 1],
    [2, 1, 1, 1],
    [3, 1, 1, 1],
])
def test_split_txb_skip_ctx_streams_decode(dcs):
    data = _build_stream(dcs)
    frames = aom.decode_ivf(data)  # raises RuntimeError on corrupt stream
    assert len(frames) == 1
    assert frames[0].y.shape == (16, 16)


@pytest.mark.skipif(not HAVE_AOM, reason="libaom not available")
def test_aom_agrees_with_dav1d_on_golden():
    import glob
    import os
    from svt_av1_psy_tpu.decoder import dav1d
    streams = sorted(glob.glob(os.path.join(
        os.path.dirname(__file__), "golden", "streams", "*.ivf")))
    assert streams
    data = open(streams[0], "rb").read()
    fa = aom.decode_ivf(data)
    fd = dav1d.decode_ivf(data)
    assert len(fa) == len(fd)
    for a, d in zip(fa, fd):
        assert np.array_equal(a.y, d.y)
        assert np.array_equal(a.u, d.u)
        assert np.array_equal(a.v, d.v)
