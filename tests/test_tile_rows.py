"""Encoder tile ROWS (spec 5.9.15 uniform tile rows; ref
Parameters.md:274 --tile-rows): the second host-parallel tile axis.
Streams must decode bit-exactly in dav1d and the own decoder, and the
threaded tile walk must be byte-identical to sequential."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
from svt_av1_psy_tpu.models.ra import RaDriver
from svt_av1_psy_tpu.decoder.dav1d import decode_obus


def _frames(n, w=256, h=192):
    from make_test_clip import make_frame
    rng = np.random.default_rng(3)
    return [make_frame(w, h, t, 8, 0.02, rng) for t in range(n)]


@pytest.mark.parametrize("tiles", [(2, 2), (1, 2), (2, 3)])
def test_tile_rows_intra_bitexact(tiles):
    tc, tr = tiles
    f = _frames(1)[0]
    enc = FastIntraEncoder(256, 192, qindex=120, n_tiles=tc,
                           n_tile_rows=tr)
    assert enc.n_tile_rows == tr
    out = enc.encode_frame(*f)
    d = decode_obus(out.payload)[0]
    assert np.array_equal(d.y, out.recon_y)
    assert np.array_equal(d.u, out.recon_u)
    assert np.array_equal(d.v, out.recon_v)


def test_tile_rows_ra_bitexact_and_thread_identity():
    frames = _frames(9)

    def run(seq):
        env = os.environ.pop("SVT_TILE_SEQ", None)
        if seq:
            os.environ["SVT_TILE_SEQ"] = "1"
        try:
            enc = FastIntraEncoder(256, 192, qindex=120, n_tiles=2,
                                   n_tile_rows=2)
            drv = RaDriver(enc, gop_levels=2, keyint=0)
            pkts = []
            for f in frames:
                pkts.extend(drv.push(*f))
            pkts.extend(drv.flush())
            return pkts
        finally:
            os.environ.pop("SVT_TILE_SEQ", None)
            if env is not None:
                os.environ["SVT_TILE_SEQ"] = env

    pkts = run(False)
    shown = {p.display_idx: p.recon for p in pkts if p.display_idx >= 0}
    stream = b"".join(p.payload for p in pkts)
    dec = decode_obus(stream)
    assert len(dec) == len(frames)
    for i, df in enumerate(dec):
        ry, ru, rv = shown[i]
        assert np.array_equal(df.y, ry), f"frame {i}"
        assert np.array_equal(df.u, ru), f"frame {i}"
        assert np.array_equal(df.v, rv), f"frame {i}"
    # threaded == sequential, byte for byte (REMOVE_LP1_LPN_DIFF analog)
    pkts_seq = run(True)
    assert [p.payload for p in pkts] == [p.payload for p in pkts_seq]
