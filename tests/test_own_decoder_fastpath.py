"""Own conformance decoder vs fast-path streams.

The fast path emits multi-tile frames (tile_cols_log2 > 0), hidden
frames, and show_existing_frame headers; the in-repo conformance
decoder (decoder/driver.py) must decode all of them bit-exactly — the
same role the reference's RefDecoder plays for SvtAv1EncApp output
(ref test/e2e_test/RefDecoder.h). dav1d is the independent oracle:
own == dav1d on every shown frame.
"""
import numpy as np
import pytest

import io

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder


def _clip(w, h, n=3, seed=7):
    rng = np.random.default_rng(seed)
    frames = []
    for t in range(n):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        y = ((xx * 2 + yy + 6 * t) % 256) + rng.normal(0, 3.0, (h, w))
        u = np.full((h // 2, w // 2), 118.0) + rng.normal(
            0, 2, (h // 2, w // 2))
        v = np.full((h // 2, w // 2), 133.0) + rng.normal(
            0, 2, (h // 2, w // 2))
        frames.append(tuple(np.clip(p, 0, 255).astype(np.uint8)
                            for p in (y, u, v)))
    return frames


def _ivf(payloads, w, h):
    buf = io.BytesIO()
    with IvfWriter(buf, w, h) as wr:
        for i, p in enumerate(payloads):
            wr.write_frame(p, i)
    return buf.getvalue()


def _assert_triple(payloads, w, h, n_shown):
    data = _ivf(payloads, w, h)
    own = own_decode(data)
    dav = dav1d_decode(data)
    assert len(own) == len(dav) == n_shown
    for i, (a, b) in enumerate(zip(own, dav)):
        assert np.array_equal(a.y, b.y), f"frame {i} luma"
        assert np.array_equal(a.u, b.u), f"frame {i} u"
        assert np.array_equal(a.v, b.v), f"frame {i} v"


@pytest.mark.parametrize("n_tiles", [2, 4])
def test_own_decode_multitile_intra(n_tiles):
    """Column tiles: tile-group size fields, per-tile CDF contexts, and
    tile-boundary availability in parse + reconstruction."""
    w, h = 352, 288
    frames = _clip(w, h, n=2)
    enc = FastIntraEncoder(w, h, qindex=110, n_tiles=n_tiles)
    # uniform spacing may coalesce (6 SB cols / 4 -> 3 tiles of 2 SBs)
    assert enc.n_tiles >= 2
    payloads = [enc.encode_frame(*f).payload for f in frames]
    _assert_triple(payloads, w, h, len(frames))


def test_own_decode_multitile_ippp():
    """Inter multi-tile: MV-ref scans and neighbor contexts must not
    cross tile boundaries (spec is_inside; ref ec_process.c:208)."""
    w, h = 352, 288
    frames = _clip(w, h, n=4)
    enc = FastIntraEncoder(w, h, qindex=110, n_tiles=2)
    enc.gop_size = 4
    payloads = [enc.encode_frame(*f).payload for f in frames]
    _assert_triple(payloads, w, h, len(frames))


def test_own_decode_hierarchical_show_existing():
    """Hidden ARF frames + show_existing_frame FRAME_HEADER OBUs."""
    w, h = 176, 144
    frames = _clip(w, h, n=6)
    enc = FastIntraEncoder(w, h, qindex=120, n_tiles=1)
    enc.gop_size = 0
    enc.hierarchical_levels = 2
    payloads = [enc.encode_frame(*f).payload for f in frames]
    _assert_triple(payloads, w, h, len(frames))
