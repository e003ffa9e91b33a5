"""End-to-end conformance: encode → IVF → dav1d decode → bit-exact recon.

The decisive oracle from the reference's test strategy (SURVEY.md §4.3 /
test/e2e_test/SvtAv1E2EFramework.h): the bitstream must decode, and decode to
exactly what the encoder reconstructed.
"""

import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter, read_ivf
from svt_av1_psy_tpu.decoder.dav1d import decode_ivf, decode_obus
from svt_av1_psy_tpu.models.intra_encoder import IntraEncoder


def _make_planes(w, h, seed=0, flat=False):
    rng = np.random.default_rng(seed)
    if flat:
        return (np.full((h, w), 128, np.uint8),
                np.full((h // 2, w // 2), 120, np.uint8),
                np.full((h // 2, w // 2), 136, np.uint8))
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2) // 2 % 220 + rng.integers(0, 20, (h, w))
         ).astype(np.uint8)
    u = ((xx[:h // 2, :w // 2] * 2) % 200 + 20).astype(np.uint8)
    v = ((yy[:h // 2, :w // 2] * 2) % 200 + 30).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("w,h,q", [(64, 64, 100), (128, 64, 60),
                                   (128, 128, 200), (192, 128, 30),
                                   (64, 128, 250), (64, 64, 1)])
def test_intra_frame_bit_exact(w, h, q):
    y, u, v = _make_planes(w, h, seed=q)
    enc = IntraEncoder(w, h, qindex=q)
    f = enc.encode_frame(y, u, v)
    frames = decode_obus(f.payload)
    assert len(frames) == 1
    d = frames[0]
    np.testing.assert_array_equal(d.y, f.recon_y)
    np.testing.assert_array_equal(d.u, f.recon_u)
    np.testing.assert_array_equal(d.v, f.recon_v)


def test_flat_frame_tiny_stream():
    y, u, v = _make_planes(64, 64, flat=True)
    enc = IntraEncoder(64, 64, qindex=128)
    f = enc.encode_frame(y, u, v)
    assert len(f.payload) < 60                     # skip-coded flat frame
    d = decode_obus(f.payload)[0]
    np.testing.assert_array_equal(d.y, f.recon_y)


def test_multi_frame_ivf_roundtrip(tmp_path):
    w, h, n = 128, 64, 4
    enc = IntraEncoder(w, h, qindex=120)
    path = tmp_path / "out.ivf"
    recons = []
    with open(path, "wb") as fh:
        ivf = IvfWriter(fh, w, h)
        for i in range(n):
            y, u, v = _make_planes(w, h, seed=i)
            f = enc.encode_frame(y, u, v)
            ivf.write_frame(f.payload, i)
            recons.append(f)
        ivf.close()
    frames = decode_ivf(str(path))
    assert len(frames) == n
    for d, f in zip(frames, recons):
        np.testing.assert_array_equal(d.y, f.recon_y)
        np.testing.assert_array_equal(d.u, f.recon_u)
        np.testing.assert_array_equal(d.v, f.recon_v)


def test_psnr_improves_with_lower_q():
    w, h = 128, 128
    y, u, v = _make_planes(w, h, seed=7)
    psnrs = []
    for q in (220, 120, 40):
        enc = IntraEncoder(w, h, qindex=q)
        f = enc.encode_frame(y, u, v)
        d = decode_obus(f.payload)[0]
        mse = np.mean((d.y.astype(np.float64) - y) ** 2)
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    assert psnrs[0] < psnrs[1] < psnrs[2]


def test_cross_parse_own_stream():
    """Symbol parser must reproduce the writer's block decisions exactly."""
    from svt_av1_psy_tpu.bitstream.obu import ObuType, parse_obus
    from svt_av1_psy_tpu.decoder.header_parser import (parse_frame_header,
                                                       parse_sequence_header)
    from svt_av1_psy_tpu.decoder.tile_parser import TileParser
    from svt_av1_psy_tpu import constants as tp_mod
    from svt_av1_psy_tpu.entropy.frame_context import FrameContext

    w, h, q = 128, 64, 80
    y, u, v = _make_planes(w, h, seed=3)
    enc = IntraEncoder(w, h, qindex=q)
    f = enc.encode_frame(y, u, v)
    seq = None
    for t, _, _, payload in parse_obus(f.payload):
        if t == ObuType.SEQUENCE_HEADER:
            seq = parse_sequence_header(payload)
        elif t == ObuType.FRAME:
            fi = parse_frame_header(payload, seq)
            assert fi.base_q_idx == q
            tp = TileParser(FrameContext(q), payload[fi.header_bytes:],
                            h // 4, w // 4,
                            tx_mode_select=fi.tx_mode_select,
                            delta_q_present=fi.delta_q_present)
            blocks = tp.parse_tile()
            # partition tree: at least one block per SB, full MI coverage
            assert len(blocks) >= (w // 64) * (h // 64)
            area = sum((tp_mod.BLOCK_SIZE_WIDE[b.bsize] // 4) *
                       (tp_mod.BLOCK_SIZE_HIGH[b.bsize] // 4)
                       for b in blocks)
            assert area == (w // 4) * (h // 4)
