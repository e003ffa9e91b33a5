"""Compound (bidirectional) inter prediction: decode conformance.

Golden streams are reference SvtAv1EncApp RA encodes (preset 13/11,
keyint 16, mfmv off) that exercise skip_mode, compound reference
coding, compound inter modes (NEAREST_NEARESTMV / NEAR_NEARMV /
NEW_NEWMV), the compound MV stack (spec 7.10.2 compound branch incl.
the sign-flipped light rescan), and intermediate-precision dual-ref
MC with average blending (ref inter_prediction.c jnt convolve family).
dav1d is the independent oracle.
"""
import os

import numpy as np
import pytest

_DIR = os.path.join(os.path.dirname(__file__), "golden", "streams_inter")


@pytest.mark.parametrize("name", ["ref_ra_compound_p13.ivf",
                                  "ref_ra_compound_p11.ivf"])
def test_compound_ra_decode_matches_dav1d(name):
    data = open(os.path.join(_DIR, name), "rb").read()
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    own = own_decode(data)
    dav = dav1d_decode(data)
    assert len(own) == len(dav) == 16
    for i, (a, b) in enumerate(zip(own, dav)):
        assert np.array_equal(a.y, b.y), f"frame {i} luma"
        assert np.array_equal(a.u, b.u), f"frame {i} u"
        assert np.array_equal(a.v, b.v), f"frame {i} v"


def test_compound_blocks_present():
    """The golden stream must actually exercise the compound paths."""
    import svt_av1_psy_tpu.decoder.tile_parser as tpmod
    from svt_av1_psy_tpu.decoder.driver import decode_ivf
    data = open(os.path.join(_DIR, "ref_ra_compound_p13.ivf"), "rb").read()
    stats = {"comp": 0, "skipmode": 0, "modes": set()}
    orig = tpmod.TileParser._parse_inter_block

    def hook(self, r, c, bsize, skip, ha, hl, skip_mode=False):
        out = orig(self, r, c, bsize, skip, ha, hl, skip_mode=skip_mode)
        b = self.blocks[-1] if self.blocks else None
        if b is not None and b.is_inter and b.ref_frame2 > 0:
            stats["comp"] += 1
            stats["modes"].add(b.compound_mode)
            if b.skip_mode:
                stats["skipmode"] += 1
        return out

    tpmod.TileParser._parse_inter_block = hook
    try:
        decode_ivf(data)
    finally:
        tpmod.TileParser._parse_inter_block = orig
    assert stats["comp"] > 1000
    assert stats["skipmode"] > 500
    assert {0, 1, 7} <= stats["modes"]   # NEAREST_NEAREST/NEAR_NEAR/NEW_NEW


def test_dist_wtd_weights():
    """spec 7.11.3.15 quant-dist lookup (ref inter_prediction.c:268)."""
    from svt_av1_psy_tpu.ops.mc import dist_wtd_weights
    assert dist_wtd_weights(2, 2) == (7, 9)     # symmetric dists
    assert dist_wtd_weights(0, 3) == (3, 13)    # zero fwd distance
    assert dist_wtd_weights(3, 0) == (13, 3)
    assert dist_wtd_weights(1, 2) == (5, 11)    # 1:2 ratio
    assert dist_wtd_weights(2, 1) == (11, 5)
    assert dist_wtd_weights(1, 31) == (3, 13)   # extreme ratio


def test_compound_average_copy_identity():
    """Average blend of two identical full-pel components reproduces
    the source pixels exactly (offset/rounding cancels)."""
    from svt_av1_psy_tpu.ops.mc import blend_compound, mc_block_compound_part
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (32, 32)).astype(np.uint16)
    p = mc_block_compound_part(ref, 8, 8, 16, 16, 0, 0, 0, 0, bd=8)
    out = blend_compound(p, p, bd=8)
    assert np.array_equal(out, ref[8:24, 8:24].astype(np.int64))


def test_compound_subpel_vs_dist_wtd():
    """Dist-wtd blend with equal weights approximates the average and
    stays in range at subpel positions."""
    from svt_av1_psy_tpu.ops.mc import blend_compound, mc_block_compound_part
    rng = np.random.default_rng(1)
    ref0 = rng.integers(0, 256, (48, 48)).astype(np.uint16)
    ref1 = rng.integers(0, 256, (48, 48)).astype(np.uint16)
    p0 = mc_block_compound_part(ref0, 8, 8, 16, 16, 5, 9, 0, 0, bd=8)
    p1 = mc_block_compound_part(ref1, 8, 8, 16, 16, 11, 3, 0, 0, bd=8)
    avg = blend_compound(p0, p1, bd=8)
    dw = blend_compound(p0, p1, bd=8, fwd_offset=8, bck_offset=8)
    assert avg.min() >= 0 and avg.max() <= 255
    assert np.abs(avg.astype(int) - dw.astype(int)).max() <= 1
