"""Screen-content tools decode: palette + intra block copy (IBC).

ref_scc_palette_ibc_p4.ivf: reference --scm 1 encode of synthetic
screen content (flat color blocks + scrolling text band) — exercises
luma palettes (spec 5.11.42 color coding with the neighbor cache,
5.11.49 wavefront color-index maps), intrabc (spec 5.11.31: DV stack
with the default-DV rule, the separate DV NMV context, current-frame MC
with BILINEAR chroma taps), and the allow_intrabc header gates.
ref_scm_natural_p6.ivf: natural content with scm forced on — palette
syntax on AB-shaped blocks (allow_palette is an enum-range rule) and
sub-8x8 intrabc chroma.
"""
import os

import numpy as np
import pytest

_DIR = os.path.join(os.path.dirname(__file__), "golden", "streams_inter")


@pytest.mark.parametrize("name", ["ref_scc_palette_ibc_p4.ivf",
                                  "ref_scm_natural_p6.ivf"])
def test_screen_content_decode_matches_dav1d(name):
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


def test_streams_exercise_palette_and_ibc():
    import svt_av1_psy_tpu.decoder.reconstruct as R
    from svt_av1_psy_tpu.decoder.driver import decode_ivf

    stats = {"palette": 0, "ibc": 0}
    orig = R.FrameReconstructor._decode_block

    def patched(self, b):
        if getattr(b, "palette", None) is not None:
            stats["palette"] += 1
        if getattr(b, "use_intrabc", False):
            stats["ibc"] += 1
        return orig(self, b)

    R.FrameReconstructor._decode_block = patched
    try:
        for name in ("ref_scc_palette_ibc_p4.ivf",
                     "ref_scm_natural_p6.ivf"):
            decode_ivf(open(os.path.join(_DIR, name), "rb").read())
    finally:
        R.FrameReconstructor._decode_block = orig
    assert stats["palette"] >= 20, stats
    assert stats["ibc"] >= 20, stats
