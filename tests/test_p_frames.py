"""End-to-end IPPP encoding: P frames with ME + NEWMV/NEARESTMV/GLOBALMV
must reconstruct bit-exact in dav1d and in our own decode driver."""
import io

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.decoder import dav1d
from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
from svt_av1_psy_tpu.models.intra_encoder import IntraEncoder


@pytest.mark.parametrize("qindex", [80, 160])
def test_ippp_bit_exact(qindex):
    W, H, N = 128, 96, 3
    rng = np.random.default_rng(5)
    base = np.clip(90 + 50 * np.sin(np.arange(W + 32) / 11)[None, :] +
                   40 * np.cos(np.arange(H + 32) / 9)[:, None] +
                   rng.integers(0, 20, (H + 32, W + 32)),
                   0, 255).astype(np.uint8)
    ub = np.clip(128 + 30 * np.sin(np.arange((W + 32) // 2) / 7)[None, :] +
                 rng.integers(-8, 8, ((H + 32) // 2, (W + 32) // 2)),
                 0, 255).astype(np.uint8)
    vb = np.clip(128 - 30 * np.cos(np.arange((H + 32) // 2) / 6)[:, None] +
                 rng.integers(-8, 8, ((H + 32) // 2, (W + 32) // 2)),
                 0, 255).astype(np.uint8)
    enc = IntraEncoder(W, H, qindex=qindex, backend="native",
                       use_device_search=False)
    enc.gop_size = 0
    buf = io.BytesIO()
    ivf = IvfWriter(buf, W, H)
    recons = []
    sizes = []
    for i in range(N):
        dx, dy = 2 * i, i
        f = enc.encode_frame(
            base[dy:dy + H, dx:dx + W],
            ub[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2],
            vb[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2])
        ivf.write_frame(f.payload, i)
        recons.append(f)
        sizes.append(len(f.payload))
    ivf.close()
    data = buf.getvalue()
    # P frames must be much smaller than the key frame (MC works)
    assert sizes[1] < sizes[0] and sizes[2] < sizes[0]
    dec = dav1d.decode_ivf(data)
    own = own_decode(data)
    for i, f in enumerate(recons):
        np.testing.assert_array_equal(dec[i].y, f.recon_y)
        np.testing.assert_array_equal(dec[i].u, f.recon_u)
        np.testing.assert_array_equal(dec[i].v, f.recon_v)
        np.testing.assert_array_equal(own[i].y, f.recon_y)
