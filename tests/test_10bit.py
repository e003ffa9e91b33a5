"""10-bit end-to-end: intra + IPPP with full in-loop filters, bit-exact in
dav1d and the in-repo decode driver."""
import io

import numpy as np

from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
from svt_av1_psy_tpu.decoder import dav1d
from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
from svt_av1_psy_tpu.models.intra_encoder import IntraEncoder


def _clip(W, H, N):
    rng = np.random.default_rng(3)
    base = np.clip(400 + 300 * np.sin(np.arange(W + 32) / 15)[None, :] +
                   200 * np.cos(np.arange(H + 32) / 11)[:, None] +
                   rng.integers(0, 90, (H + 32, W + 32)),
                   0, 1023).astype(np.uint16)
    ub = np.clip(512 + 150 * np.sin(np.arange((W + 32) // 2) / 8)[None, :] +
                 rng.integers(-40, 40, ((H + 32) // 2, (W + 32) // 2)),
                 0, 1023).astype(np.uint16)
    vb = np.clip(512 - 150 * np.cos(np.arange((H + 32) // 2) / 7)[:, None] +
                 rng.integers(-40, 40, ((H + 32) // 2, (W + 32) // 2)),
                 0, 1023).astype(np.uint16)
    for i in range(N):
        dx, dy = 2 * i, i
        yield (base[dy:dy + H, dx:dx + W],
               ub[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2],
               vb[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2])


def test_10bit_ippp_bit_exact():
    W, H, N = 128, 96, 3
    enc = IntraEncoder(W, H, qindex=140, bd=10, backend="native",
                       use_device_search=False)
    enc.gop_size = 0
    buf = io.BytesIO()
    ivf = IvfWriter(buf, W, H)
    recs = []
    for i, (y, u, v) in enumerate(_clip(W, H, N)):
        f = enc.encode_frame(y, u, v)
        ivf.write_frame(f.payload, i)
        recs.append(f)
    ivf.close()
    data = buf.getvalue()
    dav = dav1d.decode_ivf(data)
    own = own_decode(data)
    for i, f in enumerate(recs):
        assert dav[i].y.dtype == np.uint16
        np.testing.assert_array_equal(dav[i].y, f.recon_y)
        np.testing.assert_array_equal(dav[i].u, f.recon_u)
        np.testing.assert_array_equal(dav[i].v, f.recon_v)
        np.testing.assert_array_equal(own[i].y, f.recon_y)
