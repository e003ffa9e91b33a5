"""Per-64x64 CDEF strength search (cdef_bits > 0) in the slow path.

The encoder searches per-unit SSE over candidate (pri, sec) quadruples
(native tpue_cdef_unit_sse), greedily selects the signalled strength
lists (ref enc_cdef.c:728 search / joint_strength_search_dual), applies
per-unit CDEF (tpue_cdef_apply_idx), and rewrites the tile with per-unit
cdef_idx literals. Decode must be bit-exact in dav1d AND our own
conformance decoder (which has its own per-unit cdef_idx path).
"""
import io

import numpy as np
import pytest


def _ringing_frame(w=192, h=128, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y = np.where(((xx + yy) // 24).astype(int) % 2 == 0, 210.0, 60.0)
    y[:, :w // 2] = 128 + 90 * np.sin(xx[:, :w // 2] * 0.9) * \
        np.cos(yy[:, :w // 2] * 0.8)
    y = np.clip(y + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(120 + 10 * np.sin(xx[::2, ::2] * 0.05), 0,
                255).astype(np.uint8)
    v = np.clip(130 + 10 * np.cos(yy[::2, ::2] * 0.05), 0,
                255).astype(np.uint8)
    return y, u, v


def test_cdef_unit_search_bit_exact():
    from svt_av1_psy_tpu.bitstream.ivf import IvfWriter
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav1d_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    from svt_av1_psy_tpu.models.intra_encoder import IntraEncoder

    w, h = 192, 128
    y, u, v = _ringing_frame(w, h)
    enc = IntraEncoder(w, h, qindex=190)
    enc.cdef_unit_search = True
    bits_seen = []
    orig = IntraEncoder._cdef_stage

    def spy(self, fp, *a, **k):
        g = orig(self, fp, *a, **k)
        bits_seen.append(fp.cdef_bits)
        return g

    IntraEncoder._cdef_stage = spy
    try:
        out = enc.encode_frame(y, u, v)
    finally:
        IntraEncoder._cdef_stage = orig
    assert bits_seen and bits_seen[0] > 0, \
        f"per-unit search should pick cdef_bits > 0 here: {bits_seen}"

    buf = io.BytesIO()
    wr = IvfWriter(buf, w, h)
    wr.write_frame(out.payload, 0)
    wr.close()
    data = buf.getvalue()
    dav = dav1d_decode(data)
    own = own_decode(data)
    np.testing.assert_array_equal(np.asarray(dav[0].y), out.recon_y)
    np.testing.assert_array_equal(np.asarray(dav[0].u), out.recon_u)
    np.testing.assert_array_equal(np.asarray(dav[0].v), out.recon_v)
    np.testing.assert_array_equal(own[0].y, dav[0].y)
    np.testing.assert_array_equal(own[0].u, dav[0].u)
    np.testing.assert_array_equal(own[0].v, dav[0].v)


def test_cdef_unit_sse_matches_frame_run():
    """tpue_cdef_unit_sse summed over units == tpue_cdef frame SSE for
    the same single strength (same skip/sampling rules)."""
    from svt_av1_psy_tpu import native

    rng = np.random.default_rng(3)
    w, h = 128, 96
    mi_rows, mi_cols = h // 4, w // 4
    planes = [np.ascontiguousarray(rng.integers(0, 256, (h, w)), np.uint16),
              np.ascontiguousarray(
                  rng.integers(0, 256, (h // 2, w // 2)), np.uint16),
              np.ascontiguousarray(
                  rng.integers(0, 256, (h // 2, w // 2)), np.uint16)]
    srcs = [np.ascontiguousarray(
        np.clip(p.astype(np.int32) + rng.integers(-6, 7, p.shape), 0, 255),
        np.uint16) for p in planes]
    skip = np.zeros((mi_rows, mi_cols), np.uint8)
    skip[::3, ::2] = 1
    for st in ((2, 1, 2, 0), (4, 0, 0, 0), (0, 0, 4, 1)):
        ssey, ssec, has = native.cdef_unit_sse(
            planes, srcs, skip, w, h, 8, 5,
            [(st[0], st[1])], [(st[2], st[3])], sample=1, n_threads=1)
        fy, fc = native.cdef_run(planes, srcs, skip, w, h, 8, 5, st,
                                 apply=False, sample=1, n_threads=1)
        assert has.any()
        np.testing.assert_allclose(ssey.sum(), fy, rtol=1e-12)
        np.testing.assert_allclose(ssec.sum(), fc, rtol=1e-12)
