"""Quantizer-matrix (QM) coverage for the fast path.

The PSY fork enables QM by default with a decoupled chroma level range
(ref Source/Lib/Globals/enc_settings.c:1084-1088); per-frame levels
follow the tune's curve (ref Source/Lib/Codec/md_config_process.c:175-215
aom_get_qmlevel / psy_get_qmlevel / psy_still_get_qmlevel) and the
quantizer applies the Q5 weight matrices (ref full_loop.c
svt_aom_quantize_b_c QM path).
"""

import numpy as np
import pytest

from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder


def _clip(w, h, n, seed=0, grad=True):
    rng = np.random.default_rng(seed)
    ys, us, vs = [], [], []
    base = np.add.outer(np.linspace(40, 200, h), np.linspace(0, 50, w))
    for t in range(n):
        y = base + 20 * np.sin(np.arange(w) / 17 + t) \
            + rng.normal(0, 6, (h, w))
        ys.append(np.clip(y, 0, 255).astype(np.uint8))
        us.append(np.full((h // 2, w // 2), 110 + 5 * t, np.uint8))
        vs.append(np.clip(rng.normal(128, 8, (h // 2, w // 2)), 0,
                          255).astype(np.uint8))
    return list(zip(ys, us, vs))


def test_native_quantize_qm_matches_python():
    """tputx_quantize_b_qm == ops/quant.quantize_b with qm/iqm, bit for
    bit, over random coefficients at several tx sizes and levels."""
    import ctypes

    from svt_av1_psy_tpu import native
    from svt_av1_psy_tpu.ops.quant import (build_plane_quant, iqm_matrix,
                                           qm_matrix, quantize_b, tx_scale)

    lib = native.ensure_txfms()
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.tputx_quantize_b_qm.argtypes = [i32p, i32p, i32p] + \
        [ctypes.c_int] * 12 + [i32p, i32p]
    from svt_av1_psy_tpu.constants import TX_SIZE_HIGH, TX_SIZE_WIDE
    from svt_av1_psy_tpu.ops.quant import adjusted_tx_size

    rng = np.random.default_rng(11)
    for ts in (0, 2, 3, 8, 14):
        adj = adjusted_tx_size(ts)
        ch, cw = TX_SIZE_HIGH[adj], TX_SIZE_WIDE[adj]
        for lvl in (0, 5, 8, 14):
            for plane in (0, 1):
                qm = qm_matrix(lvl, plane, ts)
                iqm = iqm_matrix(lvl, plane, ts)
                pq = build_plane_quant(120, bd=8)
                coeff = rng.integers(-(1 << 14), 1 << 14,
                                     (ch, cw)).astype(np.int32)
                ref_qc, ref_dqc = quantize_b(coeff, ts, pq, qm=qm, iqm=iqm)
                qc = np.zeros(ch * cw, np.int32)
                dqc = np.zeros(ch * cw, np.int32)
                cc = np.ascontiguousarray(coeff.reshape(-1))
                wt = np.ascontiguousarray(qm.reshape(-1).astype(np.int32))
                iwt = np.ascontiguousarray(iqm.reshape(-1).astype(np.int32))
                lib.tputx_quantize_b_qm(
                    cc.ctypes.data_as(i32p), qc.ctypes.data_as(i32p),
                    dqc.ctypes.data_as(i32p), ch * cw, tx_scale(ts),
                    int(pq.zbin[0]), int(pq.zbin[1]), int(pq.round[0]),
                    int(pq.round[1]), int(pq.quant[0]), int(pq.quant[1]),
                    int(pq.quant_shift[0]), int(pq.quant_shift[1]),
                    int(pq.dequant[0]), int(pq.dequant[1]),
                    wt.ctypes.data_as(i32p), iwt.ctypes.data_as(i32p))
                assert np.array_equal(qc.reshape(ch, cw), ref_qc), \
                    (ts, lvl, plane)
                assert np.array_equal(dqc.reshape(ch, cw), ref_dqc), \
                    (ts, lvl, plane)


def test_qmlevel_curves():
    """Level curves match the reference formulas (md_config_process.c:
    aom_get_qmlevel linear, psy sigmoid, psy_still polynomial)."""
    from svt_av1_psy_tpu.ops.quant import get_qmlevel

    # linear: qindex 0 -> first, 255 -> last
    assert get_qmlevel(0, 0, 15, tune=1) == 0
    assert get_qmlevel(255, 0, 15, tune=1) == 15
    assert get_qmlevel(128, 0, 15, tune=1) == 8
    # sigmoid stays in range and is monotone
    prev = -1
    for q in range(0, 256, 15):
        v = get_qmlevel(q, 0, 15, tune=3)
        assert 0 <= v <= 15
        assert v >= prev
        prev = v
    # still-picture polynomial: clamped to range
    for q in (0, 60, 128, 255):
        assert 8 <= get_qmlevel(q, 8, 15, tune=4) <= 15


@pytest.mark.parametrize("gop", [1, 4])
def test_qm_stream_decodes_bit_exact(gop):
    """QM streams (key + inter) decode bit-exact in dav1d AND the own
    conformance decoder, and QM genuinely changes the coded stream."""
    from svt_av1_psy_tpu.decoder.dav1d import decode_ivf as dav_decode
    from svt_av1_psy_tpu.decoder.driver import decode_ivf as own_decode
    import io

    from svt_av1_psy_tpu.bitstream.ivf import IvfWriter

    def write_ivf(w, h, pkts):
        buf = io.BytesIO()
        with IvfWriter(buf, w, h) as wr:
            for i, p in enumerate(pkts):
                wr.write_frame(p, i)
        return buf.getvalue()

    frames = _clip(176, 144, 4, seed=3)
    outs = {}
    recs = {}
    for use_qm in (False, True):
        enc = FastIntraEncoder(176, 144, qindex=110)
        enc.gop_size = gop
        if use_qm:
            enc.qm_cfg = (0, 15, 8, 15, 2)
        pkts, rec = [], []
        for f in frames:
            out = enc.encode_frame(*f)
            pkts.append(out.payload)
            rec.append((out.recon_y, out.recon_u, out.recon_v))
        outs[use_qm] = write_ivf(176, 144, pkts)
        recs[use_qm] = rec
    assert outs[True] != outs[False]
    dec_own = own_decode(outs[True])
    dec_dav = dav_decode(outs[True])
    assert len(dec_own) == len(dec_dav) == len(frames)
    for (ry, ru, rv), o, d in zip(recs[True], dec_own, dec_dav):
        assert np.array_equal(d.y, ry) and np.array_equal(o.y, ry)
        assert np.array_equal(d.u, ru) and np.array_equal(o.u, ru)
        assert np.array_equal(d.v, rv) and np.array_equal(o.v, rv)
