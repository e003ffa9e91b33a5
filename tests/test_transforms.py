"""Transform tests vs normative golden vectors from the reference C.

Inverse: bit-exact against svt_av1_inv_txfm2d_add_*_c (decoder-normative).
Forward: round-trip sanity (fwd -> inv ~ identity at the right scale).
"""

import pathlib

import numpy as np
import pytest

from svt_av1_psy_tpu.constants import TX_SIZE_HIGH, TX_SIZE_WIDE
from svt_av1_psy_tpu.ops.transforms import (
    forward_transform_2d,
    inverse_transform_add,
)

GOLDEN = pathlib.Path(__file__).parent / "golden" / "invtx_vectors.npz"


def _golden_cases():
    z = np.load(GOLDEN)
    keys = sorted({k[2:] for k in z.files if k.startswith("c_")})
    return z, keys


_Z, _KEYS = _golden_cases()


@pytest.mark.parametrize("tag", _KEYS)
def test_inverse_bit_exact(tag):
    ts, tt, bd, mode = (int(x) for x in tag.split("_"))
    w, h = TX_SIZE_WIDE[ts], TX_SIZE_HIGH[ts]
    cw, ch = min(w, 32), min(h, 32)
    coeff = _Z["c_" + tag].reshape(ch, cw)
    pred = _Z["p_" + tag].reshape(h, w)
    want = _Z["r_" + tag].reshape(h, w)
    got = inverse_transform_add(coeff, pred, ts, tt, bd)
    np.testing.assert_array_equal(got, want, err_msg=f"ts={ts} tt={tt} bd={bd} mode={mode}")


def test_inverse_batched_matches_single():
    """The batch dimension must not change results (vectorization check)."""
    rng = np.random.default_rng(3)
    ts, tt, bd = 2, 3, 8  # 16x16 ADST_ADST
    coeffs = rng.integers(-500, 500, (7, 16, 16)).astype(np.int32)
    preds = rng.integers(0, 255, (7, 16, 16)).astype(np.uint16)
    batch = inverse_transform_add(coeffs, preds, ts, tt, bd)
    for i in range(7):
        single = inverse_transform_add(coeffs[i], preds[i], ts, tt, bd)
        np.testing.assert_array_equal(batch[i], single)


@pytest.mark.parametrize("ts", range(19))
def test_forward_inverse_roundtrip(ts):
    """fwd -> inv must reproduce the residual closely (DCT_DCT).

    The AV1 integer transforms are scaled orthonormal pairs: applying fwd then
    inv (each including their shift chains) returns the input up to rounding.
    """
    rng = np.random.default_rng(ts)
    w, h = TX_SIZE_WIDE[ts], TX_SIZE_HIGH[ts]
    resid = rng.integers(-255, 256, (2, h, w)).astype(np.int32)
    coeff = forward_transform_2d(resid, ts, 0, 8)
    if max(w, h) > 32:
        # 64-point transforms discard high-frequency content; use smooth input
        resid = np.tile(rng.integers(-64, 64, (2, 1, 1)), (1, h, w)).astype(np.int32)
        coeff = forward_transform_2d(resid, ts, 0, 8)
    pred = np.zeros((2, h, w), np.uint16) + 512
    rec = inverse_transform_add(coeff, pred, ts, 0, 10)
    got = rec.astype(np.int32) - 512
    err = np.abs(got - resid)
    assert err.max() <= 2, f"ts={ts} max err {err.max()}"


@pytest.mark.parametrize("tt", range(16))
def test_forward_inverse_roundtrip_types(tt):
    rng = np.random.default_rng(100 + tt)
    resid = rng.integers(-255, 256, (3, 16, 16)).astype(np.int32)
    coeff = forward_transform_2d(resid, 2, tt, 8)
    pred = np.zeros((3, 16, 16), np.uint16) + 512
    rec = inverse_transform_add(coeff, pred, 2, tt, 10)
    err = np.abs(rec.astype(np.int32) - 512 - resid)
    assert err.max() <= 2, f"tt={tt} max err {err.max()}"


def test_dc_gain():
    """A flat residual block must produce a single DC coefficient."""
    resid = np.full((1, 8, 8), 100, np.int32)
    coeff = forward_transform_2d(resid, 1, 0, 8)
    assert coeff[0, 0, 0] != 0
    assert np.count_nonzero(coeff[0].ravel()[1:]) == 0
