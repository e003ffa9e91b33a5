"""Library API surface (api.py — the EbSvtAv1Enc.h analog)."""

import numpy as np

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import (EncoderConfig, parse_parameter_string,
                                    ConfigError, validate_config)
from svt_av1_psy_tpu.decoder.dav1d import decode_obus


def test_api_lifecycle_and_param_string():
    cfg = EncoderConfig(enc_mode=12, qp=30, intra_period_length=0)
    cfg = parse_parameter_string(cfg, "sharpness=2:variance-boost-strength=3")
    assert cfg.sharpness == 2 and cfg.variance_boost_strength == 3
    rng = np.random.default_rng(0)
    y = rng.integers(0, 255, (144, 176), np.uint8)
    u = rng.integers(0, 255, (72, 88), np.uint8)
    enc = Encoder(cfg, 176, 144, bit_depth=8)
    out = enc.encode(y, u, u.copy())
    assert enc.frames_encoded == 1
    d = decode_obus(out.payload)[0]
    assert np.array_equal(d.y, out.recon_y)
    hdr = enc.stream_header()
    assert hdr[:1] != b"" and len(hdr) > 4


def test_api_validation_rejects_bad_config():
    import pytest
    with pytest.raises(ConfigError):
        validate_config(EncoderConfig(enc_mode=99))


def test_api_gop_routing():
    cfg = EncoderConfig(enc_mode=12, qp=35, intra_period_length=-1)
    rng = np.random.default_rng(1)
    y = rng.integers(0, 255, (144, 176), np.uint8)
    u = np.full((72, 88), 128, np.uint8)
    enc = Encoder(cfg, 176, 144)
    k = enc.encode(y, u, u.copy())
    p = enc.encode(y, u, u.copy())
    assert len(p.payload) < len(k.payload)   # P frame followed the key


def test_ssim_metric():
    """aom_ssim2-analog windowed SSIM (ref svt_psnr.c stat report)."""
    import numpy as np
    from svt_av1_psy_tpu.ops.metrics import psnr, ssim_plane
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (72, 96)).astype(np.int64)
    assert abs(ssim_plane(a, a) - 1.0) < 1e-12
    b = np.clip(a + rng.normal(0, 8, a.shape), 0, 255).astype(np.int64)
    s = ssim_plane(a, b)
    assert 0.5 < s < 1.0
    # more distortion -> lower ssim, lower psnr
    c = np.clip(a + rng.normal(0, 25, a.shape), 0, 255).astype(np.int64)
    assert ssim_plane(a, c) < s
    assert psnr(a, c) < psnr(a, b)
    # 10-bit scale invariance (same content scaled by 4)
    s10 = ssim_plane(a * 4, b * 4, bd=10)
    assert abs(s10 - s) < 0.02
