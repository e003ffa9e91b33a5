"""Config system tests — the analog of SvtAv1EncParamsTest.cc / SvtAv1EncApiTest.cc:

set each field to valid/invalid values and assert validate_config verdicts
(ref: test/api_test/SvtAv1EncParamsTest.cc, params.h).
"""

import pytest

from svt_av1_psy_tpu.config import (
    DEFAULT,
    ConfigError,
    EncoderConfig,
    RateControlMode,
    Tune,
    derive_settings,
    parse_parameter,
    parse_parameter_string,
    qp_to_qindex,
    validate_config,
)


def test_defaults_valid():
    cfg = EncoderConfig(source_width=1920, source_height=1080)
    validate_config(cfg)
    assert cfg.enc_mode == 10
    assert cfg.qp == 35
    assert cfg.tune == Tune.SSIM
    assert cfg.sharpness == 1  # PSY default
    assert cfg.enable_variance_boost
    assert cfg.variance_boost_strength == 2
    assert cfg.variance_octile == 6
    assert cfg.qp_scale_compress_strength == 1  # PSY default
    assert cfg.adaptive_film_grain
    assert cfg.min_chroma_qm_level == 8  # PSY chroma QM decoupling


@pytest.mark.parametrize(
    "field,value",
    [
        ("enc_mode", 14),
        ("enc_mode", -3),
        ("qp", 64),
        ("tune", 5),
        ("psy_rd", 6.5),
        ("psy_rd", -0.1),
        ("sharpness", 8),
        ("sharpness", -8),
        ("variance_boost_strength", 0),
        ("variance_boost_strength", 5),
        ("variance_octile", 9),
        ("qp_scale_compress_strength", 4),
        ("frame_luma_bias", 101),
        ("noise_norm_strength", 5),
        ("tf_strength", 5),
        ("encoder_bit_depth", 12),
        ("source_width", 63),
        ("source_height", 9000),
        ("hierarchical_levels", 1),
        ("fast_decode", 3),
        ("pass_num", 3),
    ],
)
def test_invalid_rejected(field, value):
    cfg = EncoderConfig(source_width=640, source_height=480).replace(**{field: value})
    with pytest.raises(ConfigError):
        validate_config(cfg)


def test_psy_rd_requires_tune2_plus():
    cfg = EncoderConfig(source_width=640, source_height=480, psy_rd=1.0, tune=Tune.PSNR)
    with pytest.raises(ConfigError):
        validate_config(cfg)
    validate_config(cfg.replace(tune=Tune.SSIM_SUBJECTIVE))


def test_extended_crf():
    cfg = EncoderConfig(source_width=640, source_height=480).with_crf(68.25)
    assert cfg.qp == 63
    assert cfg.extended_crf_qindex_offset == 21  # 5*4 + 1 quarter steps
    assert cfg.crf == pytest.approx(68.25)
    validate_config(cfg)
    with pytest.raises(ConfigError):
        validate_config(EncoderConfig(source_width=640, source_height=480).with_crf(71))


def test_parse_parameter_roundtrip():
    cfg = EncoderConfig(source_width=640, source_height=480)
    cfg = parse_parameter_string(
        cfg,
        "preset=6:crf=30:tune=3:sharpness=2:psy-rd=1.5:"
        "enable-variance-boost=1:variance-octile=4:film-grain=8:"
        "tile-columns=2:keyint=240:qm-min=2:chroma-qm-min=10",
    )
    assert cfg.enc_mode == 6
    assert cfg.qp == 30
    assert cfg.tune == Tune.SSIM_SUBJECTIVE
    assert cfg.sharpness == 2
    assert cfg.psy_rd == 1.5
    assert cfg.variance_octile == 4
    assert cfg.film_grain_denoise_strength == 8
    assert cfg.tile_columns == 2
    assert cfg.intra_period_length == 239
    assert cfg.min_qm_level == 2
    assert cfg.min_chroma_qm_level == 10
    validate_config(cfg)


def test_parse_rc_modes():
    cfg = EncoderConfig()
    assert parse_parameter(cfg, "rc", "vbr").rate_control_mode == RateControlMode.VBR
    assert parse_parameter(cfg, "rc", "2").rate_control_mode == RateControlMode.CBR
    assert parse_parameter(cfg, "tbr", "2m").target_bit_rate == 2_000_000
    assert parse_parameter(cfg, "tbr", "2000").target_bit_rate == 2_000_000
    assert parse_parameter(cfg, "tbr", "500000b").target_bit_rate == 500_000


def test_parse_unknown_rejected():
    with pytest.raises(ConfigError):
        parse_parameter(EncoderConfig(), "definitely-not-a-param", "1")
    with pytest.raises(ConfigError):
        parse_parameter_string(EncoderConfig(), "preset6")


def test_derive_settings():
    cfg = EncoderConfig(source_width=1920, source_height=1080, enc_mode=6)
    d = derive_settings(validate_config(cfg))
    assert d.sb_size == 64
    assert d.superblock_cols == 30
    assert d.superblock_rows == 17
    assert d.mini_gop_size == 32  # 5 hierarchical levels
    assert (d.intra_period + 1) % d.mini_gop_size == 0
    assert d.base_qindex == qp_to_qindex(35)
    assert d.bit_depth == 10


def test_qp_to_qindex():
    assert qp_to_qindex(35) == 140
    assert qp_to_qindex(63) == 252
    assert qp_to_qindex(35.25) == 141
