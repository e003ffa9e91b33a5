"""Rate control: VBR/CBR/capped-CRF models, recode loop, 2-pass
allocation (ref rc_process.c:3269; pass2_strategy.c; firstpass.c)."""
import json
import subprocess
import sys

import numpy as np
import pytest

from svt_av1_psy_tpu.models.fast_intra import FastIntraEncoder
from svt_av1_psy_tpu.models.ratecontrol import (FirstPassStats,
                                                RateController,
                                                TwoPassAllocator)


def _clip(w, h, n, seed=11):
    rng = np.random.default_rng(seed)
    frames = []
    for t in range(n):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        y = ((xx + 2 * yy + 5 * t) % 256) + rng.normal(0, 5.0, (h, w))
        u = np.full((h // 2, w // 2), 120.0)
        v = np.full((h // 2, w // 2), 130.0)
        frames.append(tuple(np.clip(p, 0, 255).astype(np.uint8)
                            for p in (y, u, v)))
    return frames


def _encode_with_rc(rc, frames, w, h, gop=0):
    enc = FastIntraEncoder(w, h, qindex=rc.base_qindex)
    enc.gop_size = gop
    sizes = []
    for i, f in enumerate(frames):
        key = i == 0 if gop == 0 else (i % gop == 0 if gop else True)
        enc.qindex = rc.frame_qindex(key)
        snap = enc.snapshot()
        out = enc.encode_frame(*f)
        attempt = 0
        while True:
            nq = rc.recode_qindex(enc.qindex, 8 * len(out.payload), key,
                                  attempt=attempt)
            if nq is None:
                break
            enc.restore(snap)
            enc.qindex = nq
            out = enc.encode_frame(*f)
            attempt += 1
        rc.update(enc.qindex, 8 * len(out.payload), key)
        sizes.append(len(out.payload))
    return sizes


def test_vbr_converges_to_target():
    """One-pass VBR must land near the requested average bitrate."""
    w, h, n, fps = 176, 144, 24, 30.0
    frames = _clip(w, h, n)
    target_bps = 600_000.0
    rc = RateController(mode="vbr", base_qindex=120,
                        target_bps=target_bps, fps=fps)
    sizes = _encode_with_rc(rc, frames, w, h, gop=0)
    # ignore the first 4 frames (model seeding transient)
    avg_bps = np.mean(sizes[4:]) * 8 * fps
    assert abs(avg_bps / target_bps - 1.0) < 0.35, avg_bps


def test_cbr_respects_buffer():
    """CBR: no frame may exceed what the leaky bucket can hold, and the
    buffer never underflows with recode on."""
    w, h, n, fps = 176, 144, 20, 30.0
    frames = _clip(w, h, n)
    target = 400_000.0
    rc = RateController(mode="cbr", base_qindex=80, target_bps=target,
                        fps=fps, buf_size_ms=500)
    sizes = _encode_with_rc(rc, frames, w, h, gop=0)
    assert rc.buf_level >= 0.0
    # steady-state frames stay near the per-frame budget
    per_frame = target / fps
    assert np.mean(sizes[4:]) * 8 < 3.0 * per_frame


def test_capped_crf_raises_q_over_cap():
    """Capped CRF (--mbr): q rises while the rolling window exceeds the
    cap and returns to base when it does not."""
    rc = RateController(mode="crf", base_qindex=100, max_bps=100_000.0,
                        fps=10.0)
    assert rc.frame_qindex(False) == 100
    for _ in range(10):
        rc.update(100, 30_000, is_key=False)    # 300kbps >> 100kbps cap
    assert rc.frame_qindex(False) > 100
    rc2 = RateController(mode="crf", base_qindex=100, max_bps=1e9,
                         fps=10.0)
    for _ in range(10):
        rc2.update(100, 30_000, is_key=False)
    assert rc2.frame_qindex(False) == 100


def test_recode_verdict_model_inversion():
    rc = RateController(mode="cbr", base_qindex=100, target_bps=240_000.0,
                        fps=30.0, buf_size_ms=500)
    # a frame larger than the whole buffer: must ask for a higher q
    nq = rc.recode_qindex(100, int(rc.buf_level * 1.5), is_key=False)
    assert nq is not None and nq > 100
    # tiny frame: keep
    assert rc.recode_qindex(100, 500, is_key=False) is None
    # attempts bounded
    assert rc.recode_qindex(100, 10**7, False, attempt=2) is None


def test_snapshot_restore_byte_identical():
    """encode -> restore -> encode must reproduce the identical stream
    (the recode loop's correctness precondition)."""
    w, h = 176, 144
    frames = _clip(w, h, 3)
    enc = FastIntraEncoder(w, h, qindex=120)
    enc.gop_size = 0
    enc.encode_frame(*frames[0])
    snap = enc.snapshot()
    p1 = enc.encode_frame(*frames[1]).payload
    p2 = enc.encode_frame(*frames[2]).payload
    enc.restore(snap)
    q1 = enc.encode_frame(*frames[1]).payload
    q2 = enc.encode_frame(*frames[2]).payload
    assert p1 == q1 and p2 == q2


def test_first_pass_stats_roundtrip(tmp_path):
    st = FirstPassStats()
    st.add(0, 100, 8000, True)
    st.add(1, 120, 2000, False, intra_sad=5.0, inter_sad=2.0)
    path = str(tmp_path / "2pass.log")
    st.dump(path)
    back = FirstPassStats.load(path)
    assert back.frames == st.frames


def test_two_pass_allocation_prefers_complex_frames(tmp_path):
    st = FirstPassStats()
    # frame 1 twice as complex as frame 0 at the same q
    st.add(0, 120, 4000, False)
    st.add(1, 120, 8000, False)
    alloc = TwoPassAllocator(st, target_bps=300_000.0, fps=30.0)
    assert alloc.targets[1] > alloc.targets[0]
    # complex frame gets a q that predicts roughly its target
    q0, q1 = alloc.frame_qindex(0), alloc.frame_qindex(1)
    assert 1 <= q0 <= 255 and 1 <= q1 <= 255


def test_cli_two_pass_end_to_end(tmp_path):
    """pass 1 writes stats, pass 2 consumes them and hits the target."""
    import io

    from svt_av1_psy_tpu.io.y4m import Y4mWriter
    w, h, n = 176, 144, 12
    src = str(tmp_path / "in.y4m")
    frames = _clip(w, h, n)
    with Y4mWriter(src, w, h) as wr:
        for f in frames:
            wr.write_frame(*f)
    stats = str(tmp_path / "st.log")
    out1 = str(tmp_path / "p1.ivf")
    out2 = str(tmp_path / "p2.ivf")
    base = [sys.executable, "-m", "svt_av1_psy_tpu", "-i", src,
            "--preset", "12", "--gop", "0", "--tbr", "500",
            "--stats", stats]
    r1 = subprocess.run(base + ["-b", out1, "--pass", "1", "--crf", "35"],
                        capture_output=True, text=True)
    assert r1.returncode == 0, r1.stderr[-500:]
    with open(stats) as f:
        assert json.loads(f.readline())["n"] == n
    r2 = subprocess.run(base + ["-b", out2, "--pass", "2"],
                        capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr[-500:]
    import os
    total = os.path.getsize(out2)
    bps = total * 8 / n * 30.0
    assert abs(bps / 500_000 - 1.0) < 0.4, bps
