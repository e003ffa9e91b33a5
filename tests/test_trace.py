"""Pipeline tracing (utils/trace.py): per-stage spans per frame, JSONL
output, summary aggregation — the reference's pipeline-monitor analog
(SURVEY.md 5 aux subsystems)."""
import json
import os
import subprocess
import sys

import numpy as np


def test_trace_disabled_noop():
    from svt_av1_psy_tpu.utils import trace
    # module was imported without SVT_TRACE in this process
    with trace.stage("x"):
        pass
    trace.next_frame()
    assert trace.summary() == {} or not trace.ENABLED


def test_trace_jsonl_subprocess(tmp_path):
    clip = tmp_path / "c.y4m"
    out = tmp_path / "o.ivf"
    tr = tmp_path / "t.jsonl"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable, os.path.join(root, "tools",
                                                 "make_test_clip.py"),
                    str(clip), "--frames", "4", "--width", "128",
                    "--height", "96"], check=True, capture_output=True)
    env = dict(os.environ, SVT_TRACE=str(tr), JAX_PLATFORMS="cpu",
               PYTHONPATH=root)
    r = subprocess.run([sys.executable, "-m", "svt_av1_psy_tpu", "-i",
                        str(clip), "-b", str(out), "--preset", "12",
                        "--crf", "40", "--keyint", "0"],
                       env=env, capture_output=True, timeout=560)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    assert b"SVT_TRACE summary" in r.stderr
    lines = [json.loads(ln) for ln in tr.read_text().splitlines()]
    frames = [ln for ln in lines if "frame" in ln]
    assert len(frames) == 4
    assert "device_search" in frames[0]
    assert any("commit_walk" in k for k in frames[0])
    summ = [ln for ln in lines if "summary" in ln]
    assert summ and "device_search" in summ[0]["summary"]
