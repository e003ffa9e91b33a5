#!/usr/bin/env python
"""Benchmark: device encode-stage throughput at 1080p (frames/s/chip).

Prints ONE JSON line. Current metric: the jitted device frame step (intra
mode search + 64x64 DCT + quantize + recon over every superblock of a 1080p
frame). As the host pipeline moves to the native entropy backend this will
switch to full-encode fps vs the measured SvtAv1EncApp baseline
(BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from svt_av1_psy_tpu.models.frame_step import make_frame_step

    H, W = 1088, 1920
    batch = 4
    step = jax.jit(make_frame_step(qindex=60))
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 255, (batch, H, W), dtype=np.int32))

    # warmup / compile
    out = step(y)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(y)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    print(json.dumps({
        "metric": "device_frame_step_fps_1080p_intra",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
