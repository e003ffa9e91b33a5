#!/usr/bin/env python
"""Generate synthetic y4m test clips (no network; the analog of the reference's
DummyVideoSource, ref: test/e2e_test/DummyVideoSource.h).

Patterns: smooth gradients + moving blocks + optional noise/grain, so clips
exercise flat areas (DC/variance boost), texture (AC energy), and motion.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from svt_av1_psy_tpu.io.y4m import Y4mWriter


def make_frame(w, h, t, bit_depth=8, noise=0.0, rng=None):
    hi = (1 << bit_depth) - 1
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # moving diagonal gradient
    y = (xx + yy + 4 * t) % 256 / 255.0
    # moving bright square with texture
    bx, by = (32 + 5 * t) % max(1, w - 64), (24 + 3 * t) % max(1, h - 64)
    sq = (xx >= bx) & (xx < bx + 64) & (yy >= by) & (yy < by + 64)
    tex = 0.15 * np.sin(xx * 0.7) * np.sin(yy * 0.9)
    y = np.where(sq, 0.8 + tex, 0.2 + 0.6 * y)
    if noise > 0 and rng is not None:
        y = y + rng.normal(0, noise, y.shape).astype(np.float32)
    y = np.clip(y * hi, 0, hi)
    u = np.full((h // 2, w // 2), 0.5 * hi) + 0.1 * hi * np.sin(0.05 * t)
    v = np.full((h // 2, w // 2), 0.5 * hi) - 0.1 * hi * np.cos(0.05 * t)
    dt = np.uint16 if bit_depth > 8 else np.uint8
    return y.astype(dt), np.clip(u, 0, hi).astype(dt), np.clip(v, 0, hi).astype(dt)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output")
    p.add_argument("--width", type=int, default=352)
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--bit-depth", type=int, default=8, choices=[8, 10])
    p.add_argument("--noise", type=float, default=0.0, help="gaussian noise sigma (0..1 scale)")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    with Y4mWriter(args.output, args.width, args.height, args.fps, 1,
                   args.bit_depth) as wr:
        for t in range(args.frames):
            wr.write_frame(*make_frame(args.width, args.height, t,
                                       args.bit_depth, args.noise, rng))
    print(f"wrote {args.frames} frames {args.width}x{args.height} "
          f"{args.bit_depth}-bit to {args.output}")


if __name__ == "__main__":
    main()
