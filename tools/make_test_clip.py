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


# --- content classes (qualitatively distinct generators for the BD
#     harness; the camera-content stand-ins the image lacks) --------------

def _texture(rng, h, w, cell=8, lo=40, hi=210):
    """Static block texture with per-pixel detail."""
    base = rng.integers(lo, hi, (h // cell + 2, w // cell + 2)).astype(
        np.float32).repeat(cell, 0).repeat(cell, 1)[:h, :w]
    return base + rng.normal(0, 4, (h, w)).astype(np.float32)


def make_frame_pan(w, h, t, bit_depth=8, noise=0.0, rng=None, state={}):
    """Global pan + slow zoom over a large textured background — the
    global-motion / MV-coherence class."""
    hi = (1 << bit_depth) - 1
    key = (w, h)
    if state.get("key") != key:
        r2 = np.random.default_rng(101)
        state["key"] = key
        state["bg"] = _texture(r2, 2 * h, 2 * w)
    bg = state["bg"]
    zoom = 1.0 + 0.002 * t
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = (xx - w / 2) * zoom + w / 2 + 3.3 * t + w // 4
    sy = (yy - h / 2) * zoom + h / 2 + 1.1 * t + h // 4
    xi = np.clip(sx.astype(np.int32), 0, 2 * w - 1)
    yi = np.clip(sy.astype(np.int32), 0, 2 * h - 1)
    y = bg[yi, xi] / 255.0
    if noise > 0 and rng is not None:
        y = y + rng.normal(0, noise, y.shape).astype(np.float32)
    y = np.clip(y * hi, 0, hi)
    u = np.full((h // 2, w // 2), 0.52 * hi)
    v = np.full((h // 2, w // 2), 0.48 * hi)
    dt = np.uint16 if bit_depth > 8 else np.uint8
    return (y.astype(dt), np.clip(u, 0, hi).astype(dt),
            np.clip(v, 0, hi).astype(dt))


def make_frame_occl(w, h, t, bit_depth=8, noise=0.0, rng=None, state={}):
    """Moving occluders over a static textured background — the
    occlusion/uncover class (multi-reference prediction territory)."""
    hi = (1 << bit_depth) - 1
    key = (w, h)
    if state.get("key") != key:
        r2 = np.random.default_rng(102)
        state["key"] = key
        state["bg"] = _texture(r2, h, w)
    y = state["bg"].copy()
    for k, (speed, size, base, val) in enumerate(
            [(9, max(32, h // 5), h // 8, 220),
             (7, max(24, h // 6), h // 2, 30),
             (5, max(16, h // 8), 3 * h // 4, 128)]):
        x0 = (10 + t * speed) % max(1, w - size)
        y0 = min(base + int(10 * np.sin(t / 3 + k)), h - size - 1)
        y[y0:y0 + size, x0:x0 + size] = val + (t * 3) % 17
    y = y / 255.0
    if noise > 0 and rng is not None:
        y = y + rng.normal(0, noise, y.shape).astype(np.float32)
    y = np.clip(y * hi, 0, hi)
    u = np.full((h // 2, w // 2), 0.5 * hi)
    v = np.full((h // 2, w // 2), 0.5 * hi)
    dt = np.uint16 if bit_depth > 8 else np.uint8
    return (y.astype(dt), np.clip(u, 0, hi).astype(dt),
            np.clip(v, 0, hi).astype(dt))


def make_frame_grain(w, h, t, bit_depth=8, noise=0.0, rng=None):
    """Film-grain class: the default scene under strong temporally
    independent AR-correlated grain (the --film-grain / cfg4 shape)."""
    y, u, v = make_frame(w, h, t, bit_depth, 0.0, None)
    hi = (1 << bit_depth) - 1
    if rng is None:
        rng = np.random.default_rng(103 + t)
    g = rng.normal(0, max(noise, 0.03) * hi, (h, w)).astype(np.float32)
    # lag-1 spatial correlation (AR-like grain, not white noise)
    g[1:, :] += 0.35 * g[:-1, :]
    g[:, 1:] += 0.35 * g[:, :-1]
    y = np.clip(y.astype(np.float32) + g, 0, hi)
    return y.astype(u.dtype), u, v


def make_frame_text(w, h, t, bit_depth=8, noise=0.0, rng=None, state={}):
    """Text/UI class: hard-edged glyph-like rectangles and thin lines on
    flat panels, with a scrolling region — screen-content shapes."""
    hi = (1 << bit_depth) - 1
    key = (w, h)
    if state.get("key") != key:
        r2 = np.random.default_rng(104)
        ui = np.full((h, w), 235.0, np.float32)
        ui[: h // 8, :] = 64                     # title bar
        for k in range(60):                      # glyph blocks
            gx = int(r2.integers(4, max(5, w - 12)))
            gy = int(r2.integers(h // 8 + 4, max(h // 8 + 5, h - 8)))
            gw = int(r2.integers(2, 9))
            ui[gy:gy + 2, gx:gx + gw] = 16
        for k in range(6):                       # separators
            ly = int(r2.integers(h // 8, h - 1))
            ui[ly, :] = 128
        state["key"] = key
        state["ui"] = ui
    y = state["ui"].copy()
    # scrolling console region (vertical motion of sharp content)
    sh = h // 4
    shift = (2 * t) % sh
    region = y[h - sh:, :].copy()
    y[h - sh:, :] = np.roll(region, -shift, axis=0)
    y = y / 255.0
    y = np.clip(y * hi, 0, hi)
    u = np.full((h // 2, w // 2), 0.5 * hi)
    v = np.full((h // 2, w // 2), 0.5 * hi)
    dt = np.uint16 if bit_depth > 8 else np.uint8
    return (y.astype(dt), np.clip(u, 0, hi).astype(dt),
            np.clip(v, 0, hi).astype(dt))


CONTENT_CLASSES = {
    "default": make_frame,
    "pan": make_frame_pan,
    "occl": make_frame_occl,
    "grain": make_frame_grain,
    "text": make_frame_text,
}


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
    p.add_argument("--content", default="default",
                   choices=sorted(CONTENT_CLASSES),
                   help="content class: default (gradient+mover), pan "
                        "(global pan/zoom on texture), occl (moving "
                        "occluders), grain (AR film grain), text "
                        "(UI/text with scrolling)")
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    gen = CONTENT_CLASSES[args.content]
    with Y4mWriter(args.output, args.width, args.height, args.fps, 1,
                   args.bit_depth) as wr:
        for t in range(args.frames):
            wr.write_frame(*gen(args.width, args.height, t,
                                args.bit_depth, args.noise, rng))
    print(f"wrote {args.frames} frames {args.width}x{args.height} "
          f"{args.bit_depth}-bit to {args.output}")


if __name__ == "__main__":
    main()
