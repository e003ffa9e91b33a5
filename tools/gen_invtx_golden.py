#!/usr/bin/env python
"""Generate inverse-transform golden vectors from the reference's normative
C implementation (dev-time only; harness at /tmp/constex/ex_invtx).

The inverse transform is decoder-normative, so the reference's `_c` path is a
faithful spec oracle. Coverage: every TX size, every legal TX type for that
size, 8/10-bit, sparse + dense coefficient patterns.
"""

import subprocess

import numpy as np

HARNESS = "/tmp/constex/ex_invtx"
OUT = "tests/golden/invtx_vectors.npz"

TSW = [4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64]
TSH = [4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16]


def legal_types(ts):
    w, h = TSW[ts], TSH[ts]
    m = max(w, h)
    if m == 64:
        return [0]          # DCT_DCT only
    if m == 32:
        return [0, 9]       # DCT_DCT, IDTX
    return list(range(16))  # all


def main():
    lines = []
    keys = []
    for ts in range(19):
        for tt in legal_types(ts):
            for bd in (8, 10):
                for mode in (0, 1, 2):
                    seed = 1000 * ts + 61 * tt + 7 * bd + mode + 1
                    lines.append(f"{ts} {tt} {bd} {seed} {mode}")
                    keys.append((ts, tt, bd, mode))
    proc = subprocess.run([HARNESS], input="\n".join(lines) + "\n",
                          capture_output=True, text=True, check=True)
    out_lines = proc.stdout.strip().split("\n")
    assert len(out_lines) == 3 * len(keys), (len(out_lines), len(keys))
    data = {}
    for i, (ts, tt, bd, mode) in enumerate(keys):
        c = np.array(out_lines[3 * i + 0].split()[1:], dtype=np.int32)
        p = np.array(out_lines[3 * i + 1].split()[1:], dtype=np.uint16)
        r = np.array(out_lines[3 * i + 2].split()[1:], dtype=np.uint16)
        tag = f"{ts}_{tt}_{bd}_{mode}"
        data["c_" + tag] = c
        data["p_" + tag] = p
        data["r_" + tag] = r
    np.savez_compressed(OUT, **data)
    print(f"wrote {len(keys)} cases to {OUT}")


if __name__ == "__main__":
    main()
