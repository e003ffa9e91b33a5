#!/usr/bin/env python
"""Extract AV1 1-D transform butterfly networks as DATA tables.

The AV1 spec (7.13.3) defines each inverse transform as a fixed sequence of
butterfly stages; the reference's generated C (inv_transforms.c /
transforms.c 1-D kernels) is a literal rendering of that network. Instead of
hand-transcribing ~2000 butterfly lines (and inevitably typo-ing one), this
tool parses the network into per-stage index/weight tables consumed by a
generic vectorized stage-machine (svt_av1_psy_tpu/ops/transforms.py) — the
same tables drive the numpy reference and the batched JAX path.

Dev-time only; output svt_av1_psy_tpu/constants/txfm_stages.npz is committed.

Per-lane encoding per stage:
  mode   : 0 = linear  out[i] = lw0*x[a] + lw1*x[b]   (clamped iff clamp=1)
           1 = btf     out[i] = round_shift(s0*cospi[i0]*x[a] + s1*cospi[i1]*x[b], cos_bit)
"""

import re
import sys

import numpy as np

SRC_INV = "/root/reference/Source/Lib/Codec/inv_transforms.c"
SRC_FWD = "/root/reference/Source/Lib/Codec/transforms.c"
OUT = "svt_av1_psy_tpu/constants/txfm_stages.npz"

FUNCS = {
    # name in npz : (source file, function name, lanes)
    "idct4": (SRC_INV, "svt_av1_idct4_new", 4),
    "idct8": (SRC_INV, "svt_av1_idct8_new", 8),
    "idct16": (SRC_INV, "svt_av1_idct16_new", 16),
    "idct32": (SRC_INV, "svt_av1_idct32_new", 32),
    "idct64": (SRC_INV, "svt_av1_idct64_new", 64),
    "iadst8": (SRC_INV, "svt_av1_iadst8_new", 8),
    "iadst16": (SRC_INV, "svt_av1_iadst16_new", 16),
    "fdct4": (SRC_FWD, "svt_av1_fdct4_new", 4),
    "fdct8": (SRC_FWD, "svt_av1_fdct8_new", 8),
    "fdct16": (SRC_FWD, "svt_av1_fdct16_new", 16),
    "fdct32": (SRC_FWD, "svt_av1_fdct32_new", 32),
    "fdct64": (SRC_FWD, "svt_av1_fdct64_new", 64),
    "fadst8": (SRC_FWD, "svt_av1_fadst8_new", 8),
    "fadst16": (SRC_FWD, "svt_av1_fadst16_new", 16),
}

ASSIGN_RE = re.compile(r"bf1\[(\d+)\]\s*=\s*(.+);")
BTF_RE = re.compile(
    r"half_btf\(\s*(-?)cospi\[(\d+)\],\s*(?:bf0|input)\[(\d+)\],\s*"
    r"(-?)cospi\[(\d+)\],\s*(?:bf0|input)\[(\d+)\],\s*cos_bit\)")
CLAMP_RE = re.compile(r"clamp_value\((.+),\s*stage_range\[stage\]\)")
TERM_RE = re.compile(r"([+-]?)\s*(?:bf0|input)\[(\d+)\]")


def extract_body(src_text, fn_name):
    m = re.search(rf"void {re.escape(fn_name)}\([^)]*\)\s*{{", src_text)
    if not m:
        raise ValueError(f"function {fn_name} not found")
    start = m.end()
    depth = 1
    i = start
    while depth:
        if src_text[i] == "{":
            depth += 1
        elif src_text[i] == "}":
            depth -= 1
        i += 1
    return src_text[start:i - 1]


def parse_function(src_text, fn_name, lanes):
    body = extract_body(src_text, fn_name)
    # strip block openers/comments; split into stage chunks
    lines = []
    for raw in body.split("\n"):
        line = raw.split("//")[0].strip()
        if line:
            lines.append(line)
    stages = []
    cur = {}
    for line in lines:
        m = ASSIGN_RE.match(line)
        if not m:
            continue
        idx, rhs = int(m.group(1)), m.group(2)
        if idx in cur:  # new stage begins when an index repeats
            stages.append(cur)
            cur = {}
        cur[idx] = rhs
    if cur:
        stages.append(cur)

    parsed = []
    for st in stages:
        if len(st) != lanes:
            raise ValueError(f"{fn_name}: stage has {len(st)} lanes, want {lanes}")
        a = np.zeros(lanes, np.int32)
        b = np.zeros(lanes, np.int32)
        mode = np.zeros(lanes, np.int8)
        clamp = np.zeros(lanes, np.int8)
        lw0 = np.zeros(lanes, np.int8)
        lw1 = np.zeros(lanes, np.int8)
        c0i = np.zeros(lanes, np.int8)
        c0s = np.ones(lanes, np.int8)
        c1i = np.zeros(lanes, np.int8)
        c1s = np.ones(lanes, np.int8)
        for i in range(lanes):
            rhs = st[i]
            bm = BTF_RE.search(rhs)
            if bm:
                mode[i] = 1
                c0s[i] = -1 if bm.group(1) == "-" else 1
                c0i[i] = int(bm.group(2))
                a[i] = int(bm.group(3))
                c1s[i] = -1 if bm.group(4) == "-" else 1
                c1i[i] = int(bm.group(5))
                b[i] = int(bm.group(6))
                continue
            cm = CLAMP_RE.search(rhs)
            expr = cm.group(1) if cm else rhs
            clamp[i] = 1 if cm else 0
            terms = TERM_RE.findall(expr)
            # validate the expression is nothing but those terms
            leftover = TERM_RE.sub("", expr).replace(" ", "")
            if leftover:
                raise ValueError(f"{fn_name}: unparsed rhs {rhs!r}")
            if not 1 <= len(terms) <= 2:
                raise ValueError(f"{fn_name}: bad term count in {rhs!r}")
            sgn0, i0 = terms[0]
            a[i] = int(i0)
            lw0[i] = -1 if sgn0 == "-" else 1
            if len(terms) == 2:
                sgn1, i1 = terms[1]
                b[i] = int(i1)
                lw1[i] = -1 if sgn1 == "-" else 1
        parsed.append(dict(a=a, b=b, mode=mode, clamp=clamp, lw0=lw0, lw1=lw1,
                           c0i=c0i, c0s=c0s, c1i=c1i, c1s=c1s))
    return parsed


def main():
    out = {}
    for name, (path, fn, lanes) in FUNCS.items():
        text = open(path).read()
        stages = parse_function(text, fn, lanes)
        out[f"{name}_nstages"] = np.array(len(stages), np.int32)
        for k, st in enumerate(stages):
            for field, arr in st.items():
                out[f"{name}_s{k}_{field}"] = arr
        nbtf = sum(int(st["mode"].sum()) for st in stages)
        print(f"{name}: {len(stages)} stages, {nbtf} btf lanes")
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
