#!/usr/bin/env python
"""Generate range-coder golden vectors by driving the REFERENCE encoder.

Dev-time only: requires the golden harness built from the reference's
bitstream_unit.c (see tools/README-golden.md). The generated
tests/golden/ec_vectors.json is committed so CI needs neither the reference
nor a C toolchain. This mirrors the reference's own C-vs-SIMD equivalence
test strategy (SURVEY.md §4) with the reference as the trusted side.
"""

import json
import random
import subprocess
import sys

HARNESS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ecgold/ecgold"
OUT = sys.argv[2] if len(sys.argv) > 2 else "tests/golden/ec_vectors.json"

PROB_TOP = 1 << 15


def random_icdf(rng, nsyms):
    cuts = sorted(rng.sample(range(1, PROB_TOP), nsyms - 1))
    cum = cuts + [PROB_TOP]
    icdf = [PROB_TOP - c for c in cum] + [rng.choice([0, 5, 17, 33])]
    return icdf


def gen_case(rng, n_ops, seed):
    ops = []
    lines = []
    for _ in range(n_ops):
        kind = rng.choice(["B", "S", "L", "A", "A", "S"])
        if kind == "B":
            f = rng.randrange(64, PROB_TOP - 64)
            val = rng.randrange(2)
            ops.append({"op": "bool", "f": f, "val": val})
            lines.append(f"B {f} {val}")
        elif kind == "L":
            bits = rng.randrange(1, 17)
            value = rng.randrange(1 << bits)
            ops.append({"op": "lit", "bits": bits, "value": value})
            lines.append(f"L {bits} {value}")
        else:
            nsyms = rng.randrange(2, 17)
            s = rng.randrange(nsyms)
            icdf = random_icdf(rng, nsyms)
            ops.append({"op": "sym", "nsyms": nsyms, "s": s, "icdf": icdf,
                        "adapt": kind == "A"})
            lines.append(f"{kind} {nsyms} {s} " + " ".join(map(str, icdf)))
    lines.append("D")
    proc = subprocess.run([HARNESS], input="\n".join(lines),
                          capture_output=True, text=True, check=True)
    out_lines = proc.stdout.strip().split("\n")
    adapted = []
    byte_line = tell_line = None
    for ln in out_lines:
        if ln.startswith("BYTES"):
            byte_line = ln
        elif ln.startswith("TELL"):
            tell_line = ln
        else:
            adapted.append([int(x) for x in ln.split()])
    _, n, hexbytes = byte_line.split()
    assert int(n) * 2 == len(hexbytes)
    return {"seed": seed, "ops": ops, "bytes": hexbytes,
            "tell": int(tell_line.split()[1]), "adapted_cdfs": adapted}


def main():
    cases = []
    for seed in range(64):
        rng = random.Random(seed)
        n_ops = rng.choice([1, 2, 5, 20, 100, 500])
        cases.append(gen_case(rng, n_ops, seed))
    # edge cases: empty stream; single highly-skewed bool each way
    for seed, ops_lines in [
        (1000, []),
        (1001, [("B 64 1", {"op": "bool", "f": 64, "val": 1})]),
        (1002, [("B 32700 0", {"op": "bool", "f": 32700, "val": 0})]),
    ]:
        lines = [l for l, _ in ops_lines] + ["D"]
        proc = subprocess.run([HARNESS], input="\n".join(lines),
                              capture_output=True, text=True, check=True)
        byte_line = [l for l in proc.stdout.split("\n") if l.startswith("BYTES")][0]
        tell_line = [l for l in proc.stdout.split("\n") if l.startswith("TELL")][0]
        cases.append({"seed": seed, "ops": [o for _, o in ops_lines],
                      "bytes": byte_line.split()[2] if len(byte_line.split()) > 2 else "",
                      "tell": int(tell_line.split()[1]), "adapted_cdfs": []})
    with open(OUT, "w") as f:
        json.dump(cases, f)
    print(f"wrote {len(cases)} cases to {OUT}")


if __name__ == "__main__":
    main()
