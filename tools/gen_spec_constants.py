#!/usr/bin/env python
"""Convert reference table dumps into svt_av1_psy_tpu/constants/av1_tables.npz.

Dev-time only. The dumped tables are NORMATIVE AV1-specification constants
(default CDFs: spec 5.9/8.3; quant lookups: spec 7.12.2 Dequantization;
scan orders: spec 5.11.41; quantizer matrices: spec 7.12.3) — identical in
every conforming AV1 implementation. They are extracted by *running* small C
programs against the reference tables (see /tmp/constex in the build log)
rather than hand-transcribed, to avoid transcription errors.
"""

import sys

import numpy as np

OUT = "svt_av1_psy_tpu/constants/av1_tables.npz"

# FRAME_CONTEXT members that duplicate the per-qctx coefficient tables and are
# zero until svt_av1_default_coef_probs runs — dropped in favor of the *_q dumps.
_SKIP = {
    "txb_skip_cdf", "eob_extra_cdf", "dc_sign_cdf", "coeff_base_eob_cdf",
    "coeff_base_cdf", "coeff_br_cdf", "eob_flag_cdf16", "eob_flag_cdf32",
    "eob_flag_cdf64", "eob_flag_cdf128", "eob_flag_cdf256", "eob_flag_cdf512",
    "eob_flag_cdf1024",
}


def parse_dump(path):
    tables = {}
    with open(path) as f:
        for line in f:
            head, _, vals = line.partition(" : ")
            parts = head.split()
            name, dims = parts[0], [int(x) for x in parts[1:]]
            if len(dims) > 1 and dims[0] == len(dims) - 1:
                # "name ndim d0 d1 .." style from ex_cdf's dump(): first is ndim
                pass
            arr = np.array([int(x) for x in vals.split()], dtype=np.int32)
            tables[name] = (dims, arr)
    return tables


def main():
    cdf_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/constex/cdf_dump.txt"
    misc_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/constex/misc_dump.txt"
    out = {}

    for name, (dims, arr) in parse_dump(cdf_path).items():
        if name in _SKIP:
            continue
        shaped = arr.reshape(dims).astype(np.uint16)
        out["cdf_" + name] = shaped

    misc = parse_dump(misc_path)
    for name, (dims, arr) in misc.items():
        if name.startswith("scan_"):
            out[name] = arr.astype(np.int16)
        elif name.startswith("qm_"):
            out[name] = arr.reshape(dims).astype(np.uint8)
        else:
            out[name] = arr.reshape(dims).astype(np.int32)

    np.savez_compressed(OUT, **out)
    total = sum(v.size for v in out.values())
    print(f"wrote {len(out)} tables, {total} values -> {OUT}")


if __name__ == "__main__":
    main()
