#!/bin/bash
# QUALITY_r05.json — the full quality matrix, regenerated from HEAD.
# Classes (tools/make_test_clip.py --content ...) x configs:
#   p6 RA default/pan/occl/grain/text, p12 all-intra default/occl/text,
#   cfg3 (tune 3 + variance boost + sharpness) and cfg4 (film grain
#   synthesis) — the BASELINE.md scoring shapes.
# Reference: C-only SvtAv1EncApp at /tmp/refbin (BASELINE.md protocol).
set -x
cd /root/repo
OUT=${1:-QUALITY_r05.json}

for c in default pan occl grain text; do
  clip=/tmp/cif40.y4m
  [ $c != default ] && clip=/tmp/cif_$c.y4m
  [ -f $clip ] || python tools/make_test_clip.py --width 352 --height 288 \
      --frames 40 --noise 0.02 --content $c $clip
  JAX_PLATFORMS=cpu python tools/bd_rate.py --clip $clip --frames 40 \
      --gop -1 --preset 6 --our-preset 6 --tag p6_$c --out $OUT
done

for c in default occl text; do
  clip=/tmp/cif40.y4m
  [ $c != default ] && clip=/tmp/cif_$c.y4m
  JAX_PLATFORMS=cpu python tools/bd_rate.py --clip $clip --frames 40 \
      --gop 1 --preset 12 --our-preset 12 --tag p12ai_$c --out $OUT
done

# cfg4: film grain synthesis on the grain class
JAX_PLATFORMS=cpu python tools/bd_rate.py --clip /tmp/cif_grain.y4m \
    --frames 40 --gop -1 --preset 6 --our-preset 6 \
    --params "film-grain=8" --ref-args "--film-grain 8" \
    --tag p6_grain_fgs --out $OUT

# cfg3: tune 3 + variance boost + sharpness (the PSY eval shape)
JAX_PLATFORMS=cpu python tools/bd_rate.py --clip /tmp/cif40.y4m \
    --frames 40 --gop -1 --preset 6 --our-preset 6 \
    --params "tune=3:enable-variance-boost=1:sharpness=2" \
    --ref-args "--tune 3 --enable-variance-boost 1 --sharpness 2" \
    --tag p6_tune3_vb --out $OUT
echo QUALITY_DONE
