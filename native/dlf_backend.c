/* Normative AV1 deblocking filter (spec 7.14) + encoder level search.
 *
 * Mirrors svt_av1_psy_tpu/ops/loopfilter.py (property-tested bit-exact
 * against dav1d) in C for the fast path. Reference counterparts:
 * Source/Lib/Codec/deblocking_common.c (kernels), deblocking_filter.c
 * (edge/parameter derivation), dlf_process.c (process kernel).
 *
 * The commit engines record per-4px-unit tx dims into shared maps
 * (tile-disjoint writes); the filter then runs frame-wide (DLF crosses
 * tile boundaries).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "tpu_native.h"

static void thresholds(int level, int sharpness, int *blimit, int *limit,
                       int *hev) {
    int shift = sharpness > 4 ? 2 : (sharpness > 0 ? 1 : 0);
    int lim = level >> shift;
    if (sharpness > 0 && lim > 9 - sharpness) lim = 9 - sharpness;
    if (lim < 1) lim = 1;
    *limit = lim;
    *blimit = 2 * (level + 2) + lim;
    *hev = level >> 4;
}

#define ABS(a) ((a) < 0 ? -(a) : (a))

static int clamp_i(int v, int lo, int hi) {
    return v < lo ? lo : v > hi ? hi : v;
}

/* filter one line of samples across an edge. x: 2*half samples
 * p(half-1)..p0 q0..q(half-1); modifies in place. */
static void filter_line(int32_t *x, int half, int length, int blimit,
                        int limit, int thresh, int bd) {
    int p0 = x[half - 1], p1 = x[half - 2];
    int q0 = x[half], q1 = x[half + 1];
    int ft = 1 << (bd - 8);
    int sh = bd - 8, mid = 128 << sh, lo = -mid, hi = mid - 1;

    int mask, hev, flat = 0, flat2 = 0;
    int p2 = 0, p3 = 0, q2 = 0, q3 = 0;
    if (length == 4) {
        mask = !((ABS(p1 - p0) > limit) || (ABS(q1 - q0) > limit) ||
                 (ABS(p0 - q0) * 2 + ABS(p1 - q1) / 2 > blimit));
    } else if (length == 6) {
        p2 = x[half - 3];
        q2 = x[half + 2];
        mask = !((ABS(p2 - p1) > limit) || (ABS(p1 - p0) > limit) ||
                 (ABS(q1 - q0) > limit) || (ABS(q2 - q1) > limit) ||
                 (ABS(p0 - q0) * 2 + ABS(p1 - q1) / 2 > blimit));
        flat = !((ABS(p1 - p0) > ft) || (ABS(q1 - q0) > ft) ||
                 (ABS(p2 - p0) > ft) || (ABS(q2 - q0) > ft));
    } else {
        p2 = x[half - 3];
        p3 = x[half - 4];
        q2 = x[half + 2];
        q3 = x[half + 3];
        mask = !((ABS(p3 - p2) > limit) || (ABS(p2 - p1) > limit) ||
                 (ABS(p1 - p0) > limit) || (ABS(q1 - q0) > limit) ||
                 (ABS(q2 - q1) > limit) || (ABS(q3 - q2) > limit) ||
                 (ABS(p0 - q0) * 2 + ABS(p1 - q1) / 2 > blimit));
        flat = !((ABS(p1 - p0) > ft) || (ABS(q1 - q0) > ft) ||
                 (ABS(p2 - p0) > ft) || (ABS(q2 - q0) > ft) ||
                 (ABS(p3 - p0) > ft) || (ABS(q3 - q0) > ft));
    }
    hev = (ABS(p1 - p0) > thresh) || (ABS(q1 - q0) > thresh);

    /* narrow filter (filter4) results */
    int f1o_p1 = p1, f1o_p0 = p0, f1o_q0 = q0, f1o_q1 = q1;
    {
        int ps1 = p1 - mid, ps0 = p0 - mid, qs0 = q0 - mid, qs1 = q1 - mid;
        int f = hev ? clamp_i(ps1 - qs1, lo, hi) : 0;
        f = clamp_i(f + 3 * (qs0 - ps0), lo, hi);
        f = mask ? f : 0;
        int f1 = clamp_i(f + 4, lo, hi) >> 3;
        int f2 = clamp_i(f + 3, lo, hi) >> 3;
        int oq0 = clamp_i(qs0 - f1, lo, hi) + mid;
        int op0 = clamp_i(ps0 + f2, lo, hi) + mid;
        int f3 = hev ? 0 : (f1 + 1) >> 1;
        int oq1 = clamp_i(qs1 - f3, lo, hi) + mid;
        int op1 = clamp_i(ps1 + f3, lo, hi) + mid;
        if (mask) {
            f1o_p1 = op1;
            f1o_p0 = op0;
            f1o_q0 = oq0;
            f1o_q1 = oq1;
        }
    }
    if (length == 4) {
        x[half - 2] = f1o_p1;
        x[half - 1] = f1o_p0;
        x[half] = f1o_q0;
        x[half + 1] = f1o_q1;
        return;
    }
#define R2(v) (((v) + 4) >> 3)
    if (length == 6) {
        if (mask && flat) {
            x[half - 2] = R2(p2 * 3 + p1 * 2 + p0 * 2 + q0);
            x[half - 1] = R2(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1);
            x[half] = R2(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2);
            x[half + 1] = R2(p0 + q0 * 2 + q1 * 2 + q2 * 3);
        } else {
            x[half - 2] = f1o_p1;
            x[half - 1] = f1o_p0;
            x[half] = f1o_q0;
            x[half + 1] = f1o_q1;
        }
        return;
    }
    int sel8 = mask && flat;
    int op2v = p2, op1v = f1o_p1, op0v = f1o_p0;
    int oq0v = f1o_q0, oq1v = f1o_q1, oq2v = q2;
    if (sel8) {
        op2v = R2(p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0);
        op1v = R2(p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1);
        op0v = R2(p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2);
        oq0v = R2(p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3);
        oq1v = R2(p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3);
        oq2v = R2(p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3);
    }
    if (length == 8) {
        x[half - 3] = op2v;
        x[half - 2] = op1v;
        x[half - 1] = op0v;
        x[half] = oq0v;
        x[half + 1] = oq1v;
        x[half + 2] = oq2v;
        return;
    }
    /* length 14 */
    {
        int p4 = x[half - 5], p5 = x[half - 6], p6 = x[half - 7];
        int q4 = x[half + 4], q5 = x[half + 5], q6 = x[half + 6];
        flat2 = !((ABS(p5 - p0) > ft) || (ABS(q5 - q0) > ft) ||
                  (ABS(p6 - p0) > ft) || (ABS(q6 - q0) > ft) ||
                  (ABS(p4 - p0) > ft) || (ABS(q4 - q0) > ft));
        int sel14 = sel8 && flat2;
        if (sel14) {
#define R4(v) (((v) + 8) >> 4)
            int o_6 = R4(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0);
            int o_5 = R4(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 +
                         q0 + q1);
            int o_4 = R4(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 +
                         q0 + q1 + q2);
            int o_3 = R4(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 +
                         q0 + q1 + q2 + q3);
            int o_2 = R4(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 +
                         q0 + q1 + q2 + q3 + q4);
            int o_1 = R4(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 +
                         q1 + q2 + q3 + q4 + q5);
            int o0 = R4(p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 +
                        q2 + q3 + q4 + q5 + q6);
            int o1 = R4(p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 +
                        q3 + q4 + q5 + q6 * 2);
            int o2 = R4(p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 +
                        q4 + q5 + q6 * 3);
            int o3 = R4(p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 +
                        q5 + q6 * 4);
            int o4 = R4(p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 +
                        q6 * 5);
            int o5 = R4(p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7);
            x[half - 6] = o_6;
            x[half - 5] = o_5;
            x[half - 4] = o_4;
            x[half - 3] = o_3;
            x[half - 2] = o_2;
            x[half - 1] = o_1;
            x[half] = o0;
            x[half + 1] = o1;
            x[half + 2] = o2;
            x[half + 3] = o3;
            x[half + 4] = o4;
            x[half + 5] = o5;
        } else {
            x[half - 3] = op2v;
            x[half - 2] = op1v;
            x[half - 1] = op0v;
            x[half] = oq0v;
            x[half + 1] = oq1v;
            x[half + 2] = oq2v;
        }
    }
}

/* Apply the loop filter to one plane region.
 * img: uint16 plane, stride; txdim: per-4px-unit tx dim map (uint8, px),
 * rows x cols in the plane's unit grid with map_stride; filters rows
 * [row0, row1) of units. Vertical pass then horizontal pass must be
 * frame-wide per spec — the caller splits passes, not rows. */
static void dlf_plane_pass(uint16_t *img, int stride, const uint8_t *txdim,
                           int map_stride, int rows, int cols, int is_luma,
                           int level, int sharpness, int vertical, int bd,
                           int w, int h) {
    if (!level) return;
    /* the loop filter skips mi units whose pixel origin lies outside
     * the DISPLAY dims (spec 7.14.1); mi columns past an odd display
     * width are reconstructed but not filtered. 0 = unbounded. */
    if (w > 0 && (w + 3) / 4 < cols) cols = (w + 3) / 4;
    if (h > 0 && (h + 3) / 4 < rows) rows = (h + 3) / 4;
    int blimit, limit, hev;
    thresholds(level, sharpness, &blimit, &limit, &hev);
    int sh8 = bd - 8;
    blimit <<= sh8;
    limit <<= sh8;
    hev <<= sh8;
    int32_t line[16];
    if (vertical) {
        for (int cu = 1; cu < cols; cu++) {
            int xpx = cu * 4;
            for (int ru = 0; ru < rows; ru++) {
                int cur = txdim[ru * map_stride + cu];
                int prev = txdim[ru * map_stride + cu - 1];
                if (cur == 0 || (xpx % cur) != 0) continue;
                int mn = cur < prev ? cur : prev;
                int length = is_luma
                                 ? (mn >= 16 ? 14 : mn >= 8 ? 8 : 4)
                                 : (mn >= 8 ? 6 : 4);
                int half = length == 14 ? 7 : 4;
                for (int dy = 0; dy < 4; dy++) {
                    uint16_t *p = img + (ru * 4 + dy) * stride + xpx - half;
                    for (int i = 0; i < 2 * half; i++) line[i] = p[i];
                    filter_line(line, half, length, blimit, limit, hev, bd);
                    for (int i = 0; i < 2 * half; i++)
                        p[i] = (uint16_t)line[i];
                }
            }
        }
    } else {
        for (int ru = 1; ru < rows; ru++) {
            int ypx = ru * 4;
            for (int cu = 0; cu < cols; cu++) {
                int cur = txdim[ru * map_stride + cu];
                int prev = txdim[(ru - 1) * map_stride + cu];
                if (cur == 0 || (ypx % cur) != 0) continue;
                int mn = cur < prev ? cur : prev;
                int length = is_luma
                                 ? (mn >= 16 ? 14 : mn >= 8 ? 8 : 4)
                                 : (mn >= 8 ? 6 : 4);
                int half = length == 14 ? 7 : 4;
                for (int dx = 0; dx < 4; dx++) {
                    uint16_t *base = img + (ypx - half) * stride + cu * 4 +
                                     dx;
                    for (int i = 0; i < 2 * half; i++)
                        line[i] = base[i * stride];
                    filter_line(line, half, length, blimit, limit, hev, bd);
                    for (int i = 0; i < 2 * half; i++)
                        base[i * stride] = (uint16_t)line[i];
                }
            }
        }
    }
}

/* Public: apply DLF to an externally-described plane (whole frame).
 * Used by the fast path after all tiles commit. */
void tpud_apply_plane(uint16_t *img, int stride, const uint8_t *txdim,
                      int map_stride, int rows, int cols, int is_luma,
                      int level_v, int level_h, int sharpness, int bd,
                      int w, int h) {
    dlf_plane_pass(img, stride, txdim, map_stride, rows, cols, is_luma,
                   level_v, sharpness, 1, bd, w, h);
    dlf_plane_pass(img, stride, txdim, map_stride, rows, cols, is_luma,
                   level_h, sharpness, 0, bd, w, h);
}

/* Encoder level search: copy the plane, filter at `level`, return SSE vs
 * src over [0,rows)x[0,cols) units. The caller owns candidate selection
 * (ref av1_pick_filter_level's bisection; we evaluate a ladder). */
double tpud_try_level(const uint16_t *img, int stride, const uint16_t *src,
                      int sstride, uint16_t *scratch, const uint8_t *txdim,
                      int map_stride, int rows, int cols, int is_luma,
                      int level, int sharpness, int bd, int w, int h) {
    /* the horizontal pass reads up to 3 rows below the last unit row —
     * copy extra rows so the trial sees the same pixels as the apply;
     * the SSE itself covers only the frame area */
    int copy_rows = rows * 4 + 8;
    int hh = rows * 4 < h ? rows * 4 : h;
    int ww = cols * 4 < w ? cols * 4 : w;
    for (int y = 0; y < copy_rows; y++)
        memcpy(scratch + y * stride, img + y * stride, sizeof(uint16_t) *
                                                            (size_t)stride);
    tpud_apply_plane(scratch, stride, txdim, map_stride, rows, cols,
                     is_luma, level, level, sharpness, bd, w, h);
    double sse = 0;
    for (int y = 0; y < hh; y++)
        for (int x = 0; x < ww; x++) {
            double d = (double)scratch[y * stride + x] -
                       (double)src[y * sstride + x];
            sse += d * d;
        }
    return sse;
}
