/* Normative CDEF (spec 7.15) + encoder strength trial for the fast path.
 *
 * Mirrors svt_av1_psy_tpu/ops/cdef.py (property-tested bit-exact against
 * dav1d). Reference counterparts: Source/Lib/Codec/cdef.c
 * (svt_aom_cdef_find_dir_c, svt_cdef_filter_block_c), enc_cdef.c
 * (strength search), cdef_process.c (process kernel).
 */
#include <stdlib.h>
#include <string.h>

#include "tpu_native.h"

#define CDEF_VERY_LARGE 0x7F7F

static const int DIRS[8][2][2] = {
    {{-1, 1}, {-2, 2}}, {{0, 1}, {-1, 2}}, {{0, 1}, {0, 2}},
    {{0, 1}, {1, 2}},   {{1, 1}, {2, 2}},  {{1, 0}, {2, 1}},
    {{1, 0}, {2, 0}},   {{1, 0}, {2, -1}}};
static const int PRI_TAPS[2][2] = {{4, 2}, {3, 3}};
static const int SEC_TAPS[2][2] = {{2, 1}, {2, 1}};
static const int DIV_TABLE[9] = {0, 840, 420, 280, 210, 168, 140, 120, 105};

static int find_dir(const int32_t *buf, int stride, int coeff_shift,
                    int *var_out) {
    long partial[8][15];
    memset(partial, 0, sizeof(partial));
    for (int i = 0; i < 8; i++)
        for (int j = 0; j < 8; j++) {
            long x = (buf[i * stride + j] >> coeff_shift) - 128;
            partial[0][i + j] += x;
            partial[1][i + j / 2] += x;
            partial[2][i] += x;
            partial[3][3 + i - j / 2] += x;
            partial[4][7 + i - j] += x;
            partial[5][3 - i / 2 + j] += x;
            partial[6][j] += x;
            partial[7][i / 2 + j] += x;
        }
    long cost[8];
    memset(cost, 0, sizeof(cost));
    for (int d = 2; d <= 6; d += 4)
        for (int k = 0; k < 8; k++)
            cost[d] += partial[d][k] * partial[d][k] * DIV_TABLE[8];
    for (int d = 0; d <= 4; d += 4) {
        for (int k = 0; k < 7; k++)
            cost[d] += (partial[d][k] * partial[d][k] +
                        partial[d][14 - k] * partial[d][14 - k]) *
                       DIV_TABLE[k + 1];
        cost[d] += partial[d][7] * partial[d][7] * DIV_TABLE[8];
    }
    for (int d = 1; d < 8; d += 2) {
        for (int k = 3; k < 8; k++)
            cost[d] += partial[d][k] * partial[d][k] * DIV_TABLE[8];
        for (int k = 0; k < 3; k++)
            cost[d] += (partial[d][k] * partial[d][k] +
                        partial[d][10 - k] * partial[d][10 - k]) *
                       DIV_TABLE[2 * k + 2];
    }
    int best = 0;
    long bc = 0;
    for (int d = 0; d < 8; d++)
        if (cost[d] > bc) {
            bc = cost[d];
            best = d;
        }
    *var_out = (int)((bc - cost[(best + 4) & 7]) >> 10);
    return best;
}

static int constrain(int diff, int strength, int damping) {
    if (!strength) return 0;
    int bl = 0, s2 = strength;
    while (s2 > 1) {
        s2 >>= 1;
        bl++;
    }
    int shift = damping - bl;
    if (shift < 0) shift = 0;
    int ad = diff < 0 ? -diff : diff;
    int m = strength - (ad >> shift);
    if (m < 0) m = 0;
    int v = ad < m ? ad : m;
    return diff < 0 ? -v : v;
}

static int adjust_strength(int strength, int var) {
    if (var == 0) return 0;
    int v6 = var >> 6;
    int i = 0;
    if (v6) {
        /* i = min(bit_length(v6) - 1, 12) */
        while ((1 << (i + 1)) <= v6 && i < 12) i++;
    }
    return (strength * (4 + i) + 8) >> 4;
}

static void filter_block(const int32_t *buf, int stride, int y0, int x0,
                         int n, int pri, int sec, int dir, int pd, int sd,
                         int coeff_shift, int32_t *out) {
    int taps_i = (pri >> coeff_shift) & 1;
    const int *pt = PRI_TAPS[taps_i];
    const int *st = SEC_TAPS[taps_i];
    for (int i = 0; i < n; i++)
        for (int j = 0; j < n; j++) {
            int x = buf[(y0 + i) * stride + x0 + j];
            int sm = 0, mx = x, mn = x;
            for (int k = 0; k < 2; k++)
                for (int sgn = 1; sgn >= -1; sgn -= 2) {
                    int dy = sgn * DIRS[dir][k][0];
                    int dx = sgn * DIRS[dir][k][1];
                    int p = buf[(y0 + i + dy) * stride + x0 + j + dx];
                    sm += pt[k] * constrain(p - x, pri, pd);
                    if (p != CDEF_VERY_LARGE && p > mx) mx = p;
                    if (p < mn) mn = p;
                    for (int dd = 2; dd >= -2; dd -= 4) {
                        int d2 = ((dir + dd) % 8 + 8) % 8;
                        int dy2 = sgn * DIRS[d2][k][0];
                        int dx2 = sgn * DIRS[d2][k][1];
                        int s = buf[(y0 + i + dy2) * stride + x0 + j + dx2];
                        sm += st[k] * constrain(s - x, sec, sd);
                        if (s != CDEF_VERY_LARGE && s > mx) mx = s;
                        if (s < mn) mn = s;
                    }
                }
            int y = x + ((8 + sm - (sm < 0)) >> 4);
            if (y < mn) y = mn;
            if (y > mx) y = mx;
            out[i * n + j] = y;
        }
}

/* CDEF over the whole frame.
 * planes/srcs: uint16 (recon post-DLF / original source) with strides.
 * skip: per-4x4 uint8 skip flags (mi_rows x mi_cols, skip_stride).
 * apply: 1 = write filtered recon in place; 0 = accumulate SSE only.
 * sample: evaluate every `sample`th listed block (search speedup).
 * sse_out[0] = luma SSE, sse_out[1] = chroma SSE (filtered blocks only).
 */
void tpue_cdef(uint16_t *py, int ys, uint16_t *pu, uint16_t *pv, int cs,
               const uint16_t *iny, const uint16_t *inu,
               const uint16_t *inv,
               const uint16_t *sy, int sys, const uint16_t *su,
               const uint16_t *sv, int scs, const uint8_t *skip,
               int mi_rows, int mi_cols, int skip_stride, int w, int h,
               int bd, int damping, int y_pri, int y_sec, int uv_pri,
               int uv_sec, int apply, int sample, int fbr0, int fbr1,
               double *sse_out) {
    int coeff_shift = bd > 8 ? bd - 8 : 0;
    int gw = mi_cols * 4, gh = mi_rows * 4;
    int cw = (w + 1) >> 1, chh = (h + 1) >> 1;
    int cgw = gw >> 1, cgh = gh >> 1;
    int bs = gw + 12;
    int cbs = cgw + 12;
    int32_t *by = malloc(sizeof(int32_t) * (gh + 12) * bs);
    int32_t *bu = malloc(sizeof(int32_t) * (cgh + 12) * cbs);
    int32_t *bv = malloc(sizeof(int32_t) * (cgh + 12) * cbs);
    for (long i = 0; i < (long)(gh + 12) * bs; i++) by[i] = CDEF_VERY_LARGE;
    for (long i = 0; i < (long)(cgh + 12) * cbs; i++)
        bu[i] = bv[i] = CDEF_VERY_LARGE;
    /* filter input: the immutable pre-CDEF copy (bands write planes
     * concurrently; CDEF input must stay pre-CDEF everywhere). The
     * CDEF availability boundary is the MI AREA (spec 7.15: MiCols*4
     * px), so mi columns past an odd display width are real pixels. */
    for (int y = 0; y < gh; y++)
        for (int x = 0; x < gw; x++)
            by[(y + 2) * bs + x + 2] = iny[y * ys + x];
    for (int y = 0; y < cgh; y++)
        for (int x = 0; x < cgw; x++) {
            bu[(y + 2) * cbs + x + 2] = inu[y * cs + x];
            bv[(y + 2) * cbs + x + 2] = inv[y * cs + x];
        }
    double sseY = 0, sseC = 0;
    int n64r = (mi_rows + 15) / 16, n64c = (mi_cols + 15) / 16;
    if (fbr1 <= 0 || fbr1 > n64r) fbr1 = n64r;
    if (fbr0 < 0) fbr0 = 0;
    int32_t outb[64];
    long bcount = 0;
    for (int fbr = fbr0; fbr < fbr1; fbr++)
        for (int fbc = 0; fbc < n64c; fbc++) {
            int r0 = fbr * 16, c0 = fbc * 16;
            int maxr = mi_rows - r0 < 16 ? mi_rows - r0 : 16;
            int maxc = mi_cols - c0 < 16 ? mi_cols - c0 : 16;
            for (int r = 0; r < maxr; r += 2)
                for (int c = 0; c < maxc; c += 2) {
                    int all_skip = 1;
                    for (int i = 0; i < 2 && all_skip; i++)
                        for (int j = 0; j < 2; j++)
                            if (r0 + r + i < mi_rows &&
                                c0 + c + j < mi_cols &&
                                !skip[(r0 + r + i) * skip_stride + c0 + c +
                                      j]) {
                                all_skip = 0;
                                break;
                            }
                    if (all_skip) continue;
                    if (sample > 1 && (bcount++ % sample)) continue;
                    int y0 = (r0 + r) * 4, x0 = (c0 + c) * 4;
                    int var, dir = find_dir(by + (2 + y0) * bs + 2 + x0, bs,
                                            coeff_shift, &var);
                    /* luma */
                    if (y_pri || y_sec) {
                        int t = adjust_strength(y_pri << coeff_shift, var);
                        int pd = damping + coeff_shift;
                        filter_block(by, bs, 2 + y0, 2 + x0, 8, t,
                                     y_sec << coeff_shift,
                                     (y_pri << coeff_shift) ? dir : 0, pd,
                                     pd, coeff_shift, outb);
                        /* write the full MI-AREA extent (the upscaler /
                         * later stages read mi columns past an odd
                         * display width); SSE only over display pixels */
                        int ny = gh - y0 < 8 ? gh - y0 : 8;
                        int nx = gw - x0 < 8 ? gw - x0 : 8;
                        for (int i = 0; i < ny; i++)
                            for (int j = 0; j < nx; j++) {
                                if (apply)
                                    py[(y0 + i) * ys + x0 + j] =
                                        (uint16_t)outb[i * 8 + j];
                                if (y0 + i < h && x0 + j < w) {
                                    double d = (double)outb[i * 8 + j] -
                                               sy[(y0 + i) * sys + x0 + j];
                                    sseY += d * d;
                                }
                            }
                    } else if (!apply) {
                        int ny = h - y0 < 8 ? h - y0 : 8;
                        int nx = w - x0 < 8 ? w - x0 : 8;
                        for (int i = 0; i < ny; i++)
                            for (int j = 0; j < nx; j++) {
                                double d = (double)iny[(y0 + i) * ys + x0 +
                                                       j] -
                                           sy[(y0 + i) * sys + x0 + j];
                                sseY += d * d;
                            }
                    }
                    /* chroma (4x4, co-located luma direction) */
                    if (uv_pri || uv_sec) {
                        int cy0 = y0 >> 1, cx0 = x0 >> 1;
                        int pd = damping + coeff_shift - 1;
                        for (int pl = 0; pl < 2; pl++) {
                            int32_t *b2 = pl ? bv : bu;
                            uint16_t *p2 = pl ? pv : pu;
                            const uint16_t *s2 = pl ? sv : su;
                            filter_block(b2, cbs, 2 + cy0, 2 + cx0, 4,
                                         uv_pri << coeff_shift,
                                         uv_sec << coeff_shift,
                                         (uv_pri << coeff_shift) ? dir : 0,
                                         pd, pd, coeff_shift, outb);
                            int ny = cgh - cy0 < 4 ? cgh - cy0 : 4;
                            int nx = cgw - cx0 < 4 ? cgw - cx0 : 4;
                            for (int i = 0; i < ny; i++)
                                for (int j = 0; j < nx; j++) {
                                    if (apply)
                                        p2[(cy0 + i) * cs + cx0 + j] =
                                            (uint16_t)outb[i * 4 + j];
                                    if (cy0 + i < chh && cx0 + j < cw) {
                                        double d = (double)outb[i * 4 + j] -
                                                   s2[(cy0 + i) * scs +
                                                      cx0 + j];
                                        sseC += d * d;
                                    }
                                }
                        }
                    } else if (!apply) {
                        int cy0 = y0 >> 1, cx0 = x0 >> 1;
                        for (int pl = 0; pl < 2; pl++) {
                            const uint16_t *p2 = pl ? inv : inu;
                            const uint16_t *s2 = pl ? sv : su;
                            int ny = chh - cy0 < 4 ? chh - cy0 : 4;
                            int nx = cw - cx0 < 4 ? cw - cx0 : 4;
                            for (int i = 0; i < ny; i++)
                                for (int j = 0; j < nx; j++) {
                                    double d = (double)p2[(cy0 + i) * cs +
                                                          cx0 + j] -
                                               s2[(cy0 + i) * scs + cx0 +
                                                  j];
                                    sseC += d * d;
                                }
                        }
                    }
                }
        }
    free(by);
    free(bu);
    free(bv);
    sse_out[0] = sseY;
    sse_out[1] = sseC;
}

/* ---- per-64x64-unit strength search + per-unit apply (cdef_bits > 0) ----
 * Reference: enc_cdef.c cdef search (per-fb mse over candidate strengths,
 * joint list selection done by the Python caller). One padded-buffer
 * setup serves all candidates; per 8x8 block the direction is computed
 * once and every candidate filter runs against it. */

static int32_t *cdef_pad(const uint16_t *in, int stride, int w, int h,
                         int gw, int gh, int *bs_out) {
    int bs = gw + 12;
    int32_t *b = malloc(sizeof(int32_t) * (gh + 12) * bs);
    for (long i = 0; i < (long)(gh + 12) * bs; i++) b[i] = CDEF_VERY_LARGE;
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) b[(y + 2) * bs + x + 2] = in[y * stride + x];
    *bs_out = bs;
    return b;
}

void tpue_cdef_unit_sse(const uint16_t *iny, int ys, const uint16_t *inu,
                        const uint16_t *inv, int cs, const uint16_t *sy,
                        int sys, const uint16_t *su, const uint16_t *sv,
                        int scs, const uint8_t *skip, int mi_rows,
                        int mi_cols, int skip_stride, int w, int h, int bd,
                        int damping, const int *ycand, int ky,
                        const int *ccand, int kc, int sample, int fbr0,
                        int fbr1, double *ssey_out, double *ssec_out,
                        uint8_t *has_out) {
    int coeff_shift = bd > 8 ? bd - 8 : 0;
    int gw = mi_cols * 4, gh = mi_rows * 4;
    int cw = (w + 1) >> 1, chh = (h + 1) >> 1;
    int bs, cbs;
    /* pad from the full MI AREA (spec 7.15 boundary), not the display
     * size — see cdef_run */
    int32_t *by = cdef_pad(iny, ys, gw, gh, gw, gh, &bs);
    int32_t *bu = cdef_pad(inu, cs, gw >> 1, gh >> 1, gw >> 1, gh >> 1,
                           &cbs);
    int32_t *bv = cdef_pad(inv, cs, gw >> 1, gh >> 1, gw >> 1, gh >> 1,
                           &cbs);
    int n64r = (mi_rows + 15) / 16, n64c = (mi_cols + 15) / 16;
    if (fbr1 <= 0 || fbr1 > n64r) fbr1 = n64r;
    if (fbr0 < 0) fbr0 = 0;
    int32_t outb[64];
    long bcount = 0;
    for (int fbr = fbr0; fbr < fbr1; fbr++)
        for (int fbc = 0; fbc < n64c; fbc++) {
            int unit = fbr * n64c + fbc;
            double *uy = ssey_out + (long)unit * ky;
            double *uc = ssec_out + (long)unit * kc;
            int r0 = fbr * 16, c0 = fbc * 16;
            int maxr = mi_rows - r0 < 16 ? mi_rows - r0 : 16;
            int maxc = mi_cols - c0 < 16 ? mi_cols - c0 : 16;
            for (int r = 0; r < maxr; r += 2)
                for (int c = 0; c < maxc; c += 2) {
                    int all_skip = 1;
                    for (int i = 0; i < 2 && all_skip; i++)
                        for (int j = 0; j < 2; j++)
                            if (r0 + r + i < mi_rows &&
                                c0 + c + j < mi_cols &&
                                !skip[(r0 + r + i) * skip_stride + c0 + c + j]) {
                                all_skip = 0;
                                break;
                            }
                    if (all_skip) continue;
                    has_out[unit] = 1;
                    if (sample > 1 && (bcount++ % sample)) continue;
                    int y0 = (r0 + r) * 4, x0 = (c0 + c) * 4;
                    int var, dir = find_dir(by + (2 + y0) * bs + 2 + x0, bs,
                                            coeff_shift, &var);
                    int ny = h - y0 < 8 ? h - y0 : 8;
                    int nx = w - x0 < 8 ? w - x0 : 8;
                    for (int k = 0; k < ky; k++) {
                        int pri = ycand[2 * k], sec = ycand[2 * k + 1];
                        double acc = 0;
                        if (pri || sec) {
                            int t = adjust_strength(pri << coeff_shift, var);
                            int pd = damping + coeff_shift;
                            filter_block(by, bs, 2 + y0, 2 + x0, 8, t,
                                         sec << coeff_shift,
                                         (pri << coeff_shift) ? dir : 0, pd,
                                         pd, coeff_shift, outb);
                            for (int i = 0; i < ny; i++)
                                for (int j = 0; j < nx; j++) {
                                    double d = (double)outb[i * 8 + j] -
                                               sy[(y0 + i) * sys + x0 + j];
                                    acc += d * d;
                                }
                        } else {
                            for (int i = 0; i < ny; i++)
                                for (int j = 0; j < nx; j++) {
                                    double d = (double)iny[(y0 + i) * ys +
                                                           x0 + j] -
                                               sy[(y0 + i) * sys + x0 + j];
                                    acc += d * d;
                                }
                        }
                        uy[k] += acc;
                    }
                    int cy0 = y0 >> 1, cx0 = x0 >> 1;
                    int cny = chh - cy0 < 4 ? chh - cy0 : 4;
                    int cnx = cw - cx0 < 4 ? cw - cx0 : 4;
                    for (int k = 0; k < kc; k++) {
                        int pri = ccand[2 * k], sec = ccand[2 * k + 1];
                        double acc = 0;
                        for (int pl = 0; pl < 2; pl++) {
                            int32_t *b2 = pl ? bv : bu;
                            const uint16_t *in2 = pl ? inv : inu;
                            const uint16_t *s2 = pl ? sv : su;
                            if (pri || sec) {
                                int pd = damping + coeff_shift - 1;
                                filter_block(b2, cbs, 2 + cy0, 2 + cx0, 4,
                                             pri << coeff_shift,
                                             sec << coeff_shift,
                                             (pri << coeff_shift) ? dir : 0,
                                             pd, pd, coeff_shift, outb);
                                for (int i = 0; i < cny; i++)
                                    for (int j = 0; j < cnx; j++) {
                                        double d = (double)outb[i * 4 + j] -
                                                   s2[(cy0 + i) * scs + cx0 + j];
                                        acc += d * d;
                                    }
                            } else {
                                for (int i = 0; i < cny; i++)
                                    for (int j = 0; j < cnx; j++) {
                                        double d = (double)in2[(cy0 + i) * cs +
                                                               cx0 + j] -
                                                   s2[(cy0 + i) * scs + cx0 + j];
                                        acc += d * d;
                                    }
                            }
                        }
                        uc[k] += acc;
                    }
                }
        }
    free(by);
    free(bu);
    free(bv);
}

/* Apply per-64x64 strengths selected by idx_map into the signalled
 * quadruple lists (ylist/clist are [2*nb] pri,sec pairs). */
void tpue_cdef_apply_idx(uint16_t *py, int ys, uint16_t *pu, uint16_t *pv,
                         int cs, const uint16_t *iny, const uint16_t *inu,
                         const uint16_t *inv, const uint8_t *skip,
                         int mi_rows, int mi_cols, int skip_stride, int w,
                         int h, int bd, int damping, const int *ylist,
                         const int *clist, const uint8_t *idx_map,
                         int fbr0, int fbr1) {
    int coeff_shift = bd > 8 ? bd - 8 : 0;
    int gw = mi_cols * 4, gh = mi_rows * 4;
    int cw = (w + 1) >> 1, chh = (h + 1) >> 1;
    int bs, cbs;
    /* pad from the full MI AREA (spec 7.15 boundary), not the display
     * size — see cdef_run */
    int32_t *by = cdef_pad(iny, ys, gw, gh, gw, gh, &bs);
    int32_t *bu = cdef_pad(inu, cs, gw >> 1, gh >> 1, gw >> 1, gh >> 1,
                           &cbs);
    int32_t *bv = cdef_pad(inv, cs, gw >> 1, gh >> 1, gw >> 1, gh >> 1,
                           &cbs);
    int n64r = (mi_rows + 15) / 16, n64c = (mi_cols + 15) / 16;
    if (fbr1 <= 0 || fbr1 > n64r) fbr1 = n64r;
    if (fbr0 < 0) fbr0 = 0;
    int32_t outb[64];
    for (int fbr = fbr0; fbr < fbr1; fbr++)
        for (int fbc = 0; fbc < n64c; fbc++) {
            int idx = idx_map[fbr * n64c + fbc];
            int y_pri = ylist[2 * idx], y_sec = ylist[2 * idx + 1];
            int uv_pri = clist[2 * idx], uv_sec = clist[2 * idx + 1];
            if (!(y_pri | y_sec | uv_pri | uv_sec)) continue;
            int r0 = fbr * 16, c0 = fbc * 16;
            int maxr = mi_rows - r0 < 16 ? mi_rows - r0 : 16;
            int maxc = mi_cols - c0 < 16 ? mi_cols - c0 : 16;
            for (int r = 0; r < maxr; r += 2)
                for (int c = 0; c < maxc; c += 2) {
                    int all_skip = 1;
                    for (int i = 0; i < 2 && all_skip; i++)
                        for (int j = 0; j < 2; j++)
                            if (r0 + r + i < mi_rows &&
                                c0 + c + j < mi_cols &&
                                !skip[(r0 + r + i) * skip_stride + c0 + c + j]) {
                                all_skip = 0;
                                break;
                            }
                    if (all_skip) continue;
                    int y0 = (r0 + r) * 4, x0 = (c0 + c) * 4;
                    int var, dir = find_dir(by + (2 + y0) * bs + 2 + x0, bs,
                                            coeff_shift, &var);
                    if (y_pri || y_sec) {
                        int t = adjust_strength(y_pri << coeff_shift, var);
                        int pd = damping + coeff_shift;
                        filter_block(by, bs, 2 + y0, 2 + x0, 8, t,
                                     y_sec << coeff_shift,
                                     (y_pri << coeff_shift) ? dir : 0, pd,
                                     pd, coeff_shift, outb);
                        int ny = gh - y0 < 8 ? gh - y0 : 8;
                        int nx = gw - x0 < 8 ? gw - x0 : 8;
                        for (int i = 0; i < ny; i++)
                            for (int j = 0; j < nx; j++)
                                py[(y0 + i) * ys + x0 + j] =
                                    (uint16_t)outb[i * 8 + j];
                    }
                    if (uv_pri || uv_sec) {
                        int cy0 = y0 >> 1, cx0 = x0 >> 1;
                        int pd = damping + coeff_shift - 1;
                        for (int pl = 0; pl < 2; pl++) {
                            int32_t *b2 = pl ? bv : bu;
                            uint16_t *p2 = pl ? pv : pu;
                            filter_block(b2, cbs, 2 + cy0, 2 + cx0, 4,
                                         uv_pri << coeff_shift,
                                         uv_sec << coeff_shift,
                                         (uv_pri << coeff_shift) ? dir : 0,
                                         pd, pd, coeff_shift, outb);
                            int ny = (gh >> 1) - cy0 < 4
                                         ? (gh >> 1) - cy0 : 4;
                            int nx = (gw >> 1) - cx0 < 4
                                         ? (gw >> 1) - cx0 : 4;
                            for (int i = 0; i < ny; i++)
                                for (int j = 0; j < nx; j++)
                                    p2[(cy0 + i) * cs + cx0 + j] =
                                        (uint16_t)outb[i * 4 + j];
                        }
                    }
                }
        }
    free(by);
    free(bu);
    free(bv);
}
