/* Inter-frame commit engine: MC prediction, ref-MV stack, MV coding and
 * the P-frame block walk.
 *
 * Ports of the repo's validated Python implementations (behavior pinned by
 * transcode-identity and dav1d bit-exactness tests):
 *   - subpel MC            svt_av1_psy_tpu/ops/mc.py      (spec 7.11.3)
 *   - ref-MV stack         svt_av1_psy_tpu/inter/mvref.py (spec 7.10.2)
 *   - inter syntax         svt_av1_psy_tpu/entropy/tile_writer.py
 * Reference counterparts: Source/Lib/Codec/adaptive_mv_pred.c,
 * inter_prediction.c, entropy_coding.c. Single-ref (LAST) translational
 * path with identity global motion, REGULAR filter, quarter-pel MVs,
 * TX_MODE_LARGEST — the fast low-delay configuration.
 */
#include <stdlib.h>
#include <string.h>

#include "commit_internal.h"

/* phase profiler hooks (commit_backend.c owns the buckets; see
 * native.py _PROF_NAMES: 8 mc_singleref, 9 mc_compound,
 * 10 masked_search, 11 motion_modes) */
int tpuc_prof_enabled(void);
long long tpuc_prof_now(void);
void tpuc_prof_add(int k, long long ns);
#define IPROF_BEGIN long long _ipt = tpuc_prof_enabled() ? tpuc_prof_now() : 0
#define IPROF_RESET (_ipt = tpuc_prof_enabled() ? tpuc_prof_now() : 0)
#define IPROF_MARK(k)                                                  \
    do {                                                               \
        if (_ipt) {                                                    \
            long long _n = tpuc_prof_now();                            \
            tpuc_prof_add(k, _n - _ipt);                               \
            _ipt = _n;                                                 \
        }                                                              \
    } while (0)

static const int TXW[19] = {4, 8, 16, 32, 64, 4, 8, 8, 16, 16,
                            32, 32, 64, 4, 16, 8, 32, 16, 64};
static const int TXH[19] = {4, 8, 16, 32, 64, 8, 4, 16, 8, 32,
                            16, 64, 32, 16, 4, 32, 8, 64, 16};

/* ---- subpel interpolation filters (spec 7.11.3.4) ---------------------- */
static const int16_t F_REG[16][8] = {
    {0, 0, 0, 128, 0, 0, 0, 0},     {0, 2, -6, 126, 8, -2, 0, 0},
    {0, 2, -10, 122, 18, -4, 0, 0}, {0, 2, -12, 116, 28, -8, 2, 0},
    {0, 2, -14, 110, 38, -10, 2, 0}, {0, 2, -14, 102, 48, -12, 2, 0},
    {0, 2, -16, 94, 58, -12, 2, 0}, {0, 2, -14, 84, 66, -12, 2, 0},
    {0, 2, -14, 76, 76, -14, 2, 0}, {0, 2, -12, 66, 84, -14, 2, 0},
    {0, 2, -12, 58, 94, -16, 2, 0}, {0, 2, -12, 48, 102, -14, 2, 0},
    {0, 2, -10, 38, 110, -14, 2, 0}, {0, 2, -8, 28, 116, -12, 2, 0},
    {0, 0, -4, 18, 122, -10, 2, 0}, {0, 0, -2, 8, 126, -6, 2, 0}};
static const int16_t F_REG4[16][8] = {
    {0, 0, 0, 128, 0, 0, 0, 0},    {0, 0, -4, 126, 8, -2, 0, 0},
    {0, 0, -8, 122, 18, -4, 0, 0}, {0, 0, -10, 116, 28, -6, 0, 0},
    {0, 0, -12, 110, 38, -8, 0, 0}, {0, 0, -12, 102, 48, -10, 0, 0},
    {0, 0, -14, 94, 58, -10, 0, 0}, {0, 0, -12, 84, 66, -10, 0, 0},
    {0, 0, -12, 76, 76, -12, 0, 0}, {0, 0, -10, 66, 84, -12, 0, 0},
    {0, 0, -10, 58, 94, -14, 0, 0}, {0, 0, -10, 48, 102, -12, 0, 0},
    {0, 0, -8, 38, 110, -12, 0, 0}, {0, 0, -6, 28, 116, -10, 0, 0},
    {0, 0, -4, 18, 122, -8, 0, 0}, {0, 0, -2, 8, 126, -4, 0, 0}};

static const int16_t F_SMOOTH[16][8] = {
    {0, 0, 0, 128, 0, 0, 0, 0},   {0, 2, 28, 62, 34, 2, 0, 0},
    {0, 0, 26, 62, 36, 4, 0, 0},  {0, 0, 22, 62, 40, 4, 0, 0},
    {0, 0, 20, 60, 42, 6, 0, 0},  {0, 0, 18, 58, 44, 8, 0, 0},
    {0, 0, 16, 56, 46, 10, 0, 0}, {0, -2, 16, 54, 48, 12, 0, 0},
    {0, -2, 14, 52, 52, 14, -2, 0}, {0, 0, 12, 48, 54, 16, -2, 0},
    {0, 0, 10, 46, 56, 16, 0, 0}, {0, 0, 8, 44, 58, 18, 0, 0},
    {0, 0, 6, 42, 60, 20, 0, 0},  {0, 0, 4, 40, 62, 22, 0, 0},
    {0, 0, 4, 36, 62, 26, 0, 0},  {0, 0, 2, 34, 62, 28, 2, 0}};
static const int16_t F_SHARP[16][8] = {
    {0, 0, 0, 128, 0, 0, 0, 0},      {-2, 2, -6, 126, 8, -2, 2, 0},
    {-2, 6, -12, 124, 16, -6, 4, -2}, {-2, 8, -18, 120, 26, -10, 6, -2},
    {-4, 10, -22, 116, 38, -14, 6, -2}, {-4, 10, -22, 108, 48, -18, 8, -2},
    {-4, 10, -24, 100, 60, -20, 8, -2}, {-4, 10, -24, 90, 70, -22, 10, -2},
    {-4, 12, -24, 80, 80, -24, 12, -4}, {-2, 10, -22, 70, 90, -24, 10, -4},
    {-2, 8, -20, 60, 100, -24, 10, -4}, {-2, 8, -18, 48, 108, -22, 10, -4},
    {-2, 6, -14, 38, 116, -22, 10, -4}, {-2, 6, -10, 26, 120, -18, 8, -2},
    {-2, 4, -6, 16, 124, -12, 6, -2}, {0, 2, -2, 8, 126, -6, 2, -2}};
static const int16_t F_SMOOTH4[16][8] = {
    {0, 0, 0, 128, 0, 0, 0, 0},   {0, 0, 30, 62, 34, 2, 0, 0},
    {0, 0, 26, 62, 36, 4, 0, 0},  {0, 0, 22, 62, 40, 4, 0, 0},
    {0, 0, 20, 60, 42, 6, 0, 0},  {0, 0, 18, 58, 44, 8, 0, 0},
    {0, 0, 16, 56, 46, 10, 0, 0}, {0, 0, 14, 54, 48, 12, 0, 0},
    {0, 0, 12, 52, 52, 12, 0, 0}, {0, 0, 12, 48, 54, 14, 0, 0},
    {0, 0, 10, 46, 56, 16, 0, 0}, {0, 0, 8, 44, 58, 18, 0, 0},
    {0, 0, 6, 42, 60, 20, 0, 0},  {0, 0, 4, 40, 62, 22, 0, 0},
    {0, 0, 4, 36, 62, 26, 0, 0},  {0, 0, 2, 34, 62, 30, 0, 0}};

/* spec 7.11.3.4 filter selection: 4-tap variants for dims <= 4
 * (SHARP falls back to the 4-tap REGULAR kernel) */
static const int16_t (*filt_tab(int f, int dim))[8] {
    if (dim <= 4) return f == 1 ? F_SMOOTH4 : F_REG4;
    return f == 1 ? F_SMOOTH : (f == 2 ? F_SHARP : F_REG);
}

#define FILTER_BITS 7
#define ROUND0 3
#define ROUND1 11

static int clampi(int v, int lo, int hi) {
    return v < lo ? lo : v > hi ? hi : v;
}
static int round2(int v, int n) { return (v + (1 << (n - 1))) >> n; }

/* MC one block: ref plane (stride), block at (px, py), w x h, MV in
 * 1/16-pel plane units. out: (h x w) int32. REGULAR filter. */
static void mc_block_f(const uint16_t *ref, int rstride, int rw, int rh,
                       int px, int py, int w, int h, int mvx_q4,
                       int mvy_q4, int bd, int ffx, int ffy,
                       int32_t *out) {
    int x0 = px + (mvx_q4 >> 4);
    int y0 = py + (mvy_q4 >> 4);
    int sx = mvx_q4 & 15, sy = mvy_q4 & 15;
    int hi = (1 << bd) - 1;
#define REFPX(yy, xx) \
    ref[clampi(yy, 0, rh - 1) * rstride + clampi(xx, 0, rw - 1)]
    if (sx == 0 && sy == 0) {
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                out[y * w + x] = REFPX(y0 + y, x0 + x);
        return;
    }
    const int16_t *fx = filt_tab(ffx, w)[sx];
    const int16_t *fy = filt_tab(ffy, h)[sy];
    if (sx && sy) {
        int32_t im[(64 + 7) * 64];
        int offset_bits = bd + 2 * FILTER_BITS - ROUND0;
        for (int y = 0; y < h + 7; y++)
            for (int x = 0; x < w; x++) {
                int acc = 1 << (bd + FILTER_BITS - 1);
                for (int k = 0; k < 8; k++)
                    acc += fx[k] * REFPX(y0 - 3 + y, x0 - 3 + x + k);
                im[y * w + x] = round2(acc, ROUND0);
            }
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int acc = 1 << offset_bits;
                for (int k = 0; k < 8; k++)
                    acc += fy[k] * im[(y + k) * w + x];
                int res = round2(acc, ROUND1) -
                          ((1 << (offset_bits - ROUND1)) +
                           (1 << (offset_bits - ROUND1 - 1)));
                int bits = 2 * FILTER_BITS - ROUND0 - ROUND1;
                if (bits > 0) res = round2(res, bits);
                out[y * w + x] = clampi(res, 0, hi);
            }
        return;
    }
    if (sx) {
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int acc = 0;
                for (int k = 0; k < 8; k++)
                    acc += fx[k] * REFPX(y0 + y, x0 - 3 + x + k);
                acc = round2(acc, ROUND0);
                out[y * w + x] = clampi(round2(acc, FILTER_BITS - ROUND0),
                                        0, hi);
            }
        return;
    }
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
            int acc = 0;
            for (int k = 0; k < 8; k++)
                acc += fy[k] * REFPX(y0 - 3 + y + k, x0 + x);
            out[y * w + x] = clampi(round2(acc, FILTER_BITS), 0, hi);
        }
#undef REFPX
}

/* One compound prediction component at CONV_BUF precision (incl. the
 * round_offset; ref inter_prediction.c svt_av1_jnt_convolve_*_c).
 * round_0 = 3, round_1 = COMPOUND_ROUND1 = 7. */
#define CROUND1 7
void tpui_mc_block(const uint16_t *ref, int rstride, int rw, int rh,
                   int px, int py, int w, int h, int mvx_q4, int mvy_q4,
                   int bd, int32_t *out) {
    mc_block_f(ref, rstride, rw, rh, px, py, w, h, mvx_q4, mvy_q4, bd, 0,
               0, out);
}

static void mc_comp_part(const uint16_t *ref, int rstride, int rw, int rh,
                         int px, int py, int w, int h, int mvx_q4,
                         int mvy_q4, int bd, int32_t *out) {
    int x0 = px + (mvx_q4 >> 4);
    int y0 = py + (mvy_q4 >> 4);
    int sx = mvx_q4 & 15, sy = mvy_q4 & 15;
    int offset_bits = bd + 2 * FILTER_BITS - ROUND0;
    int round_offset = (1 << (offset_bits - CROUND1)) +
                       (1 << (offset_bits - CROUND1 - 1));
#define REFPX(yy, xx) \
    ref[clampi(yy, 0, rh - 1) * rstride + clampi(xx, 0, rw - 1)]
    if (sx == 0 && sy == 0) {
        int bits = 2 * FILTER_BITS - ROUND0 - CROUND1;
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                out[y * w + x] = (REFPX(y0 + y, x0 + x) << bits) +
                                 round_offset;
        return;
    }
    const int16_t *fx = filt_tab(0, w)[sx];
    const int16_t *fy = filt_tab(0, h)[sy];
    if (sx && sy) {
        int32_t im[(64 + 7) * 64];
        for (int y = 0; y < h + 7; y++)
            for (int x = 0; x < w; x++) {
                int acc = 1 << (bd + FILTER_BITS - 1);
                for (int k = 0; k < 8; k++)
                    acc += fx[k] * REFPX(y0 - 3 + y, x0 - 3 + x + k);
                im[y * w + x] = round2(acc, ROUND0);
            }
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int acc = 1 << offset_bits;
                for (int k = 0; k < 8; k++)
                    acc += fy[k] * im[(y + k) * w + x];
                out[y * w + x] = round2(acc, CROUND1);
            }
        return;
    }
    if (sx) {
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int acc = 0;
                for (int k = 0; k < 8; k++)
                    acc += fx[k] * REFPX(y0 + y, x0 - 3 + x + k);
                acc = round2(acc, ROUND0) << (FILTER_BITS - CROUND1);
                out[y * w + x] = acc + round_offset;
            }
        return;
    }
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
            int acc = 0;
            for (int k = 0; k < 8; k++)
                acc += fy[k] * REFPX(y0 - 3 + y + k, x0 + x);
            acc <<= FILTER_BITS - ROUND0;
            out[y * w + x] = round2(acc, CROUND1) + round_offset;
        }
#undef REFPX
}

/* Average blend of two CONV_BUF components + final rounding. */
static void blend_comp_avg(const int32_t *p0, const int32_t *p1, int n,
                           int bd, int32_t *out) {
    int offset_bits = bd + 2 * FILTER_BITS - ROUND0;
    int round_bits = 2 * FILTER_BITS - ROUND0 - CROUND1;
    int sub = (1 << (offset_bits - CROUND1)) +
              (1 << (offset_bits - CROUND1 - 1));
    int hi = (1 << bd) - 1;
    for (int i = 0; i < n; i++) {
        int tmp = ((p0[i] + p1[i]) >> 1) - sub;
        out[i] = clampi(round2(tmp, round_bits), 0, hi);
    }
}

/* ---- masked compound (spec 7.11.3.11-14; twin of inter/masks.py) ------- */
/* wedge mask tables uploaded from python (inter/masks.py get_wedge_mask):
 * index 0/1/2 = 8x8 / 16x16 / 32x32 (bsize 3/6/9) x 16 idx x 2 signs */
static uint8_t WEDGE_TAB[3][16][2][32 * 32];
static const int WEDGE_N[3] = {8, 16, 32};

void tpuc_upload_wedge(int which, const int32_t *masks, int n) {
    for (int i = 0; i < 16; i++)
        for (int s = 0; s < 2; s++)
            for (int k = 0; k < n * n; k++)
                WEDGE_TAB[which][i][s][k] =
                    (uint8_t)masks[(i * 2 + s) * n * n + k];
}

static int wedge_tab_of(int bsize) {
    return bsize == 3 ? 0 : bsize == 6 ? 1 : bsize == 9 ? 2 : -1;
}

/* smooth inter-intra masks (spec 7.11.3.13 ii_weights1d expansion),
 * uploaded from inter/masks.py smooth_interintra_mask:
 * [mode II_DC/V/H/SMOOTH][size 4/8/16/32 -> idx log2-2] */
static uint8_t II_TAB[4][4][32 * 32];

void tpuc_upload_ii(int mode, int size_idx, const int32_t *mask, int n) {
    for (int k = 0; k < n * n; k++)
        II_TAB[mode][size_idx][k] = (uint8_t)mask[k];
}

/* pixel-domain a64 blend: out = (m*intra + (64-m)*inter + 32) >> 6
 * (ref svt_aom_blend_a64_mask; twin of inter/masks.py blend_a64) */
static void blend_ii(const uint8_t *mask, const int32_t *intra,
                     const int32_t *inter, int n, int32_t *out) {
    for (int i = 0; i < n; i++)
        out[i] = (mask[i] * intra[i] + (64 - mask[i]) * inter[i] + 32) >> 6;
}

/* masked blend of two CONV_BUF components + final compound rounding
 * (ref svt_aom_lowbd/highbd_blend_a64_d16_mask) */
static void blend_masked_d16_c(const uint8_t *mask, const int32_t *p0,
                               const int32_t *p1, int n, int bd,
                               int32_t *out) {
    int offset_bits = bd + 2 * FILTER_BITS - ROUND0;
    int round_offset = (1 << (offset_bits - CROUND1)) +
                       (1 << (offset_bits - CROUND1 - 1));
    int round_bits = 2 * FILTER_BITS - ROUND0 - CROUND1;
    int hi = (1 << bd) - 1;
    for (int i = 0; i < n; i++) {
        int m = mask[i];
        int res = (int)(((int64_t)m * p0[i] + (64 - m) * (int64_t)p1[i]) >>
                        6) - round_offset;
        out[i] = clampi(round2(res, round_bits), 0, hi);
    }
}

/* DIFFWTD_38 / DIFFWTD_38_INV from CONV_BUF preds (ref diffwtd_mask_d16) */
static void diffwtd_mask_d16_c(const int32_t *p0, const int32_t *p1,
                               int n, int mask_type, int bd, uint8_t *m) {
    int rnd = 2 * FILTER_BITS - ROUND0 - CROUND1 + (bd - 8);
    for (int i = 0; i < n; i++) {
        int d = p0[i] - p1[i];
        if (d < 0) d = -d;
        d = round2(d, rnd);
        int v = 38 + d / 16;
        if (v > 64) v = 64;
        m[i] = (uint8_t)(mask_type ? 64 - v : v);
    }
}

/* blend_a64 mask 2x subsampling for the chroma planes */
static void subsample_mask2_c(const uint8_t *m, int w, int h,
                              uint8_t *out) {
    for (int y = 0; y < h / 2; y++)
        for (int x = 0; x < w / 2; x++)
            out[y * (w / 2) + x] =
                (uint8_t)((m[(2 * y) * w + 2 * x] +
                           m[(2 * y) * w + 2 * x + 1] +
                           m[(2 * y + 1) * w + 2 * x] +
                           m[(2 * y + 1) * w + 2 * x + 1] + 2) >> 2);
}

/* ---- per-unit mode-info grid (MiGrid port) ----------------------------- */
struct InterGrid {
    int mi_rows, mi_cols;
    int8_t *ref0;
    int8_t *ref1;     /* second ref (compound) or -1 */
    int16_t *mv;      /* (row, col) pairs, 1/8 px */
    int16_t *mv1;     /* compound second-component MV pairs */
    uint8_t *newmv;
    uint8_t *bsize;
    uint8_t *filt;    /* interp filter (both dirs; dual_filter off) */
    uint8_t *comp_group;  /* comp_group_idx per mi (masked-compound ctx) */
    uint8_t *gmv;     /* >=8x8 block coded GLOBALMV (spec 7.10.2.7) */
};

InterGrid *tpui_grid_new(int mi_rows, int mi_cols) {
    InterGrid *g = calloc(1, sizeof(InterGrid));
    g->mi_rows = mi_rows;
    g->mi_cols = mi_cols;
    size_t n = (size_t)mi_rows * mi_cols;
    g->ref0 = malloc(n);
    memset(g->ref0, -1, n);
    g->ref1 = malloc(n);
    memset(g->ref1, -1, n);
    g->mv = calloc(n * 2, 2);
    g->mv1 = calloc(n * 2, 2);
    g->newmv = calloc(n, 1);
    g->bsize = calloc(n, 1);
    g->filt = calloc(n, 1);
    g->comp_group = calloc(n, 1);
    g->gmv = calloc(n, 1);
    return g;
}
void tpui_grid_free(InterGrid *g) {
    if (!g) return;
    free(g->ref0);
    free(g->ref1);
    free(g->mv);
    free(g->mv1);
    free(g->newmv);
    free(g->bsize);
    free(g->filt);
    free(g->comp_group);
    free(g->gmv);
    free(g);
}
/* mark a block's mi area as GLOBALMV-coded (>= 8x8 only; spec 7.10.2.7
 * candidate substitution under non-translational gm) */
void tpui_grid_set_gmv(InterGrid *g, int r, int c, int h4, int w4, int v) {
    int rr1 = r + h4 < g->mi_rows ? r + h4 : g->mi_rows;
    int cc1 = c + w4 < g->mi_cols ? c + w4 : g->mi_cols;
    for (int i = r; i < rr1; i++)
        for (int j = c; j < cc1; j++)
            g->gmv[(size_t)i * g->mi_cols + j] = (uint8_t)v;
}
/* mark a block's mi area as inter-intra: RefFrame[1] = INTRA_FRAME (0),
 * which EXCLUDES it from warp-sample collection (libaom av1_find_samples
 * requires ref1 == NONE) — the decoder-side grid does the same */
void tpui_grid_mark_ii(InterGrid *g, int r, int c, int h4, int w4) {
    int rr1 = r + h4 < g->mi_rows ? r + h4 : g->mi_rows;
    int cc1 = c + w4 < g->mi_cols ? c + w4 : g->mi_cols;
    for (int i = r; i < rr1; i++)
        for (int j = c; j < cc1; j++)
            g->ref1[(size_t)i * g->mi_cols + j] = 0;
}

void tpui_grid_set(InterGrid *g, int r, int c, int h4, int w4, int bsize,
                   int ref0, int mvr, int mvc, int has_newmv) {
    int rr1 = r + h4 < g->mi_rows ? r + h4 : g->mi_rows;
    int cc1 = c + w4 < g->mi_cols ? c + w4 : g->mi_cols;
    for (int i = r; i < rr1; i++)
        for (int j = c; j < cc1; j++) {
            size_t o = (size_t)i * g->mi_cols + j;
            g->ref0[o] = (int8_t)ref0;
            g->ref1[o] = -1;
            g->mv[o * 2] = (int16_t)mvr;
            g->mv[o * 2 + 1] = (int16_t)mvc;
            g->newmv[o] = (uint8_t)has_newmv;
            g->bsize[o] = (uint8_t)bsize;
        }
}
void tpui_grid_set_comp(InterGrid *g, int r, int c, int h4, int w4,
                        int bsize, int ref0, int ref1, int mv0r, int mv0c,
                        int mv1r, int mv1c, int has_newmv,
                        int comp_group) {
    int rr1 = r + h4 < g->mi_rows ? r + h4 : g->mi_rows;
    int cc1 = c + w4 < g->mi_cols ? c + w4 : g->mi_cols;
    for (int i = r; i < rr1; i++)
        for (int j = c; j < cc1; j++) {
            size_t o = (size_t)i * g->mi_cols + j;
            g->ref0[o] = (int8_t)ref0;
            g->ref1[o] = (int8_t)ref1;
            g->mv[o * 2] = (int16_t)mv0r;
            g->mv[o * 2 + 1] = (int16_t)mv0c;
            g->mv1[o * 2] = (int16_t)mv1r;
            g->mv1[o * 2 + 1] = (int16_t)mv1c;
            g->newmv[o] = (uint8_t)has_newmv;
            g->bsize[o] = (uint8_t)bsize;
            g->comp_group[o] = (uint8_t)comp_group;
        }
}

/* get_comp_group_idx_context (libaom pred_common.h analog; twin of
 * tile_parser._comp_group_idx_ctx) */
static int comp_group_ctx_c(TpuCommit *c, int r, int c4) {
    InterGrid *g = c->grid;
    int above_ctx = 0, left_ctx = 0;
    if (r > c->t_mi_row0) {
        size_t o = (size_t)(r - 1) * g->mi_cols + c4;
        if (g->ref1[o] > 0)
            above_ctx = g->comp_group[o];
        else if (g->ref0[o] == 7)
            above_ctx = 3;
    }
    if (c4 > c->t_mi_col0) {
        size_t o = (size_t)r * g->mi_cols + c4 - 1;
        if (g->ref1[o] > 0)
            left_ctx = g->comp_group[o];
        else if (g->ref0[o] == 7)
            left_ctx = 3;
    }
    int v = above_ctx + left_ctx;
    return v < 5 ? v : 5;
}

/* block dims in 4px units per bsize enum (square + rect subset) */
static const int BW4[22] = {1, 1, 2, 2, 2, 4, 4, 4, 8, 8, 8,
                            16, 16, 16, 32, 32, 1, 4, 2, 8, 4, 16};
static const int BH4[22] = {1, 2, 1, 2, 4, 2, 4, 8, 4, 8, 16,
                            8, 16, 32, 16, 32, 4, 1, 8, 2, 16, 4};

/* ---- OBMC (spec 7.11.3.9/7.11.3.10; twin of decoder/reconstruct.py
 * _apply_obmc + tile_parser.py _collect_obmc) --------------------------- */
static const uint8_t OBMC_M2[2] = {45, 64};
static const uint8_t OBMC_M4[4] = {39, 50, 59, 64};
static const uint8_t OBMC_M8[8] = {36, 42, 48, 53, 57, 61, 64, 64};
static const uint8_t OBMC_M16[16] = {34, 37, 40, 43, 46, 49, 52, 54,
                                     56, 58, 60, 61, 64, 64, 64, 64};
static const uint8_t OBMC_M32[32] = {33, 35, 36, 38, 40, 41, 43, 44,
                                     45, 47, 48, 50, 51, 52, 53, 55,
                                     56, 57, 58, 59, 60, 60, 61, 62,
                                     64, 64, 64, 64, 64, 64, 64, 64};

static const uint8_t *obmc_mask(int len) {
    switch (len) {
    case 2: return OBMC_M2;
    case 4: return OBMC_M4;
    case 8: return OBMC_M8;
    case 16: return OBMC_M16;
    default: return OBMC_M32;
    }
}

/* has_overlappable_candidates (spec 5.11.27): odd mi positions only */
static int has_overlappable_c(TpuCommit *c, int r, int c4, int w4,
                              int h4) {
    InterGrid *g = c->grid;
    if (r > c->t_mi_row0) {
        int end = c4 + w4 < c->t_mi_col1 ? c4 + w4 : c->t_mi_col1;
        for (int j = c4 | 1; j < end; j += 2)
            if (g->ref0[(size_t)(r - 1) * g->mi_cols + j] > 0) return 1;
    }
    if (c4 > c->t_mi_col0) {
        int end = r + h4 < c->t_mi_row1 ? r + h4 : c->t_mi_row1;
        for (int k = r | 1; k < end; k += 2)
            if (g->ref0[(size_t)k * g->mi_cols + c4 - 1] > 0) return 1;
    }
    return 0;
}

typedef struct {
    int rel4, n4, ref;
    int mvr, mvc;
    int filt;
} ObmcNb;

static const uint8_t OBMC_MAX_NB[6] = {0, 1, 2, 3, 4, 4};

static int bitlen_u(int v) {
    int n = 0;
    while (v) {
        n++;
        v >>= 1;
    }
    return n;
}

static int collect_obmc_above(TpuCommit *c, int r, int c4, int w4,
                              ObmcNb *out) {
    InterGrid *g = c->grid;
    int n = 0;
    if (r <= c->t_mi_row0) return 0;
    int nb_max = OBMC_MAX_NB[bitlen_u(w4) - 1];
    int end_col = c4 + w4 < g->mi_cols ? c4 + w4 : g->mi_cols;
    int col = c4;
    while (col < end_col && n < nb_max) {
        int step = BW4[g->bsize[(size_t)(r - 1) * g->mi_cols + col]];
        if (step > 16) step = 16;
        int use_r = r - 1, use_c = col;
        if (step == 1) {
            col &= ~1;
            use_c = col + 1;
            step = 2;
        }
        size_t o = (size_t)use_r * g->mi_cols + use_c;
        if (g->ref0[o] > 0) {
            out[n].rel4 = col - c4;
            out[n].n4 = w4 < step ? w4 : step;
            out[n].ref = g->ref0[o];
            out[n].mvr = g->mv[o * 2];
            out[n].mvc = g->mv[o * 2 + 1];
            out[n].filt = g->filt[o];
            n++;
        }
        col += step;
    }
    return n;
}

static int collect_obmc_left(TpuCommit *c, int r, int c4, int h4,
                             ObmcNb *out) {
    InterGrid *g = c->grid;
    int n = 0;
    if (c4 <= c->t_mi_col0) return 0;
    int nb_max = OBMC_MAX_NB[bitlen_u(h4) - 1];
    int end_row = r + h4 < g->mi_rows ? r + h4 : g->mi_rows;
    int row = r;
    while (row < end_row && n < nb_max) {
        int step = BH4[g->bsize[(size_t)row * g->mi_cols + c4 - 1]];
        if (step > 16) step = 16;
        int use_r = row, use_c = c4 - 1;
        if (step == 1) {
            row &= ~1;
            use_r = row + 1;
            step = 2;
        }
        size_t o = (size_t)use_r * g->mi_cols + use_c;
        if (g->ref0[o] > 0) {
            out[n].rel4 = row - r;
            out[n].n4 = h4 < step ? h4 : step;
            out[n].ref = g->ref0[o];
            out[n].mvr = g->mv[o * 2];
            out[n].mvc = g->mv[o * 2 + 1];
            out[n].filt = g->filt[o];
            n++;
        }
        row += step;
    }
    return n;
}

/* Blend the OBMC strips into a block-local pred buffer (pw_blk x ...).
 * plane 0 luma (ss = 0) / 1,2 chroma (ss = 1); pred is (size >> ss)
 * wide block-local. Mirrors reconstruct.py _apply_obmc exactly. */
static void obmc_blend_plane(TpuCommit *c, int plane, int r, int c4,
                             int size, const ObmcNb *above, int na,
                             const ObmcNb *left, int nl, int32_t *pred) {
    int ss = plane ? 1 : 0;
    int bw = size >> ss, bh = size >> ss;
    int rw = ss ? (c->width + 1) >> 1 : c->width;
    int rh = ss ? (c->height + 1) >> 1 : c->height;
    static __thread int32_t tmp[64 * 32];
    /* svt_av1_skip_u4x4_pred_in_obmc: small chroma skips the ABOVE pass */
    int skip_above = ss && bw <= 8 && bh <= 8 && (bw == 4 || bh == 4);
    if (!skip_above) {
        for (int j = 0; j < na; j++) {
            const ObmcNb *nb = &above[j];
            /* the strip predicts from the NEIGHBOR's RefFrame[0]
             * (spec 7.11.3.10): LAST or, under MRP, GOLDEN */
            const uint16_t *refp;
            int rstride;
            if (nb->ref == 1) {
                refp = c->refp[plane];
                rstride = c->ref_stride[plane];
            } else if (nb->ref == 4 && c->has_ref3) {
                refp = c->ref3p[plane];
                rstride = c->ref3_stride[plane];
            } else if (nb->ref == 7 && c->ref2p[plane]) {
                refp = c->ref2p[plane];
                rstride = c->ref2_stride[plane];
            } else
                continue;
            int ov = (size < 64 ? size : 64) >> 1;
            int ph = ov >> ss;
            int pw = (nb->n4 * 4) >> ss;
            int x = ((c4 + nb->rel4) * 4) >> ss;
            int y = (r * 4) >> ss;
            mc_block_f(refp, rstride, rw, rh, x, y, pw, ph,
                       nb->mvc << (1 - ss), nb->mvr << (1 - ss), c->bd,
                       nb->filt, nb->filt, tmp);
            const uint8_t *m = obmc_mask(ph);
            int lx = (nb->rel4 * 4) >> ss;
            for (int yy = 0; yy < ph; yy++)
                for (int xx = 0; xx < pw; xx++) {
                    int32_t *d = pred + yy * bw + lx + xx;
                    *d = (m[yy] * *d + (64 - m[yy]) * tmp[yy * pw + xx] +
                          32) >> 6;
                }
        }
    }
    for (int j = 0; j < nl; j++) {
        const ObmcNb *nb = &left[j];
        const uint16_t *refp;
        int rstride;
        if (nb->ref == 1) {
            refp = c->refp[plane];
            rstride = c->ref_stride[plane];
        } else if (nb->ref == 4 && c->has_ref3) {
            refp = c->ref3p[plane];
            rstride = c->ref3_stride[plane];
        } else if (nb->ref == 7 && c->ref2p[plane]) {
            refp = c->ref2p[plane];
            rstride = c->ref2_stride[plane];
        } else
            continue;
        int ov = (size < 64 ? size : 64) >> 1;
        int pw = ov >> ss;
        int ph = (nb->n4 * 4) >> ss;
        int x = (c4 * 4) >> ss;
        int y = ((r + nb->rel4) * 4) >> ss;
        mc_block_f(refp, rstride, rw, rh, x, y, pw, ph,
                   nb->mvc << (1 - ss), nb->mvr << (1 - ss), c->bd,
                   nb->filt, nb->filt, tmp);
        const uint8_t *m = obmc_mask(pw);
        int ly = (nb->rel4 * 4) >> ss;
        for (int yy = 0; yy < ph; yy++)
            for (int xx = 0; xx < pw; xx++) {
                int32_t *d = pred + (ly + yy) * bw + xx;
                *d = (m[xx] * *d + (64 - m[xx]) * tmp[yy * pw + xx] +
                      32) >> 6;
            }
    }
}

/* ---- warped motion (spec 7.10.4/7.11.3.3-7; behavioral twin of
 * svt_av1_psy_tpu/inter/warp.py, ref warped_motion.c:364/570/1045) ------ */
#define WM_PREC_BITS 16
#define WM_TRANS_CLAMP (128 << WM_PREC_BITS)
#define WM_NONDIAG_CLAMP (1 << (WM_PREC_BITS - 3))
#define WPX_PREC_BITS 6
#define WPX_PREC_SHIFTS (1 << WPX_PREC_BITS)
#define WDIFF_PREC_BITS (WM_PREC_BITS - WPX_PREC_BITS)
#define WP_REDUCE_BITS 6
#define WDIV_PREC_BITS 14
#define WDIV_BITS 8
#define LS_SAMPLES_MAX 8
#define WLS_MV_MAX 256
#define WLS_STEP 8
#define WLS_DOWN_BITS 2

static int16_t WARP_FILT[193][8];
static uint16_t WARP_DIVLUT[257];

void tpuc_upload_warp(const int32_t *wf193x8, const int32_t *div_lut257) {
    for (int i = 0; i < 193; i++)
        for (int k = 0; k < 8; k++)
            WARP_FILT[i][k] = (int16_t)wf193x8[i * 8 + k];
    for (int i = 0; i < 257; i++)
        WARP_DIVLUT[i] = (uint16_t)div_lut257[i];
}

static int64_t wround2s(int64_t x, int n) {
    if (n <= 0) return x;
    if (x >= 0) return (x + ((int64_t)1 << (n - 1))) >> n;
    return -((-x + ((int64_t)1 << (n - 1))) >> n);
}

static int msb64(int64_t v) {
    int n = -1;
    while (v) {
        n++;
        v >>= 1;
    }
    return n;
}

/* 1/d ~= lut/2^shift (ref warped_motion.c:320 resolve_divisor_64) */
static int64_t wresolve_divisor(int64_t d, int *shift_out) {
    int shift = msb64(d);
    int64_t e = d - ((int64_t)1 << shift);
    int f;
    if (shift > WDIV_BITS)
        f = (int)wround2s(e, shift - WDIV_BITS);
    else
        f = (int)(e << (WDIV_BITS - shift));
    *shift_out = shift + WDIV_PREC_BITS;
    return WARP_DIVLUT[f];
}

/* has_top_right (spec; twin of inter/mvref.py has_top_right) */
static int has_tr_c(int mi_row, int mi_col, int n8w, int n8h, int sb_mi) {
    int bs = n8w > n8h ? n8w : n8h;
    if (bs > 16) return 0;
    if (n8w > n8h && (mi_row & (n8w - 1))) return 0;
    if (n8w < n8h && ((mi_col + n8w) & (n8h - 1))) return 1;
    int mask_row = mi_row & (sb_mi - 1);
    int mask_col = mi_col & (sb_mi - 1);
    int has_tr = !((mask_row & bs) && (mask_col & bs));
    int b = bs;
    while (b < sb_mi) {
        if (mask_col & b) {
            if ((mask_col & (2 * b)) && (mask_row & (2 * b))) {
                has_tr = 0;
                break;
            }
        } else {
            break;
        }
        b <<= 1;
    }
    return has_tr;
}

/* av1_find_samples (ref adaptive_mv_pred.c:1404; twin of
 * inter/warp.py find_warp_samples). pts/pts_ref: 8 (x, y) pairs in
 * 1/8 px block-relative coords. Returns the unfiltered count. */
static int find_warp_samples_c(TpuCommit *c, int r, int c4, int w4,
                               int h4, int ref, int pts[8][2],
                               int pts_ref[8][2]) {
    InterGrid *g = c->grid;
    int n = 0;
    int do_tl = 1, do_tr = 1;

#define WS_USABLE(rr, cc)                                      \
    (g->ref0[(size_t)(rr) * g->mi_cols + (cc)] == ref &&       \
     g->ref1[(size_t)(rr) * g->mi_cols + (cc)] < 0)
#define WS_RECORD(rr, cc, row_off, sign_r, col_off, sign_c)    \
    do {                                                       \
        size_t o_ = (size_t)(rr) * g->mi_cols + (cc);          \
        int bs_ = g->bsize[o_];                                \
        int bw_ = BW4[bs_] * 4, bh_ = BH4[bs_] * 4;            \
        int x_ = (col_off) * 4 +                               \
                 (sign_c) * ((bw_ > 4 ? bw_ : 4) / 2) - 1;     \
        int y_ = (row_off) * 4 +                               \
                 (sign_r) * ((bh_ > 4 ? bh_ : 4) / 2) - 1;     \
        pts[n][0] = x_ * 8;                                    \
        pts[n][1] = y_ * 8;                                    \
        pts_ref[n][0] = x_ * 8 + g->mv[o_ * 2 + 1];            \
        pts_ref[n][1] = y_ * 8 + g->mv[o_ * 2];                \
        n++;                                                   \
    } while (0)

    if (r > c->t_mi_row0) {
        int src_w = BW4[g->bsize[(size_t)(r - 1) * g->mi_cols + c4]];
        if (w4 <= src_w) {
            int col_off = -(c4 % src_w);
            if (col_off < 0) do_tl = 0;
            if (col_off + src_w > w4) do_tr = 0;
            if (WS_USABLE(r - 1, c4))
                WS_RECORD(r - 1, c4, 0, -1, col_off, 1);
        } else {
            int lim = w4 < c->t_mi_col1 - c4 ? w4 : c->t_mi_col1 - c4;
            int i = 0;
            while (i < lim && n < LS_SAMPLES_MAX) {
                int sw =
                    BW4[g->bsize[(size_t)(r - 1) * g->mi_cols + c4 + i]];
                int step = w4 < sw ? w4 : sw;
                if (WS_USABLE(r - 1, c4 + i))
                    WS_RECORD(r - 1, c4 + i, 0, -1, i, 1);
                i += step;
            }
        }
    }
    if (c4 > c->t_mi_col0 && n < LS_SAMPLES_MAX) {
        int src_h = BH4[g->bsize[(size_t)r * g->mi_cols + c4 - 1]];
        if (h4 <= src_h) {
            int row_off = -(r % src_h);
            if (row_off < 0) do_tl = 0;
            if (WS_USABLE(r, c4 - 1))
                WS_RECORD(r, c4 - 1, row_off, 1, 0, -1);
        } else {
            int lim = h4 < c->t_mi_row1 - r ? h4 : c->t_mi_row1 - r;
            int i = 0;
            while (i < lim && n < LS_SAMPLES_MAX) {
                int sh =
                    BH4[g->bsize[(size_t)(r + i) * g->mi_cols + c4 - 1]];
                int step = h4 < sh ? h4 : sh;
                if (WS_USABLE(r + i, c4 - 1))
                    WS_RECORD(r + i, c4 - 1, i, 1, 0, -1);
                i += step;
            }
        }
    }
    if (do_tl && r > c->t_mi_row0 && c4 > c->t_mi_col0 &&
        n < LS_SAMPLES_MAX && WS_USABLE(r - 1, c4 - 1))
        WS_RECORD(r - 1, c4 - 1, 0, -1, 0, -1);
    if (do_tr && r > c->t_mi_row0 && c4 + w4 < c->t_mi_col1 &&
        has_tr_c(r, c4, w4, h4, 16) && n < LS_SAMPLES_MAX &&
        WS_USABLE(r - 1, c4 + w4))
        WS_RECORD(r - 1, c4 + w4, 0, -1, w4, 1);
#undef WS_USABLE
#undef WS_RECORD
    return n;
}

/* svt_aom_select_samples (ref warped_motion.c:1101) — in place */
static int select_samples_c(int mvr, int mvc, int pts[8][2],
                            int pts_ref[8][2], int n, int bw, int bh) {
    int thresh = bw > bh ? bw : bh;
    if (thresh < 16) thresh = 16;
    if (thresh > 112) thresh = 112;
    int keep = 0;
    for (int i = 0; i < n; i++) {
        int d = abs(pts_ref[i][0] - pts[i][0] - mvc) +
                abs(pts_ref[i][1] - pts[i][1] - mvr);
        if (d <= thresh) {
            pts[keep][0] = pts[i][0];
            pts[keep][1] = pts[i][1];
            pts_ref[keep][0] = pts_ref[i][0];
            pts_ref[keep][1] = pts_ref[i][1];
            keep++;
        }
    }
    return keep ? keep : 1;   /* keep >= 1 (first sample survives) */
}

typedef struct {
    int32_t mat[6];
    int alpha, beta, gamma, delta;
} WarpParams;

/* svt_get_shear_params (ref warped_motion.c:1045) */
static int shear_params_c(WarpParams *wm) {
    const int32_t *mat = wm->mat;
    if (mat[2] <= 0) return 0;
    int64_t alpha = mat[2] - (1 << WM_PREC_BITS);
    int64_t beta = mat[3];
    if (alpha < -32768) alpha = -32768;
    if (alpha > 32767) alpha = 32767;
    if (beta < -32768) beta = -32768;
    if (beta > 32767) beta = 32767;
    int shift;
    int64_t y = wresolve_divisor(mat[2] < 0 ? -mat[2] : mat[2], &shift);
    if (mat[2] < 0) y = -y;
    int64_t v = ((int64_t)mat[4] << WM_PREC_BITS) * y;
    int64_t gamma = wround2s(v, shift);
    if (gamma < -32768) gamma = -32768;
    if (gamma > 32767) gamma = 32767;
    v = (int64_t)mat[3] * mat[4] * y;
    int64_t delta = (int64_t)mat[5] - wround2s(v, shift) -
                    (1 << WM_PREC_BITS);
    if (delta < -32768) delta = -32768;
    if (delta > 32767) delta = 32767;

    alpha = wround2s(alpha, WP_REDUCE_BITS) << WP_REDUCE_BITS;
    beta = wround2s(beta, WP_REDUCE_BITS) << WP_REDUCE_BITS;
    gamma = wround2s(gamma, WP_REDUCE_BITS) << WP_REDUCE_BITS;
    delta = wround2s(delta, WP_REDUCE_BITS) << WP_REDUCE_BITS;

    if (4 * (alpha < 0 ? -alpha : alpha) + 7 * (beta < 0 ? -beta : beta) >=
            (1 << WM_PREC_BITS) ||
        4 * (gamma < 0 ? -gamma : gamma) +
                4 * (delta < 0 ? -delta : delta) >=
            (1 << WM_PREC_BITS))
        return 0;
    wm->alpha = (int)alpha;
    wm->beta = (int)beta;
    wm->gamma = (int)gamma;
    wm->delta = (int)delta;
    return 1;
}

/* gm_get_motion_vector for non-translational models (spec 7.10.2.1):
 * block-center 1/8-px mv with precision lowering. */
static void gm_block_mv_c(TpuCommit *c, int r, int c4, int w4,
                          int *mr_out, int *mc_out) {
    const int32_t *mat = c->gm_wp_mat;
    int64_t x = c4 * 4 + w4 * 2 - 1;
    int64_t y = r * 4 + w4 * 2 - 1;
    int64_t xc = (int64_t)(mat[2] - (1 << WM_PREC_BITS)) * x +
                 (int64_t)mat[3] * y + mat[0];
    int64_t yc = (int64_t)mat[4] * x +
                 (int64_t)(mat[5] - (1 << WM_PREC_BITS)) * y + mat[1];
    int sh = c->tpl_allow_hp ? WM_PREC_BITS - 3 : WM_PREC_BITS - 2;
    int64_t mr = yc >= 0 ? ((yc + (1ll << (sh - 1))) >> sh)
                         : -((-yc + (1ll << (sh - 1))) >> sh);
    int64_t mc2 = xc >= 0 ? ((xc + (1ll << (sh - 1))) >> sh)
                          : -((-xc + (1ll << (sh - 1))) >> sh);
    if (!c->tpl_allow_hp) {
        mr *= 2;
        mc2 *= 2;
    }
    *mr_out = (int)mr;
    *mc_out = (int)mc2;
}

/* find_affine_int (ref warped_motion.c:364): integer LS solve.
 * Returns 1 + fills wm when the params are valid. */
static int find_projection_c(const int pts[8][2], const int pts_ref[8][2],
                             int np, int bw, int bh, int mvr, int mvc,
                             int mi_row, int mi_col, WarpParams *wm) {
    int rsuy = (bh > 4 ? bh : 4) / 2 - 1;
    int rsux = (bw > 4 ? bw : 4) / 2 - 1;
    int suy = rsuy * 8, sux = rsux * 8;
    int duy = suy + mvr, dux = sux + mvc;
    int isuy = mi_row * 4 + rsuy, isux = mi_col * 4 + rsux;

    int64_t A00 = 0, A01 = 0, A11 = 0, bx0 = 0, bx1 = 0, by0 = 0, by1 = 0;
#define LS_SQ(a) \
    (((int64_t)(a) * (a) * 4 + (int64_t)(a) * 4 * WLS_STEP + \
      WLS_STEP * WLS_STEP * 2) >> (2 + WLS_DOWN_BITS))
#define LS_P1(a, b) \
    (((int64_t)(a) * (b) * 4 + ((int64_t)(a) + (b)) * 2 * WLS_STEP + \
      WLS_STEP * WLS_STEP) >> (2 + WLS_DOWN_BITS))
#define LS_P2(a, b) \
    (((int64_t)(a) * (b) * 4 + ((int64_t)(a) + (b)) * 2 * WLS_STEP + \
      WLS_STEP * WLS_STEP * 2) >> (2 + WLS_DOWN_BITS))
    for (int i = 0; i < np; i++) {
        int dx = pts_ref[i][0] - dux;
        int dy = pts_ref[i][1] - duy;
        int sx = pts[i][0] - sux;
        int sy = pts[i][1] - suy;
        if (abs(sx - dx) < WLS_MV_MAX && abs(sy - dy) < WLS_MV_MAX) {
            A00 += LS_SQ(sx);
            A01 += LS_P1(sx, sy);
            A11 += LS_SQ(sy);
            bx0 += LS_P2(sx, dx);
            bx1 += LS_P1(sy, dx);
            by0 += LS_P1(sx, dy);
            by1 += LS_P2(sy, dy);
        }
    }
#undef LS_SQ
#undef LS_P1
#undef LS_P2
    int64_t det = A00 * A11 - A01 * A01;
    if (det == 0) return 0;
    int shift;
    int64_t i_det = wresolve_divisor(det < 0 ? -det : det, &shift);
    if (det < 0) i_det = -i_det;
    shift -= WM_PREC_BITS;
    if (shift < 0) {
        i_det <<= -shift;
        shift = 0;
    }
    int64_t px0 = A11 * bx0 - A01 * bx1;
    int64_t px1 = -A01 * bx0 + A00 * bx1;
    int64_t py0 = A11 * by0 - A01 * by1;
    int64_t py1 = -A01 * by0 + A00 * by1;

#define MULT_DIAG(p) \
    ({ \
        int64_t v_ = wround2s((p) * i_det, shift); \
        int64_t lo_ = (1 << WM_PREC_BITS) - WM_NONDIAG_CLAMP + 1; \
        int64_t hi_ = (1 << WM_PREC_BITS) + WM_NONDIAG_CLAMP - 1; \
        v_ < lo_ ? lo_ : (v_ > hi_ ? hi_ : v_); \
    })
#define MULT_NDIAG(p) \
    ({ \
        int64_t v_ = wround2s((p) * i_det, shift); \
        v_ < -WM_NONDIAG_CLAMP + 1 \
            ? -WM_NONDIAG_CLAMP + 1 \
            : (v_ > WM_NONDIAG_CLAMP - 1 ? WM_NONDIAG_CLAMP - 1 : v_); \
    })
    int64_t m2 = MULT_DIAG(px0);
    int64_t m3 = MULT_NDIAG(px1);
    int64_t m4 = MULT_NDIAG(py0);
    int64_t m5 = MULT_DIAG(py1);
#undef MULT_DIAG
#undef MULT_NDIAG
    int64_t vx = (int64_t)mvc * (1 << (WM_PREC_BITS - 3)) -
                 ((int64_t)isux * (m2 - (1 << WM_PREC_BITS)) +
                  (int64_t)isuy * m3);
    int64_t vy = (int64_t)mvr * (1 << (WM_PREC_BITS - 3)) -
                 ((int64_t)isux * m4 +
                  (int64_t)isuy * (m5 - (1 << WM_PREC_BITS)));
    int64_t m0 = vx < -WM_TRANS_CLAMP
                     ? -WM_TRANS_CLAMP
                     : (vx > WM_TRANS_CLAMP - 1 ? WM_TRANS_CLAMP - 1 : vx);
    int64_t m1 = vy < -WM_TRANS_CLAMP
                     ? -WM_TRANS_CLAMP
                     : (vy > WM_TRANS_CLAMP - 1 ? WM_TRANS_CLAMP - 1 : vy);
    wm->mat[0] = (int32_t)m0;
    wm->mat[1] = (int32_t)m1;
    wm->mat[2] = (int32_t)m2;
    wm->mat[3] = (int32_t)m3;
    wm->mat[4] = (int32_t)m4;
    wm->mat[5] = (int32_t)m5;
    return shear_params_c(wm);
}

/* svt_av1_warp_affine_c (spec 7.11.3.3 block warp, single prediction;
 * twin of inter/warp.py warp_plane). out: block-local (p_h x p_w). */
static void warp_plane_c(const WarpParams *wm, const uint16_t *ref,
                         int rstride, int width, int height, int p_col,
                         int p_row, int p_w, int p_h, int ss_x, int ss_y,
                         int bd, int32_t *out) {
    const int32_t *mat = wm->mat;
    int round_0 = bd == 12 ? 5 : 3;
    int reduce_h = round_0;
    int reduce_v = 2 * FILTER_BITS - reduce_h;
    int offb_h = bd + FILTER_BITS - 1;
    int offb_v = bd + 2 * FILTER_BITS - reduce_h;
    int hi = (1 << bd) - 1;
    int32_t tmp[15][8];
    for (int i = p_row; i < p_row + p_h; i += 8) {
        for (int j = p_col; j < p_col + p_w; j += 8) {
            int32_t src_x = (j + 4) << ss_x;
            int32_t src_y = (i + 4) << ss_y;
            int64_t dst_x =
                (int64_t)mat[2] * src_x + (int64_t)mat[3] * src_y + mat[0];
            int64_t dst_y =
                (int64_t)mat[4] * src_x + (int64_t)mat[5] * src_y + mat[1];
            int64_t x4 = dst_x >> ss_x;
            int64_t y4 = dst_y >> ss_y;
            int32_t ix4 = (int32_t)(x4 >> WM_PREC_BITS);
            int32_t sx4 = (int32_t)(x4 & ((1 << WM_PREC_BITS) - 1));
            int32_t iy4 = (int32_t)(y4 >> WM_PREC_BITS);
            int32_t sy4 = (int32_t)(y4 & ((1 << WM_PREC_BITS) - 1));
            sx4 += wm->alpha * (-4) + wm->beta * (-4);
            sy4 += wm->gamma * (-4) + wm->delta * (-4);
            sx4 &= ~((1 << WP_REDUCE_BITS) - 1);
            sy4 &= ~((1 << WP_REDUCE_BITS) - 1);

            for (int k = -7; k < 8; k++) {
                int iy = iy4 + k;
                if (iy < 0) iy = 0;
                if (iy > height - 1) iy = height - 1;
                int sx = sx4 + wm->beta * (k + 4);
                for (int l = -4; l < 4; l++) {
                    int ox = sx + wm->alpha * (l + 4);
                    int offs = ((ox + (1 << (WDIFF_PREC_BITS - 1))) >>
                                WDIFF_PREC_BITS) +
                               WPX_PREC_SHIFTS;
                    const int16_t *co = WARP_FILT[offs];
                    int32_t acc = 1 << offb_h;
                    for (int m = 0; m < 8; m++) {
                        int sxp = ix4 + l - 3 + m;
                        if (sxp < 0) sxp = 0;
                        if (sxp > width - 1) sxp = width - 1;
                        acc += co[m] * (int32_t)ref[iy * rstride + sxp];
                    }
                    tmp[k + 7][l + 4] =
                        (acc + (1 << (reduce_h - 1))) >> reduce_h;
                }
            }
            int kmax = p_row + p_h - i - 4;
            if (kmax > 4) kmax = 4;
            int lmax = p_col + p_w - j - 4;
            if (lmax > 4) lmax = 4;
            for (int k = -4; k < kmax; k++) {
                int sy = sy4 + wm->delta * (k + 4);
                for (int l = -4; l < lmax; l++) {
                    int oy = sy + wm->gamma * (l + 4);
                    int offs = ((oy + (1 << (WDIFF_PREC_BITS - 1))) >>
                                WDIFF_PREC_BITS) +
                               WPX_PREC_SHIFTS;
                    const int16_t *co = WARP_FILT[offs];
                    int32_t acc = 1 << offb_v;
                    for (int m = 0; m < 8; m++)
                        acc += co[m] * tmp[k + m + 4][l + 4];
                    acc = (acc + (1 << (reduce_v - 1))) >> reduce_v;
                    acc -= (1 << (bd - 1)) + (1 << bd);
                    if (acc < 0) acc = 0;
                    if (acc > hi) acc = hi;
                    out[(i - p_row + 4 + k) * p_w + (j - p_col + 4 + l)] =
                        acc;
                }
            }
        }
    }
}

/* ---- setup_ref_mv_list (spec 7.10.2; single ref, gm identity) ---------- */
#define MV_BORDER (4 << 5)
#define REF_CAT_LEVEL 640
#define MAX_STACK 8
#define MAX_MV_CANDS 2

typedef struct {
    int16_t mv[MAX_STACK][2];
    int16_t mv2[MAX_STACK][2];   /* compound second component */
    int weight[MAX_STACK];
    int n;          /* stack length incl. gm fill */
    int n_found;    /* NumMvFound (gm fill excluded) */
    int mode_context;
} MvRefsC;

typedef struct {
    InterGrid *g;
    int mi_row, mi_col, n8_w, n8_h, ref_frame;
    int ref_frame2;                       /* <= 0 => single ref */
    int t_row0, t_row1, t_col0, t_col1;   /* tile bounds (mi units) */
    MvRefsC *out;
    int row_match, col_match, newmv_count;
    int processed_rows, processed_cols;
    int max_row_offset, max_col_offset;
    int tpl_gm_bit;                       /* GLOBALMV_OFFSET ctx bit */
    /* spec 7.10.2.7: >=8x8 GLOBALMV neighbors contribute the CURRENT
     * block's gm mv when the component ref's GmType > TRANSLATION */
    int gm_nt, gm_nt2;
    int gm_r, gm_c, gm2_r, gm2_c;
} MvCtx;

/* MFMV temporal candidates (spec 7.10.2 add_tpl_ref_mv; behavioral twin
 * of svt_av1_psy_tpu/inter/mvref.py setup_ref_mv_list's tpl branch).
 * The projected motion field comes from python (inter/mfmv.py). */
typedef struct {
    const int16_t *mv;       /* (n8r*n8c*2) projected field, 1/8 px */
    const int16_t *off;      /* (n8r*n8c) ref_frame_offset of the source */
    const uint8_t *valid;    /* (n8r*n8c) */
    int n8r, n8c;
    int cur_off0, cur_off1;  /* cur-to-ref rel dist: ref_frame / ref2 */
    int allow_hp;
} TplArgs;

/* get_mv_projection (spec 7.9.3), Div_Mult reciprocal table */
static const uint16_t DIV_MULT_T[32] = {
    0,    16384, 8192, 5461, 4096, 3276, 2730, 2340, 2048, 1820, 1638,
    1489, 1365,  1260, 1170, 1092, 1024, 963,  910,  862,  819,  780,
    744,  712,   682,  655,  630,  606,  585,  564,  546,  528};

static void mv_proj(int mvr, int mvc, int num, int den, int *or_, int *oc) {
    const int MVMAX = (1 << 14) - 1;
    if (den > 31) den = 31;
    num = num > 0 ? (num < 31 ? num : 31) : (num > -31 ? num : -31);
    int64_t pr = (int64_t)mvr * num * DIV_MULT_T[den];
    int64_t pc = (int64_t)mvc * num * DIV_MULT_T[den];
    int r2 = (int)(pr >= 0 ? (pr + 8192) >> 14 : -((-pr + 8192) >> 14));
    int c2 = (int)(pc >= 0 ? (pc + 8192) >> 14 : -((-pc + 8192) >> 14));
    *or_ = r2 < -MVMAX ? -MVMAX : (r2 > MVMAX ? MVMAX : r2);
    *oc = c2 < -MVMAX ? -MVMAX : (c2 > MVMAX ? MVMAX : c2);
}

/* returns 1 when the projected field had a usable entry at the probe */
static int tpl_add(MvCtx *m, const TplArgs *t, int blk_row, int blk_col,
                   int gm_r, int gm_c, int gm2_r, int gm2_c) {
    int pos_r = (m->mi_row & 1) ? blk_row : blk_row + 1;
    int pos_c = (m->mi_col & 1) ? blk_col : blk_col + 1;
    int rr = m->mi_row + pos_r, cc = m->mi_col + pos_c;
    if (rr < m->t_row0 || rr >= m->t_row1 || cc < m->t_col0 ||
        cc >= m->t_col1)
        return 0;
    int i8 = rr >> 1, j8 = cc >> 1;
    if (i8 >= t->n8r || j8 >= t->n8c) return 0;
    size_t o = (size_t)i8 * t->n8c + j8;
    if (!t->valid[o]) return 0;
    int this_r, this_c;
    mv_proj(t->mv[o * 2], t->mv[o * 2 + 1], t->cur_off0, t->off[o],
            &this_r, &this_c);
    if (!t->allow_hp) {
        if (this_r & 1) this_r += this_r > 0 ? -1 : 1;
        if (this_c & 1) this_c += this_c > 0 ? -1 : 1;
    }
    MvRefsC *s = m->out;
    if (m->ref_frame2 <= 0) {
        if (blk_row == 0 && blk_col == 0 &&
            (abs(this_r - gm_r) >= 16 || abs(this_c - gm_c) >= 16))
            m->tpl_gm_bit = 1;
        for (int i = 0; i < s->n; i++)
            if (s->mv[i][0] == this_r && s->mv[i][1] == this_c) {
                s->weight[i] += 2;
                return 1;
            }
        if (s->n < MAX_STACK) {
            s->mv[s->n][0] = (int16_t)this_r;
            s->mv[s->n][1] = (int16_t)this_c;
            s->weight[s->n] = 2;
            s->n++;
        }
        return 1;
    }
    int comp_r, comp_c;
    mv_proj(t->mv[o * 2], t->mv[o * 2 + 1], t->cur_off1, t->off[o],
            &comp_r, &comp_c);
    if (!t->allow_hp) {
        if (comp_r & 1) comp_r += comp_r > 0 ? -1 : 1;
        if (comp_c & 1) comp_c += comp_c > 0 ? -1 : 1;
    }
    if (blk_row == 0 && blk_col == 0 &&
        (abs(this_r - gm_r) >= 16 || abs(this_c - gm_c) >= 16 ||
         abs(comp_r - gm2_r) >= 16 || abs(comp_c - gm2_c) >= 16))
        m->tpl_gm_bit = 1;
    for (int i = 0; i < s->n; i++)
        if (s->mv[i][0] == this_r && s->mv[i][1] == this_c &&
            s->mv2[i][0] == comp_r && s->mv2[i][1] == comp_c) {
            s->weight[i] += 2;
            return 1;
        }
    if (s->n < MAX_STACK) {
        s->mv[s->n][0] = (int16_t)this_r;
        s->mv[s->n][1] = (int16_t)this_c;
        s->mv2[s->n][0] = (int16_t)comp_r;
        s->mv2[s->n][1] = (int16_t)comp_c;
        s->weight[s->n] = 2;
        s->n++;
    }
    return 1;
}

/* add_ref_mv_candidate (spec 7.10.2); returns 1 when the candidate's
 * ref(s) matched (the caller bumps its row/col match counter). */
static int add_candidate(MvCtx *m, int r, int c, int len, int weight) {
    InterGrid *g = m->g;
    if (c >= m->t_col1 || r >= m->t_row1) return 0;
    size_t o = (size_t)r * g->mi_cols + c;
    if (g->ref0[o] <= 0) return 0;
    MvRefsC *s = m->out;
    if (m->ref_frame2 > 0) {
        /* compound: candidate must match BOTH refs */
        if (g->ref0[o] != m->ref_frame || g->ref1[o] != m->ref_frame2)
            return 0;
        int m0r = g->mv[o * 2], m0c = g->mv[o * 2 + 1];
        int m1r = g->mv1[o * 2], m1c = g->mv1[o * 2 + 1];
        if (g->gmv[o]) {
            /* spec 7.10.2.7 global-mode neighbor substitution */
            if (m->gm_nt) { m0r = m->gm_r; m0c = m->gm_c; }
            if (m->gm_nt2) { m1r = m->gm2_r; m1c = m->gm2_c; }
        }
        int found = 0;
        for (int i = 0; i < s->n; i++)
            if (s->mv[i][0] == m0r && s->mv[i][1] == m0c &&
                s->mv2[i][0] == m1r && s->mv2[i][1] == m1c) {
                s->weight[i] += weight * len;
                found = 1;
                break;
            }
        if (!found && s->n < MAX_STACK) {
            s->mv[s->n][0] = (int16_t)m0r;
            s->mv[s->n][1] = (int16_t)m0c;
            s->mv2[s->n][0] = (int16_t)m1r;
            s->mv2[s->n][1] = (int16_t)m1c;
            s->weight[s->n] = weight * len;
            s->n++;
        }
        if (g->newmv[o]) m->newmv_count++;
        return 1;
    }
    int matched = 0;
    for (int ri = 0; ri < 2; ri++) {
        int cref = ri == 0 ? g->ref0[o] : g->ref1[o];
        if (cref != m->ref_frame) continue;
        const int16_t *cmv = ri == 0 ? g->mv + o * 2 : g->mv1 + o * 2;
        int mvr = cmv[0], mvc = cmv[1];
        if (m->gm_nt && g->gmv[o]) {
            mvr = m->gm_r;
            mvc = m->gm_c;
        }
        int found = 0;
        for (int i = 0; i < s->n; i++)
            if (s->mv[i][0] == mvr && s->mv[i][1] == mvc) {
                s->weight[i] += weight * len;
                found = 1;
                break;
            }
        if (!found && s->n < MAX_STACK) {
            s->mv[s->n][0] = (int16_t)mvr;
            s->mv[s->n][1] = (int16_t)mvc;
            s->weight[s->n] = weight * len;
            s->n++;
        }
        if (g->newmv[o]) m->newmv_count++;
        matched = 1;
    }
    return matched;
}

static void scan_row(MvCtx *m, int row_offset) {
    InterGrid *g = m->g;
    int end_mi = m->n8_w;
    if (m->t_col1 - m->mi_col < end_mi) end_mi = m->t_col1 - m->mi_col;
    if (end_mi > 16) end_mi = 16;
    int col_offset = 0;
    if (abs(row_offset) > 1) {
        col_offset = 1;
        if ((m->mi_col & 1) && m->n8_w < 2) col_offset--;
    }
    int use_step_16 = m->n8_w >= 16;
    int i = 0;
    while (i < end_mi) {
        int r = m->mi_row + row_offset;
        int c = m->mi_col + col_offset + i;
        int cb = g->bsize[(size_t)r * g->mi_cols + c];
        int cw4 = BW4[cb], ch4 = BH4[cb];
        int ln = m->n8_w < cw4 ? m->n8_w : cw4;
        if (use_step_16) {
            if (ln < 4) ln = 4;
        } else if (abs(row_offset) > 1) {
            if (ln < 2) ln = 2;
        }
        int weight = 2;
        if (m->n8_w >= 2 && m->n8_w <= cw4) {
            int inc = -m->max_row_offset + row_offset + 1;
            if (inc > ch4) inc = ch4;
            if (inc > weight) weight = inc;
            m->processed_rows = inc - row_offset - 1;
        }
        if (add_candidate(m, r, c, ln, weight))
            m->row_match++;
        i += ln;
    }
}

static void scan_col(MvCtx *m, int col_offset) {
    InterGrid *g = m->g;
    int end_mi = m->n8_h;
    if (m->t_row1 - m->mi_row < end_mi) end_mi = m->t_row1 - m->mi_row;
    if (end_mi > 16) end_mi = 16;
    int row_offset = 0;
    if (abs(col_offset) > 1) {
        row_offset = 1;
        if ((m->mi_row & 1) && m->n8_h < 2) row_offset--;
    }
    int use_step_16 = m->n8_h >= 16;
    int i = 0;
    while (i < end_mi) {
        int r = m->mi_row + row_offset + i;
        int c = m->mi_col + col_offset;
        int cb = g->bsize[(size_t)r * g->mi_cols + c];
        int cw4 = BW4[cb], ch4 = BH4[cb];
        int ln = m->n8_h < ch4 ? m->n8_h : ch4;
        if (use_step_16) {
            if (ln < 4) ln = 4;
        } else if (abs(col_offset) > 1) {
            if (ln < 2) ln = 2;
        }
        int weight = 2;
        if (m->n8_h >= 2 && m->n8_h <= ch4) {
            int inc = -m->max_col_offset + col_offset + 1;
            if (inc > cw4) inc = cw4;
            if (inc > weight) weight = inc;
            m->processed_cols = inc - col_offset - 1;
        }
        if (add_candidate(m, r, c, ln, weight))
            m->col_match++;
        i += ln;
    }
}

static void scan_blk(MvCtx *m, int row_offset, int col_offset) {
    int r = m->mi_row + row_offset;
    int c = m->mi_col + col_offset;
    InterGrid *g = m->g;
    if (r < m->t_row0 || c < m->t_col0 || r >= m->t_row1 ||
        c >= m->t_col1)
        return;
    if (add_candidate(m, r, c, 2, 2))
        m->row_match++;
}

static int has_top_right(MvCtx *m, int sb_mi) {
    int bs = m->n8_w > m->n8_h ? m->n8_w : m->n8_h;
    if (bs > 16) return 0;
    if (m->n8_w > m->n8_h) {
        if (m->mi_row & (m->n8_w - 1)) return 0;
    }
    if (m->n8_w < m->n8_h) {
        if ((m->mi_col + m->n8_w) & (m->n8_h - 1)) return 1;
    }
    int mask_row = m->mi_row & (sb_mi - 1);
    int mask_col = m->mi_col & (sb_mi - 1);
    int has_tr = !((mask_row & bs) && (mask_col & bs));
    int b = bs;
    while (b < sb_mi) {
        if (mask_col & b) {
            if ((mask_col & (2 * b)) && (mask_row & (2 * b))) {
                has_tr = 0;
                break;
            }
        } else {
            break;
        }
        b <<= 1;
    }
    /* square-partition-only walk: no VERT_A special case */
    return has_tr;
}

void tpui_ref_mv_list(InterGrid *g, int mi_row, int mi_col, int bsize,
                      int ref_frame, int sb_mi, int t_row0, int t_row1,
                      int t_col0, int t_col1, int gm_r, int gm_c,
                      int ref_frame2, int gm2_r, int gm2_c,
                      const uint8_t *sign_bias, const TplArgs *tpl,
                      MvRefsC *out, int gm_nt, int gm_nt2) {
    static const uint8_t zero_bias[8] = {0};
    if (!sign_bias) sign_bias = zero_bias;
    int n8_w = BW4[bsize], n8_h = BH4[bsize];
    memset(out, 0, sizeof(*out));
    MvCtx m = {0};
    m.gm_nt = gm_nt;
    m.gm_nt2 = gm_nt2;
    m.gm_r = gm_r;
    m.gm_c = gm_c;
    m.gm2_r = gm2_r;
    m.gm2_c = gm2_c;
    m.g = g;
    m.mi_row = mi_row;
    m.mi_col = mi_col;
    m.n8_w = n8_w;
    m.n8_h = n8_h;
    m.ref_frame = ref_frame;
    m.ref_frame2 = ref_frame2;
    m.t_row0 = t_row0;
    m.t_row1 = t_row1;
    m.t_col0 = t_col0;
    m.t_col1 = t_col1;
    m.out = out;

    /* availability is TILE-relative (spec 7.10.2 MiRowStart/MiColStart) */
    int up_avail = mi_row > t_row0, left_avail = mi_col > t_col0;
    int row_adj = (n8_h < 2) && (mi_row & 1);
    int col_adj = (n8_w < 2) && (mi_col & 1);
    if (up_avail) {
        m.max_row_offset = -(3 << 1) + row_adj;
        if (n8_h < 2) m.max_row_offset = -(2 << 1) + row_adj;
        m.max_row_offset = clampi(m.max_row_offset, -(mi_row - t_row0),
                                  t_row1 - mi_row - 1);
    }
    if (left_avail) {
        m.max_col_offset = -(3 << 1) + col_adj;
        if (n8_w < 2) m.max_col_offset = -(2 << 1) + col_adj;
        m.max_col_offset = clampi(m.max_col_offset, -(mi_col - t_col0),
                                  t_col1 - mi_col - 1);
    }

    if (abs(m.max_row_offset) >= 1) scan_row(&m, -1);
    if (abs(m.max_col_offset) >= 1) scan_col(&m, -1);
    if (has_top_right(&m, sb_mi)) scan_blk(&m, -1, n8_w);

    int nearest_match = (m.row_match > 0) + (m.col_match > 0);
    int nearest_newmv = m.newmv_count;
    for (int i = 0; i < out->n; i++) out->weight[i] += REF_CAT_LEVEL;

    /* temporal (MFMV) candidates between the nearest boost and the outer
     * scans (spec 7.10.2 ordering; mirrors mvref.py's tpl branch) */
    if (tpl && tpl->mv) {
        int blk_row_end = n8_h < 16 ? n8_h : 16;
        int blk_col_end = n8_w < 16 ? n8_w : 16;
        int allow_ext = n8_h >= 2 && n8_h < 16 && n8_w >= 2 && n8_w < 16;
        int step_h = n8_h >= 16 ? 4 : 2;
        int step_w = n8_w >= 16 ? 4 : 2;
        int is_available = 0;
        for (int br = 0; br < blk_row_end; br += step_h)
            for (int bc = 0; bc < blk_col_end; bc += step_w) {
                int ret = tpl_add(&m, tpl, br, bc, gm_r, gm_c, gm2_r,
                                  gm2_c);
                if (br == 0 && bc == 0) is_available = ret;
            }
        if (!is_available) m.tpl_gm_bit = 1;
        if (allow_ext) {
            int voff = n8_h > 2 ? n8_h : 2;
            int hoff = n8_w > 2 ? n8_w : 2;
            int mrow = mi_row & (sb_mi - 1), mcol = mi_col & (sb_mi - 1);
            int ext[3][2];
            ext[0][0] = voff;     ext[0][1] = -2;
            ext[1][0] = voff;     ext[1][1] = hoff;
            ext[2][0] = voff - 2; ext[2][1] = hoff;
            for (int k = 0; k < 3; k++) {
                int br = ext[k][0], bc = ext[k][1];
                /* check_sb_border: stay within the current superblock */
                if (mrow + br < 0 || mrow + br >= sb_mi ||
                    mcol + bc < 0 || mcol + bc >= sb_mi)
                    continue;
                tpl_add(&m, tpl, br, bc, gm_r, gm_c, gm2_r, gm2_c);
            }
        }
    }

    scan_blk(&m, -1, -1);
    for (int idx = 2; idx <= 3; idx++) {
        int row_offset = -(idx << 1) + 1 + row_adj;
        int col_offset = -(idx << 1) + 1 + col_adj;
        if (abs(row_offset) <= abs(m.max_row_offset) &&
            abs(row_offset) > m.processed_rows)
            scan_row(&m, row_offset);
        if (abs(col_offset) <= abs(m.max_col_offset) &&
            abs(col_offset) > m.processed_cols)
            scan_col(&m, col_offset);
    }

    int ref_match_count = (m.row_match > 0) + (m.col_match > 0);
    int mode_context = 0;
    if (nearest_match == 0) {
        if (ref_match_count >= 1) mode_context |= 1;
        if (ref_match_count == 1)
            mode_context |= (1 << 4);
        else if (ref_match_count >= 2)
            mode_context |= (2 << 4);
    } else if (nearest_match == 1) {
        mode_context |= nearest_newmv > 0 ? 2 : 3;
        if (ref_match_count == 1)
            mode_context |= (3 << 4);
        else if (ref_match_count >= 2)
            mode_context |= (4 << 4);
    } else {
        mode_context |= nearest_newmv >= 1 ? 4 : 5;
        mode_context |= (5 << 4);
    }
    if (m.tpl_gm_bit) mode_context |= (1 << 3);   /* GLOBALMV_OFFSET */
    out->mode_context = mode_context;

    /* stable sort by weight descending (insertion sort keeps stability) */
    for (int i = 1; i < out->n; i++) {
        int16_t tr = out->mv[i][0], tc = out->mv[i][1];
        int16_t tr2 = out->mv2[i][0], tc2 = out->mv2[i][1];
        int tw = out->weight[i];
        int j = i - 1;
        while (j >= 0 && out->weight[j] < tw) {
            out->mv[j + 1][0] = out->mv[j][0];
            out->mv[j + 1][1] = out->mv[j][1];
            out->mv2[j + 1][0] = out->mv2[j][0];
            out->mv2[j + 1][1] = out->mv2[j][1];
            out->weight[j + 1] = out->weight[j];
            j--;
        }
        out->mv[j + 1][0] = tr;
        out->mv[j + 1][1] = tc;
        out->mv2[j + 1][0] = tr2;
        out->mv2[j + 1][1] = tc2;
        out->weight[j + 1] = tw;
    }

    int n_counted = -1;
    if (out->n < MAX_MV_CANDS) {
        int mi_width = n8_w;
        if (t_col1 - mi_col < mi_width) mi_width = t_col1 - mi_col;
        if (mi_width > 16) mi_width = 16;
        int mi_height = n8_h;
        if (t_row1 - mi_row < mi_height) mi_height = t_row1 - mi_row;
        if (mi_height > 16) mi_height = 16;
        int mi_size = mi_width < mi_height ? mi_width : mi_height;
        if (ref_frame2 > 0) {
            /* compound light rescan (ref adaptive_mv_pred.c:457):
             * same-ref / sign-flipped other-ref candidates per
             * component, then combine */
            int16_t ref_id[2][2][2], ref_diff[2][2][2];
            int ref_id_n[2] = {0, 0}, ref_diff_n[2] = {0, 0};
            int rf[2] = {ref_frame, ref_frame2};
            for (int pass = 0; pass < 2; pass++) {
                if (pass == 0 && abs(m.max_row_offset) < 1) continue;
                if (pass == 1 && abs(m.max_col_offset) < 1) continue;
                int i = 0;
                while (i < mi_size) {
                    int r = pass == 0 ? mi_row - 1 : mi_row + i;
                    int c = pass == 0 ? mi_col + i : mi_col - 1;
                    size_t o = (size_t)r * g->mi_cols + c;
                    for (int ri = 0; ri < 2; ri++) {
                        int can_rf = ri == 0 ? g->ref0[o] : g->ref1[o];
                        const int16_t *cmv = ri == 0 ? g->mv + o * 2
                                                     : g->mv1 + o * 2;
                        for (int ci = 0; ci < 2; ci++) {
                            if (can_rf == rf[ci] && ref_id_n[ci] < 2) {
                                ref_id[ci][ref_id_n[ci]][0] = cmv[0];
                                ref_id[ci][ref_id_n[ci]][1] = cmv[1];
                                ref_id_n[ci]++;
                            } else if (can_rf > 0 && ref_diff_n[ci] < 2) {
                                int16_t vr = cmv[0], vc = cmv[1];
                                if (sign_bias[can_rf] !=
                                    sign_bias[rf[ci]]) {
                                    vr = (int16_t)-vr;
                                    vc = (int16_t)-vc;
                                }
                                ref_diff[ci][ref_diff_n[ci]][0] = vr;
                                ref_diff[ci][ref_diff_n[ci]][1] = vc;
                                ref_diff_n[ci]++;
                            }
                        }
                    }
                    i += pass == 0 ? BW4[g->bsize[o]] : BH4[g->bsize[o]];
                }
            }
            int16_t comp_list[MAX_MV_CANDS + 1][2][2];
            for (int ci = 0; ci < 2; ci++) {
                int k = 0;
                for (int li = 0; li < ref_id_n[ci] && k < MAX_MV_CANDS;
                     li++, k++) {
                    comp_list[k][ci][0] = ref_id[ci][li][0];
                    comp_list[k][ci][1] = ref_id[ci][li][1];
                }
                for (int li = 0; li < ref_diff_n[ci] && k < MAX_MV_CANDS;
                     li++, k++) {
                    comp_list[k][ci][0] = ref_diff[ci][li][0];
                    comp_list[k][ci][1] = ref_diff[ci][li][1];
                }
                for (; k < MAX_MV_CANDS; k++) {
                    comp_list[k][ci][0] = (int16_t)(ci ? gm2_r : gm_r);
                    comp_list[k][ci][1] = (int16_t)(ci ? gm2_c : gm_c);
                }
            }
            if (out->n) {   /* refmv_count == 1 */
                int pick = (comp_list[0][0][0] == out->mv[0][0] &&
                            comp_list[0][0][1] == out->mv[0][1] &&
                            comp_list[0][1][0] == out->mv2[0][0] &&
                            comp_list[0][1][1] == out->mv2[0][1])
                               ? 1
                               : 0;
                out->mv[1][0] = comp_list[pick][0][0];
                out->mv[1][1] = comp_list[pick][0][1];
                out->mv2[1][0] = comp_list[pick][1][0];
                out->mv2[1][1] = comp_list[pick][1][1];
                out->weight[1] = 2;
                out->n = 2;
            } else {
                for (int k = 0; k < MAX_MV_CANDS; k++) {
                    out->mv[k][0] = comp_list[k][0][0];
                    out->mv[k][1] = comp_list[k][0][1];
                    out->mv2[k][0] = comp_list[k][1][0];
                    out->mv2[k][1] = comp_list[k][1][1];
                    out->weight[k] = 2;
                }
                out->n = MAX_MV_CANDS;
            }
            /* compound light-rescan adds COUNT toward NumMvFound */
        } else {
            for (int pass = 0; pass < 2; pass++) {
                if (pass == 0 && abs(m.max_row_offset) < 1) continue;
                if (pass == 1 && abs(m.max_col_offset) < 1) continue;
                int i = 0;
                while (i < mi_size && out->n < MAX_MV_CANDS) {
                    int r = pass == 0 ? mi_row - 1 : mi_row + i;
                    int c = pass == 0 ? mi_col + i : mi_col - 1;
                    size_t o = (size_t)r * g->mi_cols + c;
                    for (int ri = 0; ri < 2; ri++) {
                        int can_rf = ri == 0 ? g->ref0[o] : g->ref1[o];
                        if (can_rf <= 0) continue;
                        const int16_t *cmv = ri == 0 ? g->mv + o * 2
                                                     : g->mv1 + o * 2;
                        int16_t mvr = cmv[0], mvc = cmv[1];
                        if (sign_bias[can_rf] != sign_bias[ref_frame]) {
                            mvr = (int16_t)-mvr;
                            mvc = (int16_t)-mvc;
                        }
                        int dup = 0;
                        for (int k = 0; k < out->n; k++)
                            if (out->mv[k][0] == mvr &&
                                out->mv[k][1] == mvc)
                                dup = 1;
                        /* append un-gated by MAX_MV_CANDS: both slots
                         * of one candidate may add (count can reach 3,
                         * matching the reference) */
                        if (!dup && out->n < MAX_STACK) {
                            out->mv[out->n][0] = mvr;
                            out->mv[out->n][1] = mvc;
                            out->weight[out->n] = 2;
                            out->n++;
                        }
                    }
                    i += pass == 0 ? BW4[g->bsize[o]] : BH4[g->bsize[o]];
                }
            }
            n_counted = out->n;
            while (out->n < MAX_MV_CANDS) {
                out->mv[out->n][0] = (int16_t)gm_r;   /* gm fill */
                out->mv[out->n][1] = (int16_t)gm_c;
                out->weight[out->n] = 2;
                out->n++;
            }
        }
    }

    /* clamp */
    int bw8 = n8_w * 4 * 8, bh8 = n8_h * 4 * 8;
    int to_left = -(mi_col * 4 * 8);
    int to_right = (g->mi_cols - n8_w - mi_col) * 4 * 8;
    int to_top = -(mi_row * 4 * 8);
    int to_bottom = (g->mi_rows - n8_h - mi_row) * 4 * 8;
    /* (MV clamp region is frame-based; only availability is tiled) */
    for (int i = 0; i < out->n; i++) {
        out->mv[i][1] = (int16_t)clampi(out->mv[i][1],
                                        to_left - bw8 - MV_BORDER,
                                        to_right + bw8 + MV_BORDER);
        out->mv[i][0] = (int16_t)clampi(out->mv[i][0],
                                        to_top - bh8 - MV_BORDER,
                                        to_bottom + bh8 + MV_BORDER);
        if (ref_frame2 > 0) {
            out->mv2[i][1] = (int16_t)clampi(out->mv2[i][1],
                                             to_left - bw8 - MV_BORDER,
                                             to_right + bw8 + MV_BORDER);
            out->mv2[i][0] = (int16_t)clampi(out->mv2[i][0],
                                             to_top - bh8 - MV_BORDER,
                                             to_bottom + bh8 + MV_BORDER);
        }
    }
    out->n_found = n_counted < 0 ? out->n : n_counted;
}

int tpui_drl_ctx(const MvRefsC *refs, int idx) {
    if (idx < refs->n && refs->weight[idx] >= REF_CAT_LEVEL) {
        if (idx + 1 < refs->n && refs->weight[idx + 1] >= REF_CAT_LEVEL)
            return 0;
        return 1;
    }
    if (idx + 1 < refs->n) return 2;
    return 0;
}

/* ---- MV coding (spec 5.11.31/32; allow_hp=0, force_int=0) -------------- */
static void write_mv_comp(TpuCommit *c, int comp, int val) {
    InterCdfs *ic = c->ic;
    int sign = val < 0;
    int mag = sign ? -val : val;
    tpuec_symbol(c->ec, sign, ic->sign[comp], 2, 1);
    int off = mag - 1;
    int cls = 0;
    while (cls < 10) {
        int base = cls == 0 ? 0 : (2 << (cls + 2));
        int size = cls == 0 ? 16 : (2 << (cls + 2));
        if (off >= base && off < base + size) break;
        cls++;
    }
    tpuec_symbol(c->ec, cls, ic->classes[comp], 11, 1);
    int rem = cls == 0 ? off : off - (2 << (cls + 2));
    int fr = (rem >> 1) & 3;
    int d = rem >> 3;
    if (cls == 0) {
        tpuec_symbol(c->ec, d, ic->class0[comp], 2, 1);
    } else {
        for (int b = 0; b < cls; b++)
            tpuec_symbol(c->ec, (d >> b) & 1, ic->bits[comp] + b * 3, 2, 1);
    }
    if (cls == 0)
        tpuec_symbol(c->ec, fr, ic->class0_fp[comp] + d * 5, 4, 1);
    else
        tpuec_symbol(c->ec, fr, ic->fp[comp], 4, 1);
    if (c->tpl_allow_hp) {
        int hp = rem & 1;
        tpuec_symbol(c->ec, hp,
                     cls == 0 ? ic->class0_hp[comp] : ic->hp[comp], 2, 1);
    }
}

static double cost_mv_comp(TpuCommit *c, int comp, int val) {
    InterCdfs *ic = c->ic;
    int sign = val < 0;
    int mag = sign ? -val : val;
    double bits = tpu_sym_cost_bits(ic->sign[comp], sign);
    int off = mag - 1;
    int cls = 0;
    while (cls < 10) {
        int base = cls == 0 ? 0 : (2 << (cls + 2));
        int size = cls == 0 ? 16 : (2 << (cls + 2));
        if (off >= base && off < base + size) break;
        cls++;
    }
    bits += tpu_sym_cost_bits(ic->classes[comp], cls);
    int rem = cls == 0 ? off : off - (2 << (cls + 2));
    int fr = (rem >> 1) & 3;
    int d = rem >> 3;
    if (cls == 0)
        bits += tpu_sym_cost_bits(ic->class0[comp], d);
    else
        for (int b = 0; b < cls; b++)
            bits += tpu_sym_cost_bits(ic->bits[comp] + b * 3, (d >> b) & 1);
    if (cls == 0)
        bits += tpu_sym_cost_bits(ic->class0_fp[comp] + d * 5, fr);
    else
        bits += tpu_sym_cost_bits(ic->fp[comp], fr);
    if (c->tpl_allow_hp)
        bits += tpu_sym_cost_bits(
            cls == 0 ? ic->class0_hp[comp] : ic->hp[comp], rem & 1);
    return bits;
}

static void write_mv(TpuCommit *c, int mvr, int mvc, int pr, int pc) {
    int dr = mvr - pr, dc = mvc - pc;
    int joint = (dr ? 2 : 0) | (dc ? 1 : 0);
    tpuec_symbol(c->ec, joint, c->ic->nmv_joints, 4, 1);
    if (dr) write_mv_comp(c, 0, dr);
    if (dc) write_mv_comp(c, 1, dc);
}

static double cost_mv(TpuCommit *c, int mvr, int mvc, int pr, int pc) {
    int dr = mvr - pr, dc = mvc - pc;
    int joint = (dr ? 2 : 0) | (dc ? 1 : 0);
    double bits = tpu_sym_cost_bits(c->ic->nmv_joints, joint);
    if (dr) bits += cost_mv_comp(c, 0, dr);
    if (dc) bits += cost_mv_comp(c, 1, dc);
    return bits;
}

static void lower_precision_hp(TpuCommit *c, int *r, int *c2) {
    /* spec lower_mv_precision: only when !allow_high_precision_mv */
    if (c->tpl_allow_hp) return;
    if (*r & 1) *r += *r > 0 ? -1 : 1;
    if (*c2 & 1) *c2 += *c2 > 0 ? -1 : 1;
}

/* ---- shared writer/parser context helpers ------------------------------ */
static int intra_inter_ctx_of(TpuCommit *c, int r, int c4) {
    InterGrid *g = c->grid;
    int have_above = r > c->t_mi_row0, have_left = c4 > c->t_mi_col0;
    if (have_above && have_left) {
        int ai = g->ref0[(size_t)(r - 1) * g->mi_cols + c4] <= 0;
        int li = g->ref0[(size_t)r * g->mi_cols + c4 - 1] <= 0;
        return (ai && li) ? 3 : (ai || li) ? 1 : 0;
    }
    if (have_above || have_left) {
        size_t o = have_above ? (size_t)(r - 1) * g->mi_cols + c4
                              : (size_t)r * g->mi_cols + c4 - 1;
        return 2 * (g->ref0[o] <= 0);
    }
    return 0;
}

static void neighbor_ref_counts(TpuCommit *c, int r, int c4, int *counts) {
    /* collect_neighbors_ref_counts: both ref slots of above/left */
    InterGrid *g = c->grid;
    memset(counts, 0, sizeof(int) * 8);
    if (r > c->t_mi_row0) {
        size_t o = (size_t)(r - 1) * g->mi_cols + c4;
        if (g->ref0[o] > 0) {
            counts[g->ref0[o]]++;
            if (g->ref1[o] > 0) counts[g->ref1[o]]++;
        }
    }
    if (c4 > c->t_mi_col0) {
        size_t o = (size_t)r * g->mi_cols + c4 - 1;
        if (g->ref0[o] > 0) {
            counts[g->ref0[o]]++;
            if (g->ref1[o] > 0) counts[g->ref1[o]]++;
        }
    }
}
static int ctx3(int a, int b) { return a == b ? 1 : (a < b ? 0 : 2); }

/* single-ref reference-frame tree bits (spec 5.11.25 read_ref_frames
 * single path): LAST (1) = p1:0 p3:0 p4:0; GOLDEN (4) = p1:0 p3:1
 * p5:1; ALTREF (7) = p1:1 p2:1. Contexts follow the neighbor-count
 * rule per node (mirrors decoder/tile_parser._read_single_ref). */
static void write_single_ref(TpuCommit *c, int r, int c4, int rf) {
    InterCdfs *ic = c->ic;
    int cnt[8];
    neighbor_ref_counts(c, r, c4, cnt);
    int fwd = cnt[1] + cnt[2] + cnt[3] + cnt[4];
    int bwd = cnt[5] + cnt[6] + cnt[7];
    tpuec_symbol(c->ec, rf >= 5,
                 ic->single_ref + (ctx3(fwd, bwd) * 6 + 0) * 3, 2, 1);
    if (rf >= 5) {
        /* backward group: only ALTREF is produced by the walk */
        tpuec_symbol(c->ec, rf == 7,
                     ic->single_ref +
                         (ctx3(cnt[5] + cnt[6], cnt[7]) * 6 + 1) * 3,
                     2, 1);
        if (rf != 7)
            tpuec_symbol(c->ec, rf == 6,
                         ic->single_ref +
                             (ctx3(cnt[5], cnt[6]) * 6 + 5) * 3,
                         2, 1);
        return;
    }
    int p3 = rf >= 3;
    tpuec_symbol(c->ec, p3,
                 ic->single_ref +
                     (ctx3(cnt[1] + cnt[2], cnt[3] + cnt[4]) * 6 + 2) * 3,
                 2, 1);
    if (!p3)
        tpuec_symbol(c->ec, rf == 2,
                     ic->single_ref + (ctx3(cnt[1], cnt[2]) * 6 + 3) * 3,
                     2, 1);
    else
        tpuec_symbol(c->ec, rf == 4,
                     ic->single_ref + (ctx3(cnt[3], cnt[4]) * 6 + 4) * 3,
                     2, 1);
}
static double cost_single_ref(TpuCommit *c, int r, int c4, int rf) {
    InterCdfs *ic = c->ic;
    int cnt[8];
    neighbor_ref_counts(c, r, c4, cnt);
    int fwd = cnt[1] + cnt[2] + cnt[3] + cnt[4];
    int bwd = cnt[5] + cnt[6] + cnt[7];
    if (rf >= 5) {
        double bb = tpu_sym_cost_bits(
            ic->single_ref + (ctx3(fwd, bwd) * 6 + 0) * 3, 1) +
            tpu_sym_cost_bits(
                ic->single_ref +
                    (ctx3(cnt[5] + cnt[6], cnt[7]) * 6 + 1) * 3,
                rf == 7);
        if (rf != 7)
            bb += tpu_sym_cost_bits(
                ic->single_ref + (ctx3(cnt[5], cnt[6]) * 6 + 5) * 3,
                rf == 6);
        return bb;
    }
    int p3 = rf >= 3;
    double bits =
        tpu_sym_cost_bits(ic->single_ref + (ctx3(fwd, bwd) * 6 + 0) * 3,
                          0) +
        tpu_sym_cost_bits(
            ic->single_ref +
                (ctx3(cnt[1] + cnt[2], cnt[3] + cnt[4]) * 6 + 2) * 3,
            p3);
    if (!p3)
        bits += tpu_sym_cost_bits(
            ic->single_ref + (ctx3(cnt[1], cnt[2]) * 6 + 3) * 3, rf == 2);
    else
        bits += tpu_sym_cost_bits(
            ic->single_ref + (ctx3(cnt[3], cnt[4]) * 6 + 4) * 3, rf == 4);
    return bits;
}

/* ---- compound (LAST + ALTREF) syntax helpers --------------------------- */

/* av1_get_reference_mode_context (comp_inter bit ctx) */
static int reference_mode_ctx_c(TpuCommit *c, int r, int c4) {
    InterGrid *g = c->grid;
    int ha = r > c->t_mi_row0, hl = c4 > c->t_mi_col0;
#define NINFO(rr, cc, in, cp, bwd)                                   \
    do {                                                              \
        size_t o = (size_t)(rr)*g->mi_cols + (cc);                    \
        in = g->ref0[o] > 0;                                          \
        cp = g->ref1[o] > 0;                                          \
        bwd = g->ref0[o] >= 5;                                        \
    } while (0)
    if (ha && hl) {
        int a_in, a_cp, a_b, l_in, l_cp, l_b;
        NINFO(r - 1, c4, a_in, a_cp, a_b);
        NINFO(r, c4 - 1, l_in, l_cp, l_b);
        if (!a_cp && !l_cp) return a_b ^ l_b;
        if (!a_cp) return 2 + (a_b || !a_in);
        if (!l_cp) return 2 + (l_b || !l_in);
        return 4;
    }
    if (ha || hl) {
        int e_in, e_cp, e_b;
        if (ha) NINFO(r - 1, c4, e_in, e_cp, e_b);
        else NINFO(r, c4 - 1, e_in, e_cp, e_b);
        return e_cp ? 3 : e_b;
    }
    return 1;
#undef NINFO
}

/* av1_get_comp_reference_type_context */
static int comp_ref_type_ctx_c(TpuCommit *c, int r, int c4) {
    InterGrid *g = c->grid;
    int ha = r > c->t_mi_row0, hl = c4 > c->t_mi_col0;
#define RINFO(rr, cc, in, cp, r0, r1)                                 \
    do {                                                              \
        size_t o = (size_t)(rr)*g->mi_cols + (cc);                    \
        r0 = g->ref0[o];                                              \
        r1 = g->ref1[o];                                              \
        in = r0 > 0;                                                  \
        cp = r1 > 0;                                                  \
    } while (0)
#define UNI(r0, r1) (!((r0 >= 5) ^ (r1 >= 5)))
    if (ha && hl) {
        int a_in, a_cp, a0, a1, l_in, l_cp, l0, l1;
        RINFO(r - 1, c4, a_in, a_cp, a0, a1);
        RINFO(r, c4 - 1, l_in, l_cp, l0, l1);
        if (!a_in && !l_in) return 2;
        if (!a_in || !l_in) {
            int e_cp = !a_in ? l_cp : a_cp;
            int e0 = !a_in ? l0 : a0;
            int e1 = !a_in ? l1 : a1;
            if (!e_cp) return 2;
            return 1 + 2 * UNI(e0, e1);
        }
        if (!a_cp && !l_cp) return 1 + 2 * (!((a0 >= 5) ^ (l0 >= 5)));
        if (!a_cp || !l_cp) {
            int uni = !a_cp ? UNI(l0, l1) : UNI(a0, a1);
            if (!uni) return 1;
            return 3 + (!((a0 >= 5) ^ (l0 >= 5)));
        }
        {
            int a_uni = UNI(a0, a1), l_uni = UNI(l0, l1);
            if (!a_uni && !l_uni) return 0;
            if (!a_uni || !l_uni) return 2;
            return 3 + ((a0 == 5) == (l0 == 5));
        }
    }
    if (ha || hl) {
        int e_in, e_cp, e0, e1;
        if (ha) RINFO(r - 1, c4, e_in, e_cp, e0, e1);
        else RINFO(r, c4 - 1, e_in, e_cp, e0, e1);
        if (!e_in || !e_cp) return 2;
        return 4 * UNI(e0, e1);
    }
    return 2;
#undef RINFO
#undef UNI
}

/* compound ref coding for our (LAST, ALTREF) pair: comp_ref_type=BIDIR,
 * comp_ref p=0 p1=0, comp_bwdref p=1 */
static double cost_comp_refs_last_alt(TpuCommit *c, int r, int c4) {
    InterCdfs *ic = c->ic;
    int cnt[8];
    neighbor_ref_counts(c, r, c4, cnt);
    return tpu_sym_cost_bits(
               ic->comp_ref_type + comp_ref_type_ctx_c(c, r, c4) * 3, 1) +
           tpu_sym_cost_bits(
               ic->comp_ref +
                   (ctx3(cnt[1] + cnt[2], cnt[3] + cnt[4]) * 3 + 0) * 3,
               0) +
           tpu_sym_cost_bits(
               ic->comp_ref + (ctx3(cnt[1], cnt[2]) * 3 + 1) * 3, 0) +
           tpu_sym_cost_bits(
               ic->comp_bwdref +
                   (ctx3(cnt[5] + cnt[6], cnt[7]) * 2 + 0) * 3,
               1);
}

static void write_comp_refs_last_alt(TpuCommit *c, int r, int c4) {
    InterCdfs *ic = c->ic;
    int cnt[8];
    neighbor_ref_counts(c, r, c4, cnt);
    tpuec_symbol(c->ec, 1,
                 ic->comp_ref_type + comp_ref_type_ctx_c(c, r, c4) * 3, 2,
                 1);
    tpuec_symbol(c->ec, 0,
                 ic->comp_ref +
                     (ctx3(cnt[1] + cnt[2], cnt[3] + cnt[4]) * 3 + 0) * 3,
                 2, 1);
    tpuec_symbol(c->ec, 0,
                 ic->comp_ref + (ctx3(cnt[1], cnt[2]) * 3 + 1) * 3, 2, 1);
    tpuec_symbol(c->ec, 1,
                 ic->comp_bwdref +
                     (ctx3(cnt[5] + cnt[6], cnt[7]) * 2 + 0) * 3,
                 2, 1);
}

/* av1_mode_context_analyzer compound mapping */
static int compound_mode_ctx_c(int mode_context) {
    static const int map[3][5] = {
        {0, 1, 1, 1, 1}, {1, 2, 3, 4, 4}, {4, 4, 5, 6, 7}};
    int newmv_ctx = mode_context & 7;
    int refmv_ctx = (mode_context >> 4) & 15;
    return map[refmv_ctx >> 1][newmv_ctx < 4 ? newmv_ctx : 4];
}

/* ---- inter block encode ------------------------------------------------ */
static __thread int32_t i_pred_y[64 * 64], i_resid_y[64 * 64];
static __thread int32_t i_pred_u[32 * 32], i_pred_v[32 * 32];
static __thread TxTrial i_ty, i_tu, i_tv;

/* Motion-compensated luma SSE of a candidate MV (trial preds kept) */
static void mc_luma(TpuCommit *c, int r, int c4, int size, int mvr, int mvc,
                    int32_t *out) {
    /* MC clamp bounds are the DISPLAY dims (spec 7.11.3.2 lastX/lastY);
     * srefp = the block's ACTIVE single reference (LAST or GOLDEN) */
    tpui_mc_block(c->srefp[0], c->sref_stride[0], c->width, c->height,
                  c4 * 4, r * 4, size, size, mvc * 2, mvr * 2, c->bd, out);
}

static long sad_luma(TpuCommit *c, int r, int c4, int size,
                     const int32_t *pred) {
    const uint16_t *sp = c->src[0];
    int ss = c->sstride[0];
    long sad = 0;
    for (int i = 0; i < size; i++)
        for (int j = 0; j < size; j++) {
            long d = (long)sp[(r * 4 + i) * ss + c4 * 4 + j] -
                     pred[i * size + j];
            sad += d < 0 ? -d : d;
        }
    return sad;
}

static long sse_luma(TpuCommit *c, int r, int c4, int size,
                     const int32_t *pred) {
    const uint16_t *sp = c->src[0];
    int ss = c->sstride[0];
    long sse = 0;
    for (int i = 0; i < size; i++)
        for (int j = 0; j < size; j++) {
            long d = (long)sp[(r * 4 + i) * ss + c4 * 4 + j] -
                     pred[i * size + j];
            sse += d * d;
        }
    return sse;
}

/* switchable interp filter context (spec read_mb_interp_filter ctx;
 * mirrors inter/mvref.interp_filter_ctx, dir 0 / dual_filter off) */
static int interp_filter_ctx_c(TpuCommit *c, int r, int c4, int ref,
                               int is_comp) {
    InterGrid *g = c->grid;
    int ctx = is_comp * 4;
    int lt = 3, at = 3;
    if (c4 > c->t_mi_col0) {
        size_t o = (size_t)r * g->mi_cols + (c4 - 1);
        if (g->ref0[o] == ref || g->ref1[o] == ref) lt = g->filt[o];
    }
    if (r > c->t_mi_row0) {
        size_t o = (size_t)(r - 1) * g->mi_cols + c4;
        if (g->ref0[o] == ref || g->ref1[o] == ref) at = g->filt[o];
    }
    if (lt == at) return ctx + lt;
    if (lt == 3) return ctx + at;
    if (at == 3) return ctx + lt;
    return ctx + 3;
}

/* Single-ref MC against the SECOND reference (ALTREF recon) */
static void mc_luma2(TpuCommit *c, int r, int c4, int size, int mvr,
                     int mvc, int32_t *out) {
    tpui_mc_block(c->ref2p[0], c->ref2_stride[0], c->width, c->height,
                  c4 * 4, r * 4, size, size, mvc * 2, mvr * 2, c->bd, out);
}

/* Compound average prediction, luma (CONV_BUF parts + blend) */
static void mc_comp_luma(TpuCommit *c, int r, int c4, int size, int mv0r,
                         int mv0c, int mv1r, int mv1c, int32_t *out) {
    static __thread int32_t p0[64 * 64], p1[64 * 64];
    mc_comp_part(c->refp[0], c->ref_stride[0], c->width, c->height,
                 c4 * 4, r * 4, size, size, mv0c * 2, mv0r * 2, c->bd, p0);
    mc_comp_part(c->ref2p[0], c->ref2_stride[0], c->width, c->height,
                 c4 * 4, r * 4, size, size, mv1c * 2, mv1r * 2, c->bd, p1);
    blend_comp_avg(p0, p1, size * size, c->bd, out);
}

/* Compound average prediction, one chroma plane */
static void mc_comp_chroma(TpuCommit *c, int plane, int cr, int cc, int cw,
                           int chh, int mv0r, int mv0c, int mv1r, int mv1c,
                           int32_t *out) {
    static __thread int32_t p0[32 * 32], p1[32 * 32];
    int pw = (c->width + 1) >> 1, ph = (c->height + 1) >> 1;
    mc_comp_part(c->refp[plane], c->ref_stride[plane], pw, ph, cc * 4,
                 cr * 4, cw, chh, mv0c, mv0r, c->bd, p0);
    mc_comp_part(c->ref2p[plane], c->ref2_stride[plane], pw, ph, cc * 4,
                 cr * 4, cw, chh, mv1c, mv1r, c->bd, p1);
    blend_comp_avg(p0, p1, cw * chh, c->bd, out);
}

/* neighbor inter-block width in px for the intra tx-depth ctx
 * (libaom get_tx_size_context is_inter override: inter neighbors
 * contribute their BLOCK dims, not the txfm-context rows). Returns 0
 * when the mi is not inter. */
int tpui_grid_inter_bw(InterGrid *g, int r, int c) {
    if (!g || r < 0 || c < 0 || r >= g->mi_rows || c >= g->mi_cols)
        return 0;
    size_t o = (size_t)r * g->mi_cols + c;
    if (g->ref0[o] <= 0) return 0;
    return BW4[g->bsize[o]] * 4;
}

int tpui_grid_inter_bh(InterGrid *g, int r, int c) {
    if (!g || r < 0 || c < 0 || r >= g->mi_rows || c >= g->mi_cols)
        return 0;
    size_t o = (size_t)r * g->mi_cols + c;
    if (g->ref0[o] <= 0) return 0;
    return BH4[g->bsize[o]] * 4;
}

/* txfm_partition ctx (behavioral twin of entropy/tile_writer
 * _txfm_split_ctx; ref entropy_coding.c:4367). Square tx only (the
 * walk's blocks/tx units are square). */
static int txfm_split_ctx_c(TpuCommit *c, int r, int c4, int size,
                            int ts) {
    int above = c->above_txw[c4] < TXW[ts];
    int left = c->left_txh[r] < TXH[ts];
    int max_tx = size == 64 ? 4 : size == 32 ? 3 : size == 16 ? 2
                 : size == 8 ? 1 : 0;
    /* square ts: TX_SIZE_SQR_UP[ts] == ts */
    int cat = (ts != max_tx && max_tx > 1) + (4 - max_tx) * 2;
    return cat * 3 + above + left;
}

/* Encode one P/B-frame leaf block (inter-vs-intra decision inside;
 * compound LAST+ALTREF candidates when a second ref is attached). */
static void encode_block_p(TpuCommit *c, int r, int c4, int size,
                           const uint8_t *icand, const int16_t *mv16,
                           const int16_t *mv16b, int mv16_cols, int q,
                           int *dq_pending, int *prev_q, int dq_res_log2) {
    InterCdfs *ic = c->ic;
    int ts_y = tpu_sq_tx(size);
    int ts_c = tpu_uv_tx(size);
    int cr = r >> 1, cc = c4 >> 1;
    int bsize = tpu_sq_bsize(size);
    int w4 = size / 4;

    /* MRP: pick this block's ACTIVE single reference (LAST by default,
     * GOLDEN where the device HME SAD map prefers it — the ME-SAD ref
     * pruning model of ref motion_estimation.c:1615). The choice is
     * made once per block, before any prediction state is touched. */
    for (int p = 0; p < 3; p++) {
        c->srefp[p] = c->refp[p];
        c->sref_stride[p] = c->ref_stride[p];
    }
    c->sref_frame = 1;
    int gm_r = c->gm_mv[0], gm_c = c->gm_mv[1];
    if (c->gm_wp_ok)
        gm_block_mv_c(c, r, c4, w4, &gm_r, &gm_c);
    int gmb_last_r = gm_r, gmb_last_c = gm_c;  /* LAST per-block gm mv
                                                  (compound list needs
                                                  it after sref switch) */
    const int16_t *seed16 = mv16;
    if (c->ref_sel) {
        int cell = (r >> 2) * c->ref_sel_cols + (c4 >> 2);
        int sel = c->ref_sel[cell];
        if (sel == 1 && c->has_ref3) {
            c->sref_frame = 4;
            for (int p = 0; p < 3; p++) {
                c->srefp[p] = c->ref3p[p];
                c->sref_stride[p] = c->ref3_stride[p];
            }
            gm_r = gm_c = 0;          /* GOLDEN gm is IDENTITY */
            if (c->mv16g) seed16 = c->mv16g;
        } else if (sel == 2 && c->ref2p[0] && mv16b) {
            /* ALTREF single reference: the future anchor predicts
             * content the past refs cannot see (occlusion uncover;
             * ref pd_process.c RA ref lists carry BWD/ALT roles) */
            c->sref_frame = 7;
            for (int p = 0; p < 3; p++) {
                c->srefp[p] = c->ref2p[p];
                c->sref_stride[p] = c->ref2_stride[p];
            }
            gm_r = gm_c = 0;          /* bwd-ref gm is IDENTITY */
            seed16 = mv16b;
        }
    }

    TplArgs tplbuf, *tplp = NULL;
    if (c->tpl_mv) {
        tplbuf.mv = c->tpl_mv;
        tplbuf.off = c->tpl_off;
        tplbuf.valid = c->tpl_valid;
        tplbuf.n8r = c->tpl_n8r;
        tplbuf.n8c = c->tpl_n8c;
        tplbuf.cur_off0 = c->tpl_cur_off[c->sref_frame];
        tplbuf.cur_off1 = c->tpl_cur_off[7];   /* ALTREF (compound) */
        tplbuf.allow_hp = c->tpl_allow_hp;
        tplp = &tplbuf;
    }
    MvRefsC refs;
    tpui_ref_mv_list(c->grid, r, c4, bsize, c->sref_frame, 16,
                     c->t_mi_row0, c->t_mi_row1, c->t_mi_col0,
                     c->t_mi_col1, gm_r, gm_c, -1, 0, 0, c->sign_bias,
                     tplp, &refs,
                     c->gm_wp_ok && c->sref_frame == 1, 0);
    int near0r = refs.mv[0][0], near0c = refs.mv[0][1];
    lower_precision_hp(c, &near0r, &near0c);

    /* candidate list: (mode, mvr, mvc, drl) */
    int cm[6][4];
    int ncand = 0;
    cm[ncand][0] = 0; cm[ncand][1] = near0r; cm[ncand][2] = near0c;
    cm[ncand][3] = 0; ncand++;
    if (refs.n_found >= 2) {
        int m1r = refs.mv[1][0], m1c = refs.mv[1][1];
        lower_precision_hp(c, &m1r, &m1c);
        if (m1r != near0r || m1c != near0c) {
            cm[ncand][0] = 1; cm[ncand][1] = m1r; cm[ncand][2] = m1c;
            cm[ncand][3] = 0; ncand++;
        }
    }
    {
        /* GLOBALMV candidate: this ref's (precision-lowered) global MV —
         * the zero-MV mode under identity gm (spec 7.10.2.1) */
        int gmr = gm_r, gmc = gm_c;
        int dup = 0;
        for (int i = 0; i < ncand; i++)
            if (cm[i][1] == gmr && cm[i][2] == gmc) dup = 1;
        if (!dup) {
            cm[ncand][0] = 2; cm[ncand][1] = gmr; cm[ncand][2] = gmc;
            cm[ncand][3] = 0; ncand++;
        }
    }
    /* NEWMV: device seed, fullpel already; subpel refine by luma SAD.
     * Gated: skip the diamond when NEARESTMV already predicts well
     * (ref enc_mode_config ME skip levels). */
    static __thread int32_t near_pred[64 * 64];
    mc_luma(c, r, c4, size, near0r, near0c, near_pred);
    long near_sad = sad_luma(c, r, c4, size, near_pred);
    if (near_sad > (long)size * size * 2) {
        int cell_r = (r * 4) / 16, cell_c = (c4 * 4) / 16;
        int seedr = seed16[(cell_r * mv16_cols + cell_c) * 2] * 8;
        int seedc = seed16[(cell_r * mv16_cols + cell_c) * 2 + 1] * 8;
        static __thread int32_t tmp_pred[64 * 64];
        int bestr = seedr, bestc = seedc;
        mc_luma(c, r, c4, size, bestr, bestc, tmp_pred);
        long best_sad = sad_luma(c, r, c4, size, tmp_pred);
        for (int step = 8; step >= (c->tpl_allow_hp ? 1 : 2);
             step >>= 1) {
            /* the eighth-pel tail must BUY its hp bits: pure-SAD
             * acceptance at step 1 takes moves whose gain is below the
             * MV-rate cost (the reference's subpel search is RD-aware,
             * ref mcomp.c) */
            long margin = step == 1 ? (long)size : 0;
            int improved = 1;
            int iters = 0;
            while (improved && iters++ < 3) {
                improved = 0;
                static const int D[4][2] = {{-1, 0}, {1, 0}, {0, -1},
                                            {0, 1}};
                for (int k = 0; k < 4; k++) {
                    int mr = bestr + D[k][0] * step;
                    int mc2 = bestc + D[k][1] * step;
                    mc_luma(c, r, c4, size, mr, mc2, tmp_pred);
                    long s = sad_luma(c, r, c4, size, tmp_pred);
                    if (s + margin < best_sad) {
                        best_sad = s;
                        bestr = mr;
                        bestc = mc2;
                        improved = 1;
                    }
                }
            }
        }
        cm[ncand][0] = 3; cm[ncand][1] = bestr; cm[ncand][2] = bestc;
        cm[ncand][3] = 0; ncand++;
    }

    /* common inter rate: is_inter bit + [comp_inter bit] + ref tree */
    int ii_ctx = intra_inter_ctx_of(c, r, c4);
    int comp_ok = c->has_ref2 && size >= 8;
    double comp_bit0 = 0.0, comp_bit1 = 0.0;
    if (comp_ok) {
        int rm_ctx = reference_mode_ctx_c(c, r, c4);
        comp_bit0 = tpu_sym_cost_bits(ic->comp_inter + rm_ctx * 3, 0);
        comp_bit1 = tpu_sym_cost_bits(ic->comp_inter + rm_ctx * 3, 1);
    }
    double inter_base_rate =
        tpu_sym_cost_bits(ic->intra_inter + ii_ctx * 3, 1) + comp_bit0 +
        cost_single_ref(c, r, c4, c->sref_frame);
    double intra_base_rate =
        tpu_sym_cost_bits(ic->intra_inter + ii_ctx * 3, 0);

    int sgn_y = tpu_dc_sign_ctx(c, 0, r, c4, ts_y);
    static __thread int32_t cand_preds[4][64 * 64];
    static __thread int32_t cand_resid[64 * 64];
    static __thread TxTrial cand_trial;
    /* MC once per candidate; SAD pre-rank keeps the best 2 for the full
     * trial (md_stage_0 -> md_stage_3 funnel) */
    IPROF_BEGIN;
    long cand_sad[6];
    if (ncand > 4) ncand = 4;
    int glob_warp_ok = c->gm_wp_ok && c->sref_frame == 1;
    WarpParams gwp;
    if (glob_warp_ok) {
        for (int k = 0; k < 6; k++) gwp.mat[k] = c->gm_wp_mat[k];
        gwp.alpha = c->gm_wp_shear[0];
        gwp.beta = c->gm_wp_shear[1];
        gwp.gamma = c->gm_wp_shear[2];
        gwp.delta = c->gm_wp_shear[3];
    }
    for (int i = 0; i < ncand; i++) {
        if (i == 0) {
            memcpy(cand_preds[0], near_pred,
                   sizeof(int32_t) * size * size);
            cand_sad[0] = near_sad;
            continue;
        }
        if (cm[i][0] == 2 && glob_warp_ok)
            /* GLOBALMV under ROTZOOM: the warp filter IS the
             * prediction (spec 7.11.3.2 globalValid) */
            warp_plane_c(&gwp, c->srefp[0], c->sref_stride[0], c->width,
                         c->height, c4 * 4, r * 4, size, size, 0, 0,
                         c->bd, cand_preds[i]);
        else
            mc_luma(c, r, c4, size, cm[i][1], cm[i][2], cand_preds[i]);
        cand_sad[i] = sad_luma(c, r, c4, size, cand_preds[i]);
    }
    int pruned[6] = {0};
    if (ncand > 2) {
        long order[6];
        memcpy(order, cand_sad, sizeof(order));
        for (int keep = 0; keep < 2; keep++) {
            int bi = -1;
            for (int i = 0; i < ncand; i++)
                if (!pruned[i] && order[i] >= 0 &&
                    (bi < 0 || order[i] < order[bi]))
                    bi = i;
            if (bi >= 0) order[bi] = -1;   /* mark kept */
        }
        for (int i = 0; i < ncand; i++) pruned[i] = order[i] >= 0;
    }
    /* md_stage_0 margin cut: the runner-up only gets the full trial
     * within 12.5% of the best SAD (the reference's class pruning
     * thresholds; beyond that the trial never wins) */
    {
        long bs0 = -1;
        for (int i = 0; i < ncand; i++)
            if (!pruned[i] && cand_sad[i] >= 0 &&
                (bs0 < 0 || cand_sad[i] < bs0))
                bs0 = cand_sad[i];
        for (int i = 1; i < ncand; i++)   /* NEAREST (0) keeps its
                                             trial: it is the skip path */
            if (!pruned[i] && cand_sad[i] > bs0 + (bs0 >> 3))
                pruned[i] = 1;
    }
    double best_cost = -1.0;
    int best_mode = 0, best_mvr = 0, best_mvc = 0, best_drl = 0;
    int best_i = 0;
    for (int i = 0; i < ncand; i++) {
        if (pruned[i]) continue;
        int mode = cm[i][0], mvr = cm[i][1], mvc = cm[i][2];
        const int32_t *cand_pred = cand_preds[i];
        const uint16_t *sp = c->src[0];
        int ss = c->sstride[0];
        for (int y = 0; y < size; y++)
            for (int x = 0; x < size; x++)
                cand_resid[y * size + x] =
                    (int32_t)sp[(r * 4 + y) * ss + c4 * 4 + x] -
                    cand_pred[y * size + x];
        tpu_trial_txb(c, 0, ts_y, 0, cand_resid, q, 0, sgn_y, 1,
                      &cand_trial);
        /* mode bits */
        int newmv_ctx = refs.mode_context & 7;
        int zeromv_ctx = (refs.mode_context >> 3) & 1;
        int refmv_ctx = (refs.mode_context >> 4) & 15;
        double rate = tpu_sym_cost_bits(ic->newmv + newmv_ctx * 3,
                                        mode != 3);
        if (mode != 3) {
            rate += tpu_sym_cost_bits(ic->zeromv + zeromv_ctx * 3,
                                      mode != 2);
            if (mode != 2)
                rate += tpu_sym_cost_bits(ic->refmv + refmv_ctx * 3,
                                          mode != 0);
        }
        if (mode == 3) {
            int pr = refs.mv[0][0], pc = refs.mv[0][1];
            lower_precision_hp(c, &pr, &pc);
            rate += cost_mv(c, mvr, mvc, pr, pc);
            if (refs.n_found > 1)
                rate += tpu_sym_cost_bits(
                    ic->drl + tpui_drl_ctx(&refs, 0) * 3, 0);
        }
        if (mode == 1 && refs.n_found > 2)
            rate += tpu_sym_cost_bits(ic->drl + tpui_drl_ctx(&refs, 1) * 3,
                                      0);
        double cost = tpu_dist_eval(c, ts_y, cand_pred, cand_resid,
                                    &cand_trial) +
                      c->rdmult * (rate + cand_trial.rate512 / 512.0);
        if (best_cost < 0 || cost < best_cost) {
            best_cost = cost;
            best_mode = mode;
            best_mvr = mvr;
            best_mvc = mvc;
            best_drl = cm[i][3];
            best_i = i;
            i_ty = cand_trial;
        }
        if (i == 0 && cand_trial.eob == 0) break;  /* NEAREST already skips */
    }
    memcpy(i_pred_y, cand_preds[best_i], sizeof(int32_t) * size * size);
    best_cost += c->rdmult * inter_base_rate;

    /* interpolation filter search (ref interpolation_filter_search):
     * tail-search on the winner's luma pred, pred-domain SSE + symbol
     * rate; fullpel MVs keep REGULAR. GLOBALMV under identity gm does
     * not code the filter (is_nontrans_global_motion). */
    int best_filt = 0;
    int filt_coded = c->switchable_filter &&
                     !(best_mode == 2 &&
                       !(c->sref_frame == 1 && c->gm_coded));
    /* i_ty.eob gate: with a zero-residual winner the filter choice
     * cannot change the coded block (pred-domain SSE differences are
     * below the quantizer); REGULAR is coded for free */
    if (filt_coded && i_ty.eob && (((best_mvr | best_mvc) & 7) != 0)) {
        int fctx = interp_filter_ctx_c(c, r, c4, c->sref_frame, 0);
        const uint16_t *fcdf = ic->switchable_interp + fctx * 4;
        static __thread int32_t fpred[64 * 64];
        double best_fc = 0.0;
        for (int f = 0; f < 3; f++) {
            const int32_t *pp = i_pred_y;
            if (f) {
                mc_block_f(c->srefp[0], c->sref_stride[0], c->width,
                           c->height, c4 * 4, r * 4, size, size,
                           best_mvc * 2, best_mvr * 2, c->bd, f, f,
                           fpred);
                pp = fpred;
            }
            double cost = (double)sse_luma(c, r, c4, size, pp) +
                          c->rdmult * tpu_sym_cost_bits(fcdf, f);
            if (f == 0 || cost < best_fc) {
                best_fc = cost;
                best_filt = f;
            }
        }
        if (best_filt) {
            mc_block_f(c->srefp[0], c->sref_stride[0], c->width, c->height,
                       c4 * 4, r * 4, size, size, best_mvc * 2,
                       best_mvr * 2, c->bd, best_filt, best_filt,
                       i_pred_y);
            const uint16_t *sp = c->src[0];
            int ss = c->sstride[0];
            for (int y = 0; y < size; y++)
                for (int x = 0; x < size; x++)
                    cand_resid[y * size + x] =
                        (int32_t)sp[(r * 4 + y) * ss + c4 * 4 + x] -
                        i_pred_y[y * size + x];
            tpu_trial_txb(c, 0, ts_y, 0, cand_resid, q, 0, sgn_y, 1,
                          &i_ty);
        }
    }

    /* chroma for the inter winner */
    {
        int cw = TXW[ts_c], chh = TXH[ts_c];
        if (best_mode == 2 && glob_warp_ok && size >= 16) {
            /* global warp chroma (>= 8x8 planes; 8x8 luma keeps the
             * translational chroma below — do_warp plane-dims gate) */
            warp_plane_c(&gwp, c->srefp[1], c->sref_stride[1],
                         (c->width + 1) >> 1, (c->height + 1) >> 1,
                         cc * 4, cr * 4, cw, chh, 1, 1, c->bd, i_pred_u);
            warp_plane_c(&gwp, c->srefp[2], c->sref_stride[2],
                         (c->width + 1) >> 1, (c->height + 1) >> 1,
                         cc * 4, cr * 4, cw, chh, 1, 1, c->bd, i_pred_v);
        } else {
        mc_block_f(c->srefp[1], c->sref_stride[1], (c->width + 1) >> 1,
                   (c->height + 1) >> 1, cc * 4, cr * 4, cw, chh,
                   best_mvc, best_mvr, c->bd, best_filt, best_filt,
                   i_pred_u);
        mc_block_f(c->srefp[2], c->sref_stride[2], (c->width + 1) >> 1,
                   (c->height + 1) >> 1, cc * 4, cr * 4, cw, chh,
                   best_mvc, best_mvr, c->bd, best_filt, best_filt,
                   i_pred_v);
        }
        static __thread int32_t ru[32 * 32], rv[32 * 32];
        const uint16_t *su = c->src[1], *sv = c->src[2];
        int ss = c->sstride[1];
        for (int y = 0; y < chh; y++)
            for (int x = 0; x < cw; x++) {
                int off = (cr * 4 + y) * ss + cc * 4 + x;
                ru[y * cw + x] = (int32_t)su[off] - i_pred_u[y * cw + x];
                rv[y * cw + x] = (int32_t)sv[off] - i_pred_v[y * cw + x];
            }
        int sgn_u = tpu_dc_sign_ctx(c, 1, cr, cc, ts_c);
        int sgn_v = tpu_dc_sign_ctx(c, 2, cr, cc, ts_c);
        tpu_trial_txb(c, 1, ts_c, 0, ru, q, 1, sgn_u, 1, &i_tu);
        tpu_trial_txb(c, 2, ts_c, 0, rv, q, 1, sgn_v, 1, &i_tv);
        best_cost += (double)(i_tu.sse + i_tv.sse) +
                     c->rdmult * ((i_tu.rate512 + i_tv.rate512) / 512.0);
    }

    /* fast-skip gate (the reference's MD class pruning role): a
     * NEAREST winner whose luma+chroma residual quantizes to nothing
     * is a coded skip — NEAR/NEW/masked/II/OBMC searches cannot beat
     * it by more than their own symbol costs. Only the skip_mode
     * shortcut (fewer bits for the same prediction) remains worth
     * evaluating, through a light compound branch below. */
    int fast_skip = best_mode == 0 && i_ty.eob == 0 && i_tu.eob == 0 &&
                    i_tv.eob == 0;
    { const char *e = getenv("SVT_NO_FAST_SKIP"); if (e && *e == '1') fast_skip = 0; }

    IPROF_MARK(8);
    /* compound (LAST + ALTREF) candidates: NEAREST_NEARESTMV /
     * NEAR_NEARMV / NEW_NEWMV with average blend; plus the skip_mode
     * shortcut (one symbol codes refs+mode+mvs+skip). Evaluated
     * against the single-ref winner incl. chroma. */
    MvRefsC crefs;
    int use_comp = 0, use_sm = 0;
    int comp_cm = 0, cmv0r = 0, cmv0c = 0, cmv1r = 0, cmv1c = 0;
    int comp_masked_type = 0;       /* 0 avg, 1 wedge, 2 diffwtd */
    int comp_wedge_idx = 0, comp_wedge_sign = 0, comp_mask_type = 0;
    if (comp_ok) {
        IPROF_BEGIN;
        /* the compound pair is always (LAST, ALTREF): its temporal-MVP
         * offsets must use LAST's distance even when the block's single
         * trial runs on GOLDEN */
        TplArgs ctplbuf, *ctplp = NULL;
        if (c->tpl_mv) {
            ctplbuf = tplbuf;
            ctplbuf.cur_off0 = c->tpl_cur_off[1];
            ctplp = &ctplbuf;
        }
        tpui_ref_mv_list(c->grid, r, c4, bsize, 1, 16, c->t_mi_row0,
                         c->t_mi_row1, c->t_mi_col0, c->t_mi_col1,
                         gmb_last_r, gmb_last_c, 7, 0, 0, c->sign_bias,
                         ctplp, &crefs, c->gm_wp_ok, 0);
        int cc_cm[3], cc_mv[3][4], ncc = 0;
        {
            int m0r = crefs.mv[0][0], m0c = crefs.mv[0][1];
            int m1r = crefs.mv2[0][0], m1c = crefs.mv2[0][1];
            lower_precision_hp(c, &m0r, &m0c);
            lower_precision_hp(c, &m1r, &m1c);
            cc_cm[ncc] = 0;                      /* NEAREST_NEARESTMV */
            cc_mv[ncc][0] = m0r; cc_mv[ncc][1] = m0c;
            cc_mv[ncc][2] = m1r; cc_mv[ncc][3] = m1c;
            ncc++;
            if (!fast_skip && crefs.n >= 2) {
                int n0r = crefs.mv[1][0], n0c = crefs.mv[1][1];
                int n1r = crefs.mv2[1][0], n1c = crefs.mv2[1][1];
                lower_precision_hp(c, &n0r, &n0c);
                lower_precision_hp(c, &n1r, &n1c);
                if (n0r != m0r || n0c != m0c || n1r != m1r ||
                    n1c != m1c) {
                    cc_cm[ncc] = 1;              /* NEAR_NEARMV */
                    cc_mv[ncc][0] = n0r; cc_mv[ncc][1] = n0c;
                    cc_mv[ncc][2] = n1r; cc_mv[ncc][3] = n1c;
                    ncc++;
                }
            }
        }
        if (!fast_skip && mv16b) {
            /* NEW_NEWMV: comp0 = single-ref winner MV, comp1 = device
             * HME seed on the second ref refined by SAD diamond */
            int cell_r = (r * 4) / 16, cell_c = (c4 * 4) / 16;
            int b1r = mv16b[(cell_r * mv16_cols + cell_c) * 2] * 8;
            int b1c = mv16b[(cell_r * mv16_cols + cell_c) * 2 + 1] * 8;
            static __thread int32_t tmp2[64 * 64];
            mc_luma2(c, r, c4, size, b1r, b1c, tmp2);
            long bs2 = sad_luma(c, r, c4, size, tmp2);
            /* the seed comes from the device HME refined on ref2
             * already: a fullpel step-8 stage re-walks what the seed
             * covers (measured: mc_compound is the walk's largest
             * bucket) — start at step 4 */
            for (int step = 4; step >= (c->tpl_allow_hp ? 1 : 2);
             step >>= 1) {
                int improved = 1, iters = 0;
                while (improved && iters++ < 2) {
                    improved = 0;
                    static const int D[4][2] = {{-1, 0}, {1, 0}, {0, -1},
                                                {0, 1}};
                    for (int k = 0; k < 4; k++) {
                        int mr = b1r + D[k][0] * step;
                        int mc2 = b1c + D[k][1] * step;
                        mc_luma2(c, r, c4, size, mr, mc2, tmp2);
                        long s = sad_luma(c, r, c4, size, tmp2);
                        if (s < bs2) {
                            bs2 = s;
                            b1r = mr;
                            b1c = mc2;
                            improved = 1;
                        }
                    }
                }
            }
            cc_cm[ncc] = 7;                      /* NEW_NEWMV */
            cc_mv[ncc][0] = best_mvr; cc_mv[ncc][1] = best_mvc;
            cc_mv[ncc][2] = b1r; cc_mv[ncc][3] = b1c;
            ncc++;
        }
        double comp_base =
            tpu_sym_cost_bits(ic->intra_inter + ii_ctx * 3, 1) +
            comp_bit1 + cost_comp_refs_last_alt(c, r, c4);
        int cm_ctx = compound_mode_ctx_c(crefs.mode_context);
        static __thread int32_t comp_pred[64 * 64];
        static __thread int32_t best_comp_pred[64 * 64];
        static __thread TxTrial cmp_ty;
        double cbest = -1.0;
        int cbi = -1;
        long cb_predsse = 0;
        /* md_stage_0 funnel for the compound candidates: rank by
         * prediction-domain SSE + mode/MV rate (the MC runs anyway)
         * and run the FULL transform trial only for the winner — the
         * per-candidate mode rates differ by whole symbols, so the
         * rate term keeps NEW_NEWMV honest about its MV cost */
        double cand_rate[3];
        if (fast_skip) {
            /* light branch: NEAREST_NEAREST prediction only, no
             * transform trials — feeds the skip_mode comparison */
            mc_comp_luma(c, r, c4, size, cc_mv[0][0], cc_mv[0][1],
                         cc_mv[0][2], cc_mv[0][3], best_comp_pred);
            const uint16_t *sp = c->src[0];
            int ss = c->sstride[0];
            long predsse = 0;
            for (int y = 0; y < size; y++)
                for (int x = 0; x < size; x++) {
                    int d = (int)sp[(r * 4 + y) * ss + c4 * 4 + x] -
                            best_comp_pred[y * size + x];
                    predsse += (long)d * d;
                }
            cbi = 0;
            cb_predsse = predsse;
        } else {
            double pbest = -1.0;
            for (int i = 0; i < ncc; i++) {
                mc_comp_luma(c, r, c4, size, cc_mv[i][0], cc_mv[i][1],
                             cc_mv[i][2], cc_mv[i][3], comp_pred);
                const uint16_t *sp = c->src[0];
                int ss = c->sstride[0];
                long predsse = 0;
                for (int y = 0; y < size; y++)
                    for (int x = 0; x < size; x++) {
                        int d = (int)sp[(r * 4 + y) * ss + c4 * 4 + x] -
                                comp_pred[y * size + x];
                        predsse += (long)d * d;
                    }
                double rate = tpu_sym_cost_bits(
                    ic->inter_compound_mode + cm_ctx * 9, cc_cm[i]);
                if (cc_cm[i] == 7) {
                    if (crefs.n_found > 1)
                        rate += tpu_sym_cost_bits(
                            ic->drl + tpui_drl_ctx(&crefs, 0) * 3, 0);
                    int p0r = crefs.mv[0][0], p0c = crefs.mv[0][1];
                    int p1r = crefs.mv2[0][0], p1c = crefs.mv2[0][1];
                    lower_precision_hp(c, &p0r, &p0c);
                    lower_precision_hp(c, &p1r, &p1c);
                    rate += cost_mv(c, cc_mv[i][0], cc_mv[i][1], p0r,
                                    p0c);
                    rate += cost_mv(c, cc_mv[i][2], cc_mv[i][3], p1r,
                                    p1c);
                } else if (cc_cm[i] == 1 && crefs.n_found > 2) {
                    rate += tpu_sym_cost_bits(
                        ic->drl + tpui_drl_ctx(&crefs, 1) * 3, 0);
                }
                cand_rate[i] = rate;
                double pcost = (double)predsse + c->rdmult * rate;
                if (pbest < 0 || pcost < pbest) {
                    pbest = pcost;
                    cbi = i;
                    cb_predsse = predsse;
                }
            }
        }
        if (!fast_skip) {
            mc_comp_luma(c, r, c4, size, cc_mv[cbi][0], cc_mv[cbi][1],
                         cc_mv[cbi][2], cc_mv[cbi][3], comp_pred);
            const uint16_t *sp = c->src[0];
            int ss = c->sstride[0];
            for (int y = 0; y < size; y++)
                for (int x = 0; x < size; x++)
                    cand_resid[y * size + x] =
                        (int)sp[(r * 4 + y) * ss + c4 * 4 + x] -
                        comp_pred[y * size + x];
            tpu_trial_txb(c, 0, ts_y, 0, cand_resid, q, 0, sgn_y, 1,
                          &cand_trial);
            cbest = tpu_dist_eval(c, ts_y, comp_pred, cand_resid,
                                  &cand_trial) +
                    c->rdmult * (cand_rate[cbi] +
                                 cand_trial.rate512 / 512.0);
            cmp_ty = cand_trial;
            memcpy(best_comp_pred, comp_pred,
                   sizeof(int32_t) * size * size);
        }
        IPROF_MARK(9);
        /* masked compound refinement on the avg winner (spec 7.11.3.11:
         * wedge from the normative tables, DIFFWTD from the d16 comps;
         * ref compound_type RD in enc_inter_prediction.c). Pred-domain
         * SSE pre-selects one candidate for the full TX trial, and the
         * comp_group_idx syntax rates keep the comparison fair. */
        static __thread int32_t cp0[64 * 64], cp1[64 * 64];
        static __thread int32_t mbest_pred[64 * 64];
        static __thread uint8_t dwmask[2][64 * 64];
        const uint8_t *msk_luma = NULL;
        if (!fast_skip && c->masked_comp && cmp_ty.eob) {
            mc_comp_part(c->refp[0], c->ref_stride[0], c->width,
                         c->height, c4 * 4, r * 4, size, size,
                         cc_mv[cbi][1] * 2, cc_mv[cbi][0] * 2, c->bd,
                         cp0);
            mc_comp_part(c->ref2p[0], c->ref2_stride[0], c->width,
                         c->height, c4 * 4, r * 4, size, size,
                         cc_mv[cbi][3] * 2, cc_mv[cbi][2] * 2, c->bd,
                         cp1);
            const uint16_t *sp = c->src[0];
            int ssY = c->sstride[0];
            static __thread int32_t mp[64 * 64];
            long msse_best = -1;
            int btype = 0, bidx = 0, bsign = 0, bmt = 0;
            int wt = wedge_tab_of(bsize);
            if (wt >= 0) {
                for (int wi = 0; wi < 16; wi++)
                    for (int sg = 0; sg < 2; sg++) {
                        blend_masked_d16_c(WEDGE_TAB[wt][wi][sg], cp0,
                                           cp1, size * size, c->bd, mp);
                        long sse = 0;
                        for (int y = 0; y < size; y++)
                            for (int x = 0; x < size; x++) {
                                int d = (int)sp[(r * 4 + y) * ssY +
                                                c4 * 4 + x] -
                                        mp[y * size + x];
                                sse += (long)d * d;
                            }
                        if (msse_best < 0 || sse < msse_best) {
                            msse_best = sse;
                            btype = 1;
                            bidx = wi;
                            bsign = sg;
                        }
                    }
            }
            for (int mt = 0; mt < 2; mt++) {
                diffwtd_mask_d16_c(cp0, cp1, size * size, mt, c->bd,
                                   dwmask[mt]);
                blend_masked_d16_c(dwmask[mt], cp0, cp1, size * size,
                                   c->bd, mp);
                long sse = 0;
                for (int y = 0; y < size; y++)
                    for (int x = 0; x < size; x++) {
                        int d = (int)sp[(r * 4 + y) * ssY + c4 * 4 + x] -
                                mp[y * size + x];
                        sse += (long)d * d;
                    }
                if (msse_best < 0 || sse < msse_best) {
                    msse_best = sse;
                    btype = 2;
                    bmt = mt;
                }
            }
            /* full TX trial for the pre-selected masked candidate */
            const uint8_t *mptr = btype == 1 ? WEDGE_TAB[wt][bidx][bsign]
                                             : dwmask[bmt];
            blend_masked_d16_c(mptr, cp0, cp1, size * size, c->bd,
                               mbest_pred);
            for (int y = 0; y < size; y++)
                for (int x = 0; x < size; x++)
                    cand_resid[y * size + x] =
                        (int32_t)sp[(r * 4 + y) * ssY + c4 * 4 + x] -
                        mbest_pred[y * size + x];
            static __thread TxTrial mk_ty;
            tpu_trial_txb(c, 0, ts_y, 0, cand_resid, q, 0, sgn_y, 1,
                          &mk_ty);
            /* avg-blend residual for the tune-3 SSIM comparison */
            static __thread int32_t avg_resid[64 * 64];
            if (c->tune_ssim)
                for (int y = 0; y < size; y++)
                    for (int x = 0; x < size; x++)
                        avg_resid[y * size + x] =
                            (int32_t)sp[(r * 4 + y) * ssY + c4 * 4 + x] -
                            best_comp_pred[y * size + x];
            int cg_ctx = comp_group_ctx_c(c, r, c4);
            const uint16_t *cgcdf = ic->comp_group_idx + cg_ctx * 3;
            double rate_msk = tpu_sym_cost_bits(cgcdf, 1) + 1.0;
            if (wt >= 0)
                rate_msk += tpu_sym_cost_bits(
                    ic->compound_type + bsize * 3, btype - 1);
            if (btype == 1)
                rate_msk += tpu_sym_cost_bits(
                    ic->wedge_idx + bsize * 17, bidx);
            double cost_avg =
                tpu_dist_eval(c, ts_y, best_comp_pred, avg_resid,
                              &cmp_ty) +
                c->rdmult * (cmp_ty.rate512 / 512.0 +
                             tpu_sym_cost_bits(cgcdf, 0));
            double cost_msk =
                tpu_dist_eval(c, ts_y, mbest_pred, cand_resid, &mk_ty) +
                c->rdmult * (mk_ty.rate512 / 512.0 + rate_msk);
            if (cost_msk < cost_avg) {
                comp_masked_type = btype;
                comp_wedge_idx = bidx;
                comp_wedge_sign = bsign;
                comp_mask_type = bmt;
                cmp_ty = mk_ty;
                cbest = cbest - cost_avg + cost_msk;
                msk_luma = mptr;
            } else {
                cbest += c->rdmult * tpu_sym_cost_bits(cgcdf, 0);
            }
        }
        IPROF_MARK(10);
        /* chroma for the compound winner */
        static __thread int32_t cu[32 * 32], cv[32 * 32];
        static __thread TxTrial cmp_tu, cmp_tv;
        long chroma_predsse = 0;
        {
            int cw = TXW[ts_c], chh = TXH[ts_c];
            if (comp_masked_type) {
                static __thread int32_t q0[32 * 32], q1[32 * 32];
                static __thread uint8_t cmsk[32 * 32];
                subsample_mask2_c(msk_luma, size, size, cmsk);
                int pw = (c->width + 1) >> 1, ph = (c->height + 1) >> 1;
                for (int pl = 1; pl < 3; pl++) {
                    mc_comp_part(c->refp[pl], c->ref_stride[pl], pw, ph,
                                 cc * 4, cr * 4, cw, chh, cc_mv[cbi][1],
                                 cc_mv[cbi][0], c->bd, q0);
                    mc_comp_part(c->ref2p[pl], c->ref2_stride[pl], pw,
                                 ph, cc * 4, cr * 4, cw, chh,
                                 cc_mv[cbi][3], cc_mv[cbi][2], c->bd,
                                 q1);
                    blend_masked_d16_c(cmsk, q0, q1, cw * chh, c->bd,
                                       pl == 1 ? cu : cv);
                }
            } else {
            mc_comp_chroma(c, 1, cr, cc, cw, chh, cc_mv[cbi][0],
                           cc_mv[cbi][1], cc_mv[cbi][2], cc_mv[cbi][3],
                           cu);
            mc_comp_chroma(c, 2, cr, cc, cw, chh, cc_mv[cbi][0],
                           cc_mv[cbi][1], cc_mv[cbi][2], cc_mv[cbi][3],
                           cv);
            }
            static __thread int32_t ru2[32 * 32], rv2[32 * 32];
            const uint16_t *su = c->src[1], *sv = c->src[2];
            int ss = c->sstride[1];
            for (int y = 0; y < chh; y++)
                for (int x = 0; x < cw; x++) {
                    int off = (cr * 4 + y) * ss + cc * 4 + x;
                    int du = (int)su[off] - cu[y * cw + x];
                    int dv = (int)sv[off] - cv[y * cw + x];
                    ru2[y * cw + x] = du;
                    rv2[y * cw + x] = dv;
                    chroma_predsse += (long)du * du + (long)dv * dv;
                }
            if (!fast_skip) {
                int sgn_u = tpu_dc_sign_ctx(c, 1, cr, cc, ts_c);
                int sgn_v = tpu_dc_sign_ctx(c, 2, cr, cc, ts_c);
                tpu_trial_txb(c, 1, ts_c, 0, ru2, q, 1, sgn_u, 1,
                              &cmp_tu);
                tpu_trial_txb(c, 2, ts_c, 0, rv2, q, 1, sgn_v, 1,
                              &cmp_tv);
            }
        }
        double comp_total = cbest + c->rdmult * comp_base +
                            (double)(cmp_tu.sse + cmp_tv.sse) +
                            c->rdmult *
                                ((cmp_tu.rate512 + cmp_tv.rate512) /
                                 512.0);
        int comp_was_masked = comp_masked_type;
        if (!fast_skip && comp_total < best_cost) {
            best_cost = comp_total;
            use_comp = 1;
            comp_cm = cc_cm[cbi];
            cmv0r = cc_mv[cbi][0]; cmv0c = cc_mv[cbi][1];
            cmv1r = cc_mv[cbi][2]; cmv1c = cc_mv[cbi][3];
            i_ty = cmp_ty;
            i_tu = cmp_tu;
            i_tv = cmp_tv;
            memcpy(i_pred_y,
                   comp_masked_type ? mbest_pred : best_comp_pred,
                   sizeof(int32_t) * size * size);
            memcpy(i_pred_u, cu, sizeof(int32_t) * 32 * 32);
            memcpy(i_pred_v, cv, sizeof(int32_t) * 32 * 32);
        } else {
            comp_masked_type = 0;
        }
        /* skip_mode: NEAREST_NEARESTMV with forced-zero residual at the
         * cost of a single symbol (avg prediction; a masked refinement
         * makes the avg-based chroma buffers stale, so skip sm there) */
        if (c->skip_mode_present && cbi == 0 && cc_cm[cbi] == 0 &&
            !comp_was_masked) {
            int sm_ctx = c->above_skip_mode[c4] + c->left_skip_mode[r];
            double sm_cost =
                (double)(cb_predsse + chroma_predsse) +
                c->rdmult *
                    tpu_sym_cost_bits(ic->skip_mode + sm_ctx * 3, 1);
            double alt = best_cost +
                         c->rdmult * tpu_sym_cost_bits(
                                         ic->skip_mode + sm_ctx * 3, 0);
            if (sm_cost < alt) {
                use_sm = 1;
                use_comp = 1;
                comp_cm = 0;
                cmv0r = cc_mv[0][0]; cmv0c = cc_mv[0][1];
                cmv1r = cc_mv[0][2]; cmv1c = cc_mv[0][3];
                memcpy(i_pred_y, best_comp_pred,
                       sizeof(int32_t) * size * size);
                memcpy(i_pred_u, cu, sizeof(int32_t) * 32 * 32);
                memcpy(i_pred_v, cv, sizeof(int32_t) * 32 * 32);
                i_ty.sse = cb_predsse;
                i_ty.eob = 0;
                i_tu.sse = 0;
                i_tu.eob = 0;
                i_tv.sse = chroma_predsse;
                i_tv.eob = 0;
            }
        }
    }

    /* intra competitor — only consulted when the inter winner is poor
     * (the reference's class pruning; avoids a full intra trial on every
     * well-predicted block) */
    double intra_cost = -1.0;
    int iy = 0, iuv = 0, iskip = 0;
    int use_intra = 0;
    {
        const int32_t *pq0 = c->qtab + ((q * 3) + 0) * 10;
        double qstep = pq0[8] / 8.0;
        double poor = 0.25 * qstep * qstep * size * size;
        if ((double)i_ty.sse > poor) {
            tpu_intra_trial_only(c, r, c4, size, icand, q, &intra_cost,
                                 &iy, &iuv, &iskip);
            intra_cost += c->rdmult * intra_base_rate;
            use_intra = intra_cost < best_cost;
        }
    }
    IPROF_RESET;
    /* inter-intra search (spec 5.11.28 / 7.11.3.13; ref
     * enc_inter_prediction.c inter_intra path): blend the single-ref MC
     * prediction with a DC/V/H/SMOOTH intra prediction through the
     * smooth II mask; full luma RD vs SIMPLE incl. the interintra
     * symbol rates. Eligible at single-ref non-skip-mode square blocks
     * 8x8..32x32 (the is_interintra_allowed_bsize ENUM range). */
    int use_ii = 0, ii_mode = 0;
    int use_ii_wedge = 0, use_ii_wedge_idx = 0;
    int ii_eligible = c->interintra && !use_comp && !use_sm &&
                      !fast_skip && size >= 8 && size <= 32 &&
                      !(best_mode == 2 && glob_warp_ok);
    if (ii_eligible && !use_intra) {
        static const int II_TO_INTRA[4] = {0, 1, 2, 9};
        int ii_grp = size == 8 ? 1 : size == 16 ? 2 : 3;
        int sidx = size == 8 ? 1 : size == 16 ? 2 : 3;   /* log2-2 */
        static __thread int32_t ii_intra[64 * 64], ii_blend[64 * 64];
        static __thread int32_t ii_resid[64 * 64];
        static __thread TxTrial ii_ty;
        const uint16_t *sp2 = c->src[0];
        int ss2 = c->sstride[0];
        int sgn_ii = tpu_dc_sign_ctx(c, 0, r, c4, ts_y);
        static __thread int32_t s_resid2[64 * 64];
        if (c->tune_ssim)
            for (int y = 0; y < size; y++)
                for (int x = 0; x < size; x++)
                    s_resid2[y * size + x] =
                        (int32_t)sp2[(r * 4 + y) * ss2 + c4 * 4 + x] -
                        i_pred_y[y * size + x];
        double cost_simple =
            tpu_dist_eval(c, ts_y, i_pred_y, s_resid2, &i_ty) +
            c->rdmult * (i_ty.rate512 / 512.0 +
                         tpu_sym_cost_bits(ic->interintra + ii_grp * 3,
                                           0));
        double ii_best = -1.0;
        static __thread TxTrial ii_best_ty;
        static __thread int32_t ii_best_pred[64 * 64];
        for (int m = 0; m < 4; m++) {
            tpu_predict_txb(c, 0, II_TO_INTRA[m], 0, r, c4, r, c4, ts_y,
                            ii_intra);
            blend_ii(II_TAB[m][sidx], ii_intra, i_pred_y, size * size,
                     ii_blend);
            for (int y = 0; y < size; y++)
                for (int x = 0; x < size; x++)
                    ii_resid[y * size + x] =
                        (int32_t)sp2[(r * 4 + y) * ss2 + c4 * 4 + x] -
                        ii_blend[y * size + x];
            tpu_trial_txb(c, 0, ts_y, 0, ii_resid, q, 0, sgn_ii, 1,
                          &ii_ty);
            double rate =
                tpu_sym_cost_bits(ic->interintra + ii_grp * 3, 1) +
                tpu_sym_cost_bits(ic->interintra_mode + ii_grp * 5, m) +
                tpu_sym_cost_bits(ic->wedge_interintra + bsize * 3, 0);
            double cost = tpu_dist_eval(c, ts_y, ii_blend, ii_resid,
                                        &ii_ty) +
                          c->rdmult * (rate + ii_ty.rate512 / 512.0);
            if (ii_best < 0 || cost < ii_best) {
                ii_best = cost;
                ii_mode = m;
                ii_best_ty = ii_ty;
                memcpy(ii_best_pred, ii_blend,
                       sizeof(int32_t) * size * size);
            }
        }
        /* wedge inter-intra refinement (spec 5.11.28 wedge_interintra):
         * for the best II mode, rank the 16 wedge masks (sign 0) by
         * blended-prediction SSE, full-trial the best one, and keep it
         * when it beats the smooth blend incl. the wedge symbol rates */
        int ii_wedge = 0, ii_wedge_idx = 0;
        if (ii_best >= 0 && wedge_tab_of(bsize) >= 0) {
            int wt2 = wedge_tab_of(bsize);
            tpu_predict_txb(c, 0, II_TO_INTRA[ii_mode], 0, r, c4, r, c4,
                            ts_y, ii_intra);
            long best_ps = -1;
            int best_wi = -1;
            static __thread int32_t wblend[64 * 64];
            for (int wi = 0; wi < 16; wi++) {
                const uint8_t *wm = WEDGE_TAB[wt2][wi][0];
                long ps = 0;
                for (int i2 = 0; i2 < size * size; i2++) {
                    int v = (wm[i2] * ii_intra[i2] +
                             (64 - wm[i2]) * i_pred_y[i2] + 32) >> 6;
                    int dsrc = (int)sp2[(r * 4 + i2 / size) * ss2 +
                                        c4 * 4 + i2 % size] - v;
                    ps += (long)dsrc * dsrc;
                }
                if (best_ps < 0 || ps < best_ps) {
                    best_ps = ps;
                    best_wi = wi;
                }
            }
            if (best_wi >= 0) {
                const uint8_t *wm = WEDGE_TAB[wt2][best_wi][0];
                blend_ii(wm, ii_intra, i_pred_y, size * size, wblend);
                for (int y = 0; y < size; y++)
                    for (int x = 0; x < size; x++)
                        ii_resid[y * size + x] =
                            (int32_t)sp2[(r * 4 + y) * ss2 + c4 * 4 + x] -
                            wblend[y * size + x];
                tpu_trial_txb(c, 0, ts_y, 0, ii_resid, q, 0, sgn_ii, 1,
                              &ii_ty);
                int ii_grp2 = size == 8 ? 1 : size == 16 ? 2 : 3;
                double rate =
                    tpu_sym_cost_bits(ic->interintra + ii_grp2 * 3, 1) +
                    tpu_sym_cost_bits(ic->interintra_mode + ii_grp2 * 5,
                                      ii_mode) +
                    tpu_sym_cost_bits(ic->wedge_interintra + bsize * 3,
                                      1) +
                    tpu_sym_cost_bits(ic->wedge_idx + bsize * 17,
                                      best_wi);
                double cost = tpu_dist_eval(c, ts_y, wblend, ii_resid,
                                            &ii_ty) +
                              c->rdmult * (rate + ii_ty.rate512 / 512.0);
                if (cost < ii_best) {
                    ii_best = cost;
                    ii_wedge = 1;
                    ii_wedge_idx = best_wi;
                    ii_best_ty = ii_ty;
                    memcpy(ii_best_pred, wblend,
                           sizeof(int32_t) * size * size);
                }
            }
        }
        if (ii_best >= 0 && ii_best < cost_simple) {
            use_ii = 1;
            use_ii_wedge = ii_wedge;
            use_ii_wedge_idx = ii_wedge_idx;
            memcpy(i_pred_y, ii_best_pred, sizeof(int32_t) * size * size);
            i_ty = ii_best_ty;
            /* chroma: re-blend + re-trial under the chosen II mode;
             * wedge masks subsample 2x2 for chroma (spec 7.11.3.12) */
            int cw = TXW[ts_c], chh = TXH[ts_c];
            int csidx = sidx - 1;
            static __thread int32_t ci[32 * 32], ru2[32 * 32],
                rv2[32 * 32];
            static __thread uint8_t cmask[32 * 32];
            const uint8_t *cm2;
            if (use_ii_wedge) {
                const uint8_t *wm =
                    WEDGE_TAB[wedge_tab_of(bsize)][use_ii_wedge_idx][0];
                for (int i2 = 0; i2 < chh; i2++)
                    for (int j2 = 0; j2 < cw; j2++)
                        cmask[i2 * cw + j2] =
                            (uint8_t)((wm[(2 * i2) * size + 2 * j2] +
                                       wm[(2 * i2) * size + 2 * j2 + 1] +
                                       wm[(2 * i2 + 1) * size + 2 * j2] +
                                       wm[(2 * i2 + 1) * size + 2 * j2 +
                                          1] + 2) >> 2);
                cm2 = cmask;
            } else {
                cm2 = II_TAB[ii_mode][csidx];
            }
            tpu_predict_txb(c, 1, II_TO_INTRA[ii_mode], 0, r, c4, cr, cc,
                            ts_c, ci);
            blend_ii(cm2, ci, i_pred_u, cw * chh, i_pred_u);
            tpu_predict_txb(c, 2, II_TO_INTRA[ii_mode], 0, r, c4, cr, cc,
                            ts_c, ci);
            blend_ii(cm2, ci, i_pred_v, cw * chh, i_pred_v);
            const uint16_t *su2 = c->src[1], *sv2 = c->src[2];
            int ssc = c->sstride[1];
            for (int y = 0; y < chh; y++)
                for (int x = 0; x < cw; x++) {
                    int off = (cr * 4 + y) * ssc + cc * 4 + x;
                    ru2[y * cw + x] =
                        (int32_t)su2[off] - i_pred_u[y * cw + x];
                    rv2[y * cw + x] =
                        (int32_t)sv2[off] - i_pred_v[y * cw + x];
                }
            int sgn_u2 = tpu_dc_sign_ctx(c, 1, cr, cc, ts_c);
            int sgn_v2 = tpu_dc_sign_ctx(c, 2, cr, cc, ts_c);
            tpu_trial_txb(c, 1, ts_c, 0, ru2, q, 1, sgn_u2, 1, &i_tu);
            tpu_trial_txb(c, 2, ts_c, 0, rv2, q, 1, sgn_v2, 1, &i_tv);
        }
    }

    /* OBMC motion-mode search (spec 7.11.3.9; ref
     * enc_inter_prediction.c obmc path + motion_estimation obmc level):
     * blend the overlap strips from the overlappable neighbors' MC and
     * keep OBMC_CAUSAL when the luma RD (incl. the obmc symbol) wins.
     * The symbol is present for every eligible inter block once
     * is_motion_mode_switchable is signalled, so both options carry
     * their symbol rate. */
    int obmc_eligible = 0, use_obmc = 0, use_warp = 0, warp_cdf = 0;
    ObmcNb ob_above[4], ob_left[4];
    int ob_na = 0, ob_nl = 0;
    WarpParams wp;
    /* GLOBALMV under a non-translational gm forces SIMPLE without a
     * motion_mode symbol (spec 5.11.27 GmType > TRANSLATION gate) */
    int glob_warp_blk = best_mode == 2 && !use_comp && !use_sm &&
                        c->gm_wp_ok && c->sref_frame == 1;
    if (c->motion_mode_sw && !use_sm && !use_comp && !use_ii &&
        !glob_warp_blk && has_overlappable_c(c, r, c4, w4, w4)) {
        /* NOTE: obmc_eligible is the SPEC eligibility — it gates the
         * motion_mode SYMBOL the decoder will read, so it must not
         * depend on encoder-side pruning (fast_skip gates only the
         * search below; the symbol then codes SIMPLE) */
        obmc_eligible = 1;
        int wpts[8][2], wpts_ref[8][2];
        int nsamp = 0;
        if (c->allow_warp)
            nsamp = find_warp_samples_c(c, r, c4, w4, w4, c->sref_frame, wpts,
                                        wpts_ref);
        /* the symbol's cdf: 3-ary motion_mode when warp is possible
         * (spec 5.11.27 read_motion_mode; allow_hp/force_int are 0/0) */
        warp_cdf = c->allow_warp && nsamp > 0;
        if (!use_intra && !fast_skip) {
            const uint16_t *mmcdf = warp_cdf
                                        ? ic->motion_mode + bsize * 4
                                        : ic->obmc + bsize * 3;
            ob_na = collect_obmc_above(c, r, c4, w4, ob_above);
            ob_nl = collect_obmc_left(c, r, c4, w4, ob_left);
            const uint16_t *sp = c->src[0];
            int ssrc = c->sstride[0];
            static __thread int32_t ob_y[64 * 64], wp_y[64 * 64];
            static __thread int32_t ob_resid[64 * 64];
            static __thread TxTrial ob_ty, wp_ty;
            int sgn_y2 = tpu_dc_sign_ctx(c, 0, r, c4, ts_y);
            /* WARPED doesn't code the interp filter — credit the saved
             * symbol to the warp candidate (av1_is_interp_needed) */
            double filt_rate = 0.0;
            if (c->switchable_filter &&
                !(best_mode == 2 &&
                  !(c->sref_frame == 1 && c->gm_coded))) {
                int fctx2 = interp_filter_ctx_c(c, r, c4, c->sref_frame, 0);
                filt_rate = tpu_sym_cost_bits(
                    ic->switchable_interp + fctx2 * 4, best_filt);
            }
            if (c->tune_ssim)
                for (int y = 0; y < size; y++)
                    for (int x = 0; x < size; x++)
                        ob_resid[y * size + x] =
                            (int32_t)sp[(r * 4 + y) * ssrc + c4 * 4 + x] -
                            i_pred_y[y * size + x];
            double cost_best = tpu_dist_eval(c, ts_y, i_pred_y, ob_resid,
                                             &i_ty) +
                               c->rdmult * (i_ty.rate512 / 512.0 +
                                            filt_rate +
                                            tpu_sym_cost_bits(mmcdf, 0));
            int mm_pick = 0;
            if (ob_na + ob_nl > 0) {
                memcpy(ob_y, i_pred_y, sizeof(int32_t) * size * size);
                obmc_blend_plane(c, 0, r, c4, size, ob_above, ob_na,
                                 ob_left, ob_nl, ob_y);
                for (int y = 0; y < size; y++)
                    for (int x = 0; x < size; x++)
                        ob_resid[y * size + x] =
                            (int32_t)sp[(r * 4 + y) * ssrc + c4 * 4 + x] -
                            ob_y[y * size + x];
                tpu_trial_txb(c, 0, ts_y, 0, ob_resid, q, 0, sgn_y2, 1,
                              &ob_ty);
                double cost_obmc =
                    tpu_dist_eval(c, ts_y, ob_y, ob_resid, &ob_ty) +
                    c->rdmult * (ob_ty.rate512 / 512.0 + filt_rate +
                                 tpu_sym_cost_bits(mmcdf, 1));
                if (cost_obmc < cost_best) {
                    cost_best = cost_obmc;
                    mm_pick = 1;
                }
            }
            int wp_valid = 0;
            if (warp_cdf) {
                int ns = nsamp;
                if (ns > 1)
                    ns = select_samples_c(best_mvr, best_mvc, wpts,
                                          wpts_ref, ns, size, size);
                wp_valid = find_projection_c(wpts, wpts_ref, ns, size,
                                             size, best_mvr, best_mvc, r,
                                             c4, &wp);
                if (wp_valid) {
                    warp_plane_c(&wp, c->srefp[0], c->sref_stride[0],
                                 c->width, c->height, c4 * 4, r * 4,
                                 size, size, 0, 0, c->bd, wp_y);
                    for (int y = 0; y < size; y++)
                        for (int x = 0; x < size; x++)
                            ob_resid[y * size + x] =
                                (int32_t)
                                    sp[(r * 4 + y) * ssrc + c4 * 4 + x] -
                                wp_y[y * size + x];
                    tpu_trial_txb(c, 0, ts_y, 0, ob_resid, q, 0, sgn_y2,
                                  1, &wp_ty);
                    double cost_warp =
                        tpu_dist_eval(c, ts_y, wp_y, ob_resid, &wp_ty) +
                        c->rdmult * (wp_ty.rate512 / 512.0 +
                                     tpu_sym_cost_bits(mmcdf, 2));
                    if (cost_warp < cost_best) {
                        cost_best = cost_warp;
                        mm_pick = 2;
                    }
                }
            }
            if (mm_pick) {
                use_obmc = mm_pick == 1;
                use_warp = mm_pick == 2;
                memcpy(i_pred_y, mm_pick == 1 ? ob_y : wp_y,
                       sizeof(int32_t) * size * size);
                i_ty = mm_pick == 1 ? ob_ty : wp_ty;
                /* chroma: re-predict under the chosen motion mode.
                 * Warp falls back to translation on sub-8x8 chroma
                 * (do_warp plane-dims gate), i.e. 8x8 blocks keep the
                 * existing translational chroma. */
                int cw = TXW[ts_c], chh = TXH[ts_c];
                int redo_chroma = 1;
                if (mm_pick == 1) {
                    obmc_blend_plane(c, 1, r, c4, size, ob_above, ob_na,
                                     ob_left, ob_nl, i_pred_u);
                    obmc_blend_plane(c, 2, r, c4, size, ob_above, ob_na,
                                     ob_left, ob_nl, i_pred_v);
                } else if (size >= 16) {
                    warp_plane_c(&wp, c->srefp[1], c->sref_stride[1],
                                 (c->width + 1) >> 1,
                                 (c->height + 1) >> 1, cc * 4, cr * 4,
                                 cw, chh, 1, 1, c->bd, i_pred_u);
                    warp_plane_c(&wp, c->srefp[2], c->sref_stride[2],
                                 (c->width + 1) >> 1,
                                 (c->height + 1) >> 1, cc * 4, cr * 4,
                                 cw, chh, 1, 1, c->bd, i_pred_v);
                } else if (c->switchable_filter && best_filt != 0) {
                    /* 8x8 warp: chroma falls back to translation, and
                     * the (uncoded) filter reads back REGULAR — the
                     * chroma pred must be re-done with filter 0 */
                    int pw2 = (c->width + 1) >> 1,
                        ph2 = (c->height + 1) >> 1;
                    mc_block_f(c->srefp[1], c->sref_stride[1], pw2, ph2,
                               cc * 4, cr * 4, cw, chh, best_mvc,
                               best_mvr, c->bd, 0, 0, i_pred_u);
                    mc_block_f(c->srefp[2], c->sref_stride[2], pw2, ph2,
                               cc * 4, cr * 4, cw, chh, best_mvc,
                               best_mvr, c->bd, 0, 0, i_pred_v);
                } else {
                    redo_chroma = 0;
                }
                if (redo_chroma) {
                    static __thread int32_t oru[32 * 32], orv[32 * 32];
                    const uint16_t *su = c->src[1], *sv = c->src[2];
                    int scs = c->sstride[1];
                    for (int y = 0; y < chh; y++)
                        for (int x = 0; x < cw; x++) {
                            int off = (cr * 4 + y) * scs + cc * 4 + x;
                            oru[y * cw + x] =
                                (int32_t)su[off] - i_pred_u[y * cw + x];
                            orv[y * cw + x] =
                                (int32_t)sv[off] - i_pred_v[y * cw + x];
                        }
                    int sgn_u2 = tpu_dc_sign_ctx(c, 1, cr, cc, ts_c);
                    int sgn_v2 = tpu_dc_sign_ctx(c, 2, cr, cc, ts_c);
                    tpu_trial_txb(c, 1, ts_c, 0, oru, q, 1, sgn_u2, 1,
                                  &i_tu);
                    tpu_trial_txb(c, 2, ts_c, 0, orv, q, 1, sgn_v2, 1,
                                  &i_tv);
                }
            }
        }
    }

    /* final luma residual off the winning prediction (shared by the
     * IDTX tail trial and the var-tx split search) */
    IPROF_MARK(11);
    static __thread int32_t sp_resid[64 * 64];
    int have_resid = 0;
    if (!use_intra && !use_sm) {
        const uint16_t *sy0 = c->src[0];
        int ss0 = c->sstride[0];
        for (int i = 0; i < size; i++)
            for (int j = 0; j < size; j++)
                sp_resid[i * size + j] =
                    (int32_t)sy0[(r * 4 + i) * ss0 + c4 * 4 + j] -
                    i_pred_y[i * size + j];
        have_resid = 1;
        /* IDTX tail trial on the winner (sharp/screen content: the
         * identity transform wins on hard edges; ref tx_type_search's
         * inter ext-tx set — previously only DCT was trialled). Chroma
         * tx type FOLLOWS the luma's for inter blocks (spec
         * compute_tx_type plane>0), so the chroma TXBs must be
         * re-trialled under IDTX and join the RD decision. */
        if (i_ty.eob && i_ty.tt != 9) {
            double tc9 = tpu_inter_txtype_cost(c, ts_y, 9);
            /* chroma ts here is a square <= 32x32: every inter ext-tx
             * set at those sizes (types 1/4/5) includes IDTX */
            if (tc9 > 0.0) {
                static __thread TxTrial t9, tu9, tv9;
                tpu_trial_txb(c, 0, ts_y, 9, sp_resid, q, 0, sgn_y, 1,
                              &t9);
                double c_old =
                    tpu_dist_eval(c, ts_y, i_pred_y, sp_resid, &i_ty) +
                    c->rdmult * (i_ty.rate512 / 512.0 +
                                 tpu_inter_txtype_cost(c, ts_y,
                                                       i_ty.tt));
                double c_new =
                    tpu_dist_eval(c, ts_y, i_pred_y, sp_resid, &t9) +
                    c->rdmult * (t9.rate512 / 512.0 + tc9);
                {
                    static __thread int32_t cres[32 * 32];
                    int cw = TXW[ts_c], chh = TXH[ts_c];
                    const uint16_t *su = c->src[1], *sv = c->src[2];
                    int scs = c->sstride[1];
                    int sgn_u = tpu_dc_sign_ctx(c, 1, cr, cc, ts_c);
                    int sgn_v = tpu_dc_sign_ctx(c, 2, cr, cc, ts_c);
                    for (int i = 0; i < chh; i++)
                        for (int j = 0; j < cw; j++)
                            cres[i * cw + j] =
                                (int32_t)su[(cr * 4 + i) * scs + cc * 4 +
                                            j] - i_pred_u[i * cw + j];
                    tpu_trial_txb(c, 1, ts_c, 9, cres, q, 1, sgn_u, 1,
                                  &tu9);
                    c_new += (double)tu9.sse - (double)i_tu.sse +
                             c->rdmult * (tu9.rate512 - i_tu.rate512) /
                                 512.0;
                    for (int i = 0; i < chh; i++)
                        for (int j = 0; j < cw; j++)
                            cres[i * cw + j] =
                                (int32_t)sv[(cr * 4 + i) * scs + cc * 4 +
                                            j] - i_pred_v[i * cw + j];
                    tpu_trial_txb(c, 2, ts_c, 9, cres, q, 1, sgn_v, 1,
                                  &tv9);
                    c_new += (double)tv9.sse - (double)i_tv.sse +
                             c->rdmult * (tv9.rate512 - i_tv.rate512) /
                                 512.0;
                }
                /* t9.eob must stay nonzero: an all-zero luma TXB makes
                 * the decoder derive DCT for the chroma (txtype map
                 * resets on eob==0), which would break the IDTX chroma
                 * recon committed below */
                if (t9.eob && c_new < c_old) {
                    i_ty = t9;
                    i_tu = tu9;
                    i_tv = tv9;
                }
            }
        }
    }

    int skip;
    if (use_intra) {
        use_sm = 0;
        use_comp = 0;
        skip = iskip;
    } else if (use_sm) {
        skip = 1;
    } else {
        skip = (i_ty.eob == 0 && i_tu.eob == 0 && i_tv.eob == 0);
    }

    /* depth-1 inter TX split search (var-tx, TX_MODE_SELECT; ref
     * tx_search.c inter tx depth RD): the prediction is TX-size
     * independent on inter blocks, so the four sub-TXBs recode the SAME
     * residual quadrants — compare against the full-size winner incl.
     * the txfm_split flag rates and per-sub txb_skip/tx-type rates. */
    int itx_split = 0;
    static __thread TxTrial i_sub_t[4];
    /* i_ty.tt must be DCT here: the split children code DCT, and the
     * decoder's chroma tx type follows the txtype map at the block's
     * top-left — replacing an IDTX winner with split-DCT luma would
     * orphan the IDTX chroma recon committed above */
    /* eob > 2 gate: with only DC + one AC surviving quantization, the
     * split arm's 4x (flag + skip + coeff) rates cannot beat the
     * full-size code — the probe's 4 sub-trials are waste (most
     * blocks at the low-rate end) */
    if (c->tx_select && !skip && !use_intra && have_resid &&
        i_ty.tt == 0 && ts_y >= 1 && ts_y <= 4 && i_ty.eob > 2) {
        int sub_ts = ts_y - 1;
        int sub_px = size / 2;
        int h4q = sub_px / 4;
        int pctx = txfm_split_ctx_c(c, r, c4, size, ts_y);
        const uint16_t *pcdf = ic->txfm_partition + pctx * 3;
        int sctx0 = tpu_txb_skip_ctx(c, 0, r, c4, ts_y, size, size);
        double cost0 =
            tpu_dist_eval(c, ts_y, i_pred_y, sp_resid, &i_ty) +
            c->rdmult *
                (i_ty.rate512 / 512.0 + tpu_sym_cost_bits(pcdf, 0) +
                 tpu_sym_cost_bits(
                     c->mc->txb_skip +
                         (tpu_txs_entropy_ctx(ts_y) * 13 + sctx0) * 3,
                     i_ty.eob == 0));
        /* speculative ctx-row walk over the quadrants (coef rows +
         * txfm rows feed the later quadrants' contexts) */
        int aw4s = w4 < c->mi_cols - c4 ? w4 : c->mi_cols - c4;
        int lh4s = w4 < c->mi_rows - r ? w4 : c->mi_rows - r;
        uint8_t sv_ac[16], sv_lc[16], sv_tw[16], sv_th[16];
        memcpy(sv_ac, c->above_coef[0] + c4, aw4s);
        memcpy(sv_lc, c->left_coef[0] + r, lh4s);
        memcpy(sv_tw, c->above_txw + c4, aw4s);
        memcpy(sv_th, c->left_txh + r, lh4s);
        double cost1 = c->rdmult * tpu_sym_cost_bits(pcdf, 1);
        static __thread int32_t qresid[32 * 32];
        static __thread int32_t qpred[32 * 32];
        static __thread TxTrial qt;
        double split_dist = 0.0;
        for (int qi = 0; qi < 4; qi++) {
            int qr = r + (qi >> 1) * h4q, qc = c4 + (qi & 1) * h4q;
            if (sub_ts >= 1) {
                /* each splittable child codes its own flag = 0 */
                int cctx = txfm_split_ctx_c(c, qr, qc, size, sub_ts);
                cost1 += c->rdmult * tpu_sym_cost_bits(
                    ic->txfm_partition + cctx * 3, 0);
            }
            {
                int caw = h4q < c->mi_cols - qc ? h4q : c->mi_cols - qc;
                int clh = h4q < c->mi_rows - qr ? h4q : c->mi_rows - qr;
                if (caw > 0) memset(c->above_txw + qc, TXW[sub_ts], caw);
                if (clh > 0) memset(c->left_txh + qr, TXH[sub_ts], clh);
            }
            for (int i = 0; i < sub_px; i++) {
                memcpy(qresid + i * sub_px,
                       sp_resid + ((qi >> 1) * sub_px + i) * size +
                           (qi & 1) * sub_px,
                       sizeof(int32_t) * sub_px);
                memcpy(qpred + i * sub_px,
                       i_pred_y + ((qi >> 1) * sub_px + i) * size +
                           (qi & 1) * sub_px,
                       sizeof(int32_t) * sub_px);
            }
            int sctx = tpu_txb_skip_ctx(c, 0, qr, qc, sub_ts, size, size);
            int qsgn = tpu_dc_sign_ctx(c, 0, qr, qc, sub_ts);
            tpu_trial_txb(c, 0, sub_ts, 0, qresid, q, 0, qsgn, 1, &qt);
            double rate =
                qt.rate512 / 512.0 +
                tpu_sym_cost_bits(
                    c->mc->txb_skip +
                        (tpu_txs_entropy_ctx(sub_ts) * 13 + sctx) * 3,
                    qt.eob == 0);
            i_sub_t[qi] = qt;
            /* same distortion metric as the no-split arm (cost0 uses
             * tpu_dist_eval, which adds the psy energy term and the
             * tune-ssim distortion): a raw-SSE split arm never pays the
             * psy penalty and over-splits under tune-PSY */
            split_dist += tpu_dist_eval(c, sub_ts, qpred, qresid, &qt);
            cost1 += c->rdmult * rate;
            tpu_set_coef_ctx(c, 0, qr, qc, sub_ts,
                             tpu_cul_of_trial(&qt, sub_ts));
        }
        cost1 += split_dist;
        /* rollback the speculative rows */
        memcpy(c->above_coef[0] + c4, sv_ac, aw4s);
        memcpy(c->left_coef[0] + r, sv_lc, lh4s);
        memcpy(c->above_txw + c4, sv_tw, aw4s);
        memcpy(c->left_txh + r, sv_th, lh4s);
        if (cost1 < cost0) itx_split = 1;
    }

    /* syntax: [skip_mode] -> skip -> delta q -> is_inter -> info ->
     * residual (mirrors the parser's read order exactly) */
    int aw4 = w4 < c->mi_cols - c4 ? w4 : c->mi_cols - c4;
    int lh4 = w4 < c->mi_rows - r ? w4 : c->mi_rows - r;
    if (c->skip_mode_present && size >= 8) {
        int sm_ctx = c->above_skip_mode[c4] + c->left_skip_mode[r];
        tpuec_symbol(c->ec, use_sm, ic->skip_mode + sm_ctx * 3, 2, 1);
        memset(c->above_skip_mode + c4, use_sm, aw4);
        memset(c->left_skip_mode + r, use_sm, lh4);
    }
    int skip_ctx = c->above_skip[c4] + c->left_skip[r];
    if (!use_sm)
        tpuec_symbol(c->ec, skip, c->mc->skip + skip_ctx * 3, 2, 1);
    if (*dq_pending && !(size == 64 && skip)) {
        int delta = (q - *prev_q) >> dq_res_log2;
        tpu_write_delta_q(c, delta < 0 ? -delta : delta, delta < 0);
        *prev_q = q;
        *dq_pending = 0;
    }
    if (!use_sm)
        tpuec_symbol(c->ec, !use_intra, ic->intra_inter + ii_ctx * 3, 2,
                     1);
    if (use_intra) {
        tpu_intra_commit_choice(c, r, c4, size, iy, iuv, iskip);
        return;
    }

    if (!use_sm) {
        if (comp_ok)
            tpuec_symbol(c->ec, use_comp,
                         ic->comp_inter +
                             reference_mode_ctx_c(c, r, c4) * 3,
                         2, 1);
        if (use_comp) {
            write_comp_refs_last_alt(c, r, c4);
            int cm_ctx = compound_mode_ctx_c(crefs.mode_context);
            tpuec_symbol(c->ec, comp_cm,
                         ic->inter_compound_mode + cm_ctx * 9, 8, 1);
            if (comp_cm == 7) {               /* NEW_NEWMV, drl = 0 */
                for (int idx = 0; idx < 2; idx++) {
                    if (crefs.n_found > idx + 1) {
                        int bit = 0 != idx;
                        tpuec_symbol(c->ec, bit,
                                     ic->drl + tpui_drl_ctx(&crefs, idx) *
                                                   3,
                                     2, 1);
                        if (!bit) break;
                    }
                }
                int p0r = crefs.mv[0][0], p0c = crefs.mv[0][1];
                int p1r = crefs.mv2[0][0], p1c = crefs.mv2[0][1];
                lower_precision_hp(c, &p0r, &p0c);
                lower_precision_hp(c, &p1r, &p1c);
                write_mv(c, cmv0r, cmv0c, p0r, p0c);
                write_mv(c, cmv1r, cmv1c, p1r, p1c);
            } else if (comp_cm == 1) {        /* NEAR_NEARMV, idx = 1 */
                for (int idx = 1; idx < 3; idx++) {
                    if (crefs.n_found > idx + 1) {
                        int bit = 1 != idx;
                        tpuec_symbol(c->ec, bit,
                                     ic->drl + tpui_drl_ctx(&crefs, idx) *
                                                   3,
                                     2, 1);
                        if (!bit) break;
                    }
                }
            }
            /* read_compound_type (spec 5.11.29): comp_group_idx +
             * wedge/diffwtd signalling when masked compound is on */
            if (c->masked_comp) {
                int cg = comp_masked_type > 0;
                tpuec_symbol(c->ec, cg,
                             ic->comp_group_idx +
                                 comp_group_ctx_c(c, r, c4) * 3,
                             2, 1);
                if (cg) {
                    if (wedge_tab_of(bsize) >= 0)
                        tpuec_symbol(c->ec, comp_masked_type - 1,
                                     ic->compound_type + bsize * 3, 2,
                                     1);
                    if (comp_masked_type == 1) {
                        tpuec_symbol(c->ec, comp_wedge_idx,
                                     ic->wedge_idx + bsize * 17, 16, 1);
                        tpuec_literal(c->ec, comp_wedge_sign, 1);
                    } else {
                        tpuec_literal(c->ec, comp_mask_type, 1);
                    }
                }
            }
        } else {
            write_single_ref(c, r, c4, c->sref_frame);
            int newmv_ctx = refs.mode_context & 7;
            int zeromv_ctx = (refs.mode_context >> 3) & 1;
            int refmv_ctx = (refs.mode_context >> 4) & 15;
            tpuec_symbol(c->ec, best_mode != 3, ic->newmv + newmv_ctx * 3,
                         2, 1);
            if (best_mode != 3) {
                tpuec_symbol(c->ec, best_mode != 2,
                             ic->zeromv + zeromv_ctx * 3, 2, 1);
                if (best_mode != 2)
                    tpuec_symbol(c->ec, best_mode != 0,
                                 ic->refmv + refmv_ctx * 3, 2, 1);
            }
            /* DRL (refs.count == NumMvFound gates the bits) */
            if (best_mode == 3) {
                for (int idx = 0; idx < 2; idx++) {
                    if (refs.n_found > idx + 1) {
                        int bit = best_drl != idx;
                        tpuec_symbol(c->ec, bit,
                                     ic->drl + tpui_drl_ctx(&refs, idx) *
                                                   3,
                                     2, 1);
                        if (!bit) break;
                    }
                }
            } else if (best_mode == 1) {
                for (int idx = 1; idx < 3; idx++) {
                    if (refs.n_found > idx + 1) {
                        int bit = (1 + best_drl) != idx;
                        tpuec_symbol(c->ec, bit,
                                     ic->drl + tpui_drl_ctx(&refs, idx) *
                                                   3,
                                     2, 1);
                        if (!bit) break;
                    }
                }
            }
            if (best_mode == 3) {
                int pos = refs.n_found > 1 ? best_drl : 0;
                int pr = refs.mv[pos][0], pc = refs.mv[pos][1];
                lower_precision_hp(c, &pr, &pc);
                write_mv(c, best_mvr, best_mvc, pr, pc);
            }
        }
    }

    /* interintra syntax (spec 5.11.28): after MVs, before motion_mode */
    if (c->interintra && !use_comp && !use_sm && size >= 8 && size <= 32) {
        int wgrp = size == 8 ? 1 : size == 16 ? 2 : 3;
        tpuec_symbol(c->ec, use_ii, ic->interintra + wgrp * 3, 2, 1);
        if (use_ii) {
            tpuec_symbol(c->ec, ii_mode,
                         ic->interintra_mode + wgrp * 5, 4, 1);
            tpuec_symbol(c->ec, use_ii_wedge,
                         ic->wedge_interintra + bsize * 3, 2, 1);
            if (use_ii_wedge)
                tpuec_symbol(c->ec, use_ii_wedge_idx,
                             ic->wedge_idx + bsize * 17, 16, 1);
        }
    }

    /* motion_mode symbol: after MVs, before the interp filter (spec
     * 5.11.27 read order). 3-ary motion_mode cdf when warp samples
     * exist under allow_warped_motion, else the 2-ary obmc cdf. */
    if (obmc_eligible && !use_sm) {
        int mmv = use_warp ? 2 : use_obmc;
        if (warp_cdf)
            tpuec_symbol(c->ec, mmv, ic->motion_mode + bsize * 4, 3, 1);
        else
            tpuec_symbol(c->ec, use_obmc, ic->obmc + bsize * 3, 2, 1);
    }

    /* interp filter symbol (after modes/MVs, spec 5.11.27 order);
     * not coded for skip_mode, WARPED_CAUSAL (av1_is_interp_needed),
     * or GLOBALMV-under-identity-gm blocks */
    if (c->switchable_filter && !use_sm && !use_warp &&
        !(!use_comp && best_mode == 2 &&
          !(c->sref_frame == 1 && c->gm_coded))) {
        int wf = use_comp ? 0 : best_filt;
        int fctx = interp_filter_ctx_c(c, r, c4,
                                       use_comp ? 1 : c->sref_frame,
                                       use_comp);
        tpuec_symbol(c->ec, wf, ic->switchable_interp + fctx * 4, 3, 1);
    }

    /* inter var-tx signalling (spec 5.11.16 read_var_tx_size; mirrors
     * the parser: non-skip inter blocks code the txfm_split tree, skip
     * blocks imply the largest tx and only update the ctx rows) */
    int ts_eff = ts_y;
    if (c->tx_select) {
        if (!skip) {
            int pctx = txfm_split_ctx_c(c, r, c4, size, ts_y);
            tpuec_symbol(c->ec, itx_split, ic->txfm_partition + pctx * 3,
                         2, 1);
            if (itx_split) {
                ts_eff = ts_y - 1;
                int sub_px2 = size / 2;
                int h4q2 = sub_px2 / 4;
                for (int qi = 0; qi < 4; qi++) {
                    int qr = r + (qi >> 1) * h4q2;
                    int qc = c4 + (qi & 1) * h4q2;
                    if (qr >= c->mi_rows || qc >= c->mi_cols) continue;
                    if (ts_eff >= 1) {
                        int cctx =
                            txfm_split_ctx_c(c, qr, qc, size, ts_eff);
                        tpuec_symbol(c->ec, 0,
                                     ic->txfm_partition + cctx * 3, 2,
                                     1);
                    }
                    int caw = h4q2 < c->mi_cols - qc ? h4q2
                                                     : c->mi_cols - qc;
                    int clh = h4q2 < c->mi_rows - qr ? h4q2
                                                     : c->mi_rows - qr;
                    memset(c->above_txw + qc, TXW[ts_eff], caw);
                    memset(c->left_txh + qr, TXH[ts_eff], clh);
                }
            } else {
                memset(c->above_txw + c4, TXW[ts_y], aw4);
                memset(c->left_txh + r, TXH[ts_y], lh4);
            }
        } else {
            memset(c->above_txw + c4, TXW[ts_y], aw4);
            memset(c->left_txh + r, TXH[ts_y], lh4);
        }
    }

    /* neighbor rows + grid */
    memset(c->above_mode + c4, 0, aw4);
    memset(c->left_mode + r, 0, lh4);
    memset(c->above_skip + c4, skip, aw4);
    memset(c->left_skip + r, skip, lh4);
    memset(c->above_smooth[0] + c4, 0, aw4);
    memset(c->left_smooth[0] + r, 0, lh4);
    memset(c->above_smooth[1] + c4, 0, aw4);
    memset(c->left_smooth[1] + r, 0, lh4);
    if (use_comp)
        tpui_grid_set_comp(c->grid, r, c4, w4, w4, bsize, 1, 7, cmv0r,
                           cmv0c, cmv1r, cmv1c, comp_cm == 7,
                           use_sm ? 0 : comp_masked_type > 0);
    else {
        tpui_grid_set(c->grid, r, c4, w4, w4, bsize, c->sref_frame,
                      best_mvr,
                      best_mvc, best_mode == 3);
        if (best_mode == 2 && size >= 8)
            tpui_grid_set_gmv(c->grid, r, c4, w4, w4, 1);
        if (use_ii)
            tpui_grid_mark_ii(c->grid, r, c4, w4, w4);
    }
    {
        /* neighbor filter state for later interp-filter contexts */
        /* uncoded-filter blocks read back as REGULAR in the parser's
         * neighbor-filter contexts (skip_mode, compound avg, WARPED) */
        int wf = (use_comp || use_sm || use_warp) ? 0 : best_filt;
        InterGrid *g = c->grid;
        int rr1 = r + w4 < g->mi_rows ? r + w4 : g->mi_rows;
        int cc1 = c4 + w4 < g->mi_cols ? c4 + w4 : g->mi_cols;
        for (int i = r; i < rr1; i++)
            memset(g->filt + (size_t)i * g->mi_cols + c4, wf, cc1 - c4);
    }
    if (c->lf_txdim[0]) {
        for (int i = 0; i < lh4; i++)
            memset(c->lf_txdim[0] + (r + i) * c->lf_stride[0] + c4,
                   TXW[ts_eff] > 64 ? 64 : TXW[ts_eff], aw4);
        int ch4 = tpu_clamp_h4(c, 1, cr, w4 >> 1 ? w4 >> 1 : 1);
        int cw4c = tpu_clamp_w4(c, 1, cc, w4 >> 1 ? w4 >> 1 : 1);
        for (int i = 0; i < ch4; i++)
            memset(c->lf_txdim[1] + (cr + i) * c->lf_stride[1] + cc,
                   TXW[ts_c], cw4c);
    }
    if (c->skip_map)
        for (int i = 0; i < lh4; i++)
            memset(c->skip_map + (r + i) * c->skip_stride + c4, skip, aw4);

    if (skip) {
        memset(c->above_coef[0] + c4, 0, aw4);
        memset(c->left_coef[0] + r, 0, lh4);
        int cw4 = w4 >> 1 ? w4 >> 1 : 1;
        for (int p = 1; p < 3; p++) {
            memset(c->above_coef[p] + cc, 0, tpu_clamp_w4(c, p, cc, cw4));
            memset(c->left_coef[p] + cr, 0, tpu_clamp_h4(c, p, cr, cw4));
        }
        tpu_commit_recon(c, 0, r, c4, ts_y, i_pred_y, NULL);
        tpu_commit_recon(c, 1, cr, cc, ts_c, i_pred_u, NULL);
        tpu_commit_recon(c, 2, cr, cc, ts_c, i_pred_v, NULL);
        c->dist_acc += i_ty.sse + i_tu.sse + i_tv.sse;
        return;
    }
    if (itx_split) {
        /* var-tx: four sub-TXBs at ts_y-1 over the same prediction;
         * per-sub recon via quadrant pred views */
        int sub_px = size / 2;
        int h4q = sub_px / 4;
        static __thread int32_t qpred[32 * 32];
        for (int qi = 0; qi < 4; qi++) {
            int qr = r + (qi >> 1) * h4q, qc = c4 + (qi & 1) * h4q;
            for (int i = 0; i < sub_px; i++)
                memcpy(qpred + i * sub_px,
                       i_pred_y + ((qi >> 1) * sub_px + i) * size +
                           (qi & 1) * sub_px,
                       sizeof(int32_t) * sub_px);
            tpu_write_txb_inter(c, 0, qr, qc, ts_y - 1, size, size,
                                &i_sub_t[qi]);
            tpu_commit_recon(c, 0, qr, qc, ts_y - 1, qpred,
                             &i_sub_t[qi]);
            c->dist_acc += i_sub_t[qi].sse;
        }
    } else {
        if (c->noise_norm && i_ty.eob) {
            /* PSY noise normalization on the final luma txb (the inter
             * arm of the encode-pass gate, ref full_loop.c:1818) */
            const uint16_t *sy = c->src[0];
            int ss = c->sstride[0];
            int w = TXW[ts_y], h = TXH[ts_y];
            for (int i = 0; i < h; i++)
                for (int j = 0; j < w; j++)
                    i_resid_y[i * w + j] =
                        (int32_t)sy[(r * 4 + i) * ss + c4 * 4 + j] -
                        i_pred_y[i * w + j];
            tpu_noise_norm_txb(c, ts_y, i_resid_y, i_ty.q, &i_ty);
        }
        tpu_write_txb_inter(c, 0, r, c4, ts_y, size, size, &i_ty);
        tpu_commit_recon(c, 0, r, c4, ts_y, i_pred_y, &i_ty);
        c->dist_acc += i_ty.sse;
    }
    tpu_write_txb_inter(c, 1, cr, cc, ts_c, size >> 1, size >> 1, &i_tu);
    tpu_commit_recon(c, 1, cr, cc, ts_c, i_pred_u, &i_tu);
    tpu_write_txb_inter(c, 2, cr, cc, ts_c, size >> 1, size >> 1, &i_tv);
    tpu_commit_recon(c, 2, cr, cc, ts_c, i_pred_v, &i_tv);
    c->dist_acc += i_tu.sse + i_tv.sse;
}

/* ---- P-frame partition walk -------------------------------------------- */
static void walk_p(TpuCommit *c, int r, int c4, int size,
                   const uint8_t *s64, const uint8_t *s32,
                   const uint8_t *s16, const uint8_t *m64,
                   const uint8_t *m32, const uint8_t *m16,
                   const uint8_t *m8, int nc64, int nc32, int nc16, int nc8,
                   const int16_t *mv16, const int16_t *mv16b,
                   int mv16_cols, int q,
                   int *dq_pending, int *prev_q, int dq_res_log2) {
    if (r >= c->mi_rows || c4 >= c->mi_cols) return;
    int w4 = size / 4;
    int has_rows = r + (w4 >> 1) < c->mi_rows;
    int has_cols = c4 + (w4 >> 1) < c->mi_cols;
    int forced = !(has_rows && has_cols) && size > 8;
    int split = 0;
    if (size > 8) {
        const uint8_t *sm = size == 64 ? s64 : size == 32 ? s32 : s16;
        int nc = size == 64 ? nc64 : size == 32 ? nc32 : nc16;
        split = forced || sm[((r * 4) / size) * nc + (c4 * 4) / size];
    }
    if (split && !forced && size >= 32) {
        /* skip-merge override: the device split tree scores source SADs,
         * which on noisy-but-static content splits deep — and the
         * partition tree alone costs ~20% of a leaf frame's bits (the
         * reference's partition RD folds the skip path's cheapness into
         * the no-split cost and codes 64x64 skips). When the whole
         * block's zero/GM-MV prediction already sits below half the
         * quantization-noise floor, nothing a finer partition codes can
         * beat skip: collapse to an unsplit block (its own RD then
         * picks skip/skip_mode). */
        const int32_t *pq = c->qtab + ((q * 3) + 0) * 10;
        double step = (double)pq[9] / 8.0;
        double npx = (double)size * size;
        static __thread int32_t mg_pred[64 * 64];
        /* LAST recon planes (always attached) — srefp is per-block */
        tpui_mc_block(c->refp[0], c->ref_stride[0], c->width, c->height,
                      c4 * 4, r * 4, size, size, c->gm_mv[1] * 2,
                      c->gm_mv[0] * 2, c->bd, mg_pred);
        long psse = 0;
        {
            const uint16_t *sy = c->src[0];
            int ss = c->sstride[0];
            for (int i = 0; i < size; i++)
                for (int j = 0; j < size; j++) {
                    long dd = (long)sy[(r * 4 + i) * ss + c4 * 4 + j] -
                              mg_pred[i * size + j];
                    psse += dd * dd;
                }
        }
        {
            static double beta = -1.0;
            if (beta < 0) {
                const char *e = getenv("SVT_MERGE_BETA");
                beta = e ? atof(e) : 1.0 / 12.0;
            }
            if ((double)psse < npx * step * step * beta) split = 0;
        }
    }
    if (split) {
        tpu_write_partition(c, r, c4, size, 3);
        int h4 = w4 >> 1;
        walk_p(c, r, c4, size / 2, s64, s32, s16, m64, m32, m16, m8, nc64,
               nc32, nc16, nc8, mv16, mv16b, mv16_cols, q, dq_pending, prev_q,
               dq_res_log2);
        walk_p(c, r, c4 + h4, size / 2, s64, s32, s16, m64, m32, m16, m8,
               nc64, nc32, nc16, nc8, mv16, mv16b, mv16_cols, q, dq_pending,
               prev_q, dq_res_log2);
        walk_p(c, r + h4, c4, size / 2, s64, s32, s16, m64, m32, m16, m8,
               nc64, nc32, nc16, nc8, mv16, mv16b, mv16_cols, q, dq_pending,
               prev_q, dq_res_log2);
        walk_p(c, r + h4, c4 + h4, size / 2, s64, s32, s16, m64, m32, m16,
               m8, nc64, nc32, nc16, nc8, mv16, mv16b, mv16_cols, q, dq_pending,
               prev_q, dq_res_log2);
        return;
    }
    tpu_write_partition(c, r, c4, size, 0);
    const uint8_t *mm = size == 64 ? m64
                        : size == 32 ? m32
                        : size == 16 ? m16 : m8;
    int nc = size == 64 ? nc64
             : size == 32 ? nc32
             : size == 16 ? nc16 : nc8;
    const uint8_t *icand =
        mm + (((r * 4) / size) * nc + (c4 * 4) / size) * 3;
    encode_block_p(c, r, c4, size, icand, mv16, mv16b, mv16_cols, q, dq_pending,
                   prev_q, dq_res_log2);
    tpu_update_part_ctx(c, r, c4, size);
}

void tpuc_set_interp(TpuCommit *c, int switchable, int gm_coded) {
    c->switchable_filter = switchable;
    c->gm_coded = gm_coded;
}

void tpuc_set_obmc(TpuCommit *c, int enable, int allow_warp) {
    c->motion_mode_sw = enable;
    c->allow_warp = allow_warp;
}

void tpuc_set_interintra(TpuCommit *c, int enable) {
    c->interintra = enable;
}

void tpuc_set_gm(TpuCommit *c, int mv8_r, int mv8_c) {
    c->gm_mv[0] = mv8_r;
    c->gm_mv[1] = mv8_c;
}

/* LAST-ref ROTZOOM global motion (spec 5.9.24 type 2). Returns 1 when
 * the shear params validate (caller must not signal the model
 * otherwise). mat6 = {m0, m1, m2, m3, -m3, m2}. */
int tpuc_set_gm_warp(TpuCommit *c, const int32_t *mat6) {
    c->gm_wp_ok = 0;
    if (!mat6) return 0;
    WarpParams wp;
    for (int i = 0; i < 6; i++) wp.mat[i] = mat6[i];
    if (!shear_params_c(&wp)) return 0;
    for (int i = 0; i < 6; i++) c->gm_wp_mat[i] = mat6[i];
    c->gm_wp_shear[0] = wp.alpha;
    c->gm_wp_shear[1] = wp.beta;
    c->gm_wp_shear[2] = wp.gamma;
    c->gm_wp_shear[3] = wp.delta;
    c->gm_wp_ok = 1;
    return 1;
}


/* Second (future / ALTREF) reference for compound prediction. */
void tpuc_set_ref2(TpuCommit *c, const uint16_t *y, const uint16_t *u,
                   const uint16_t *v, int ystride, int cstride) {
    c->ref2p[0] = y;
    c->ref2p[1] = u;
    c->ref2p[2] = v;
    c->ref2_stride[0] = ystride;
    c->ref2_stride[1] = cstride;
    c->ref2_stride[2] = cstride;
    c->has_ref2 = y != NULL;
}

/* Third (GOLDEN) reference for multi-reference prediction (MRP; ref
 * pd_process.c ref lists). Selected per block via tpuc_set_ref_sel. */
void tpuc_set_ref3(TpuCommit *c, const uint16_t *y, const uint16_t *u,
                   const uint16_t *v, int ystride, int cstride) {
    c->ref3p[0] = y;
    c->ref3p[1] = u;
    c->ref3p[2] = v;
    c->ref3_stride[0] = ystride;
    c->ref3_stride[1] = cstride;
    c->ref3_stride[2] = cstride;
    c->has_ref3 = y != NULL;
}

/* Per-16x16 single-reference selection map (1 = prefer GOLDEN) + the
 * GOLDEN HME seed field — the ref-pruning-by-ME-SAD model of the
 * reference (ref motion_estimation.c:1615 ref pruning). */
void tpuc_set_ref_sel(TpuCommit *c, const uint8_t *sel,
                      const int16_t *mv16g, int cols) {
    c->ref_sel = sel;
    c->mv16g = mv16g;
    c->ref_sel_cols = cols;
}

/* Frame-level compound signalling state: skip_mode_present (spec
 * 5.9.22 derived allowance) + RefFrameSignBias[1..7]. */
void tpuc_set_compound(TpuCommit *c, int skip_mode_present,
                       const uint8_t *sign_bias8, int masked) {
    c->skip_mode_present = skip_mode_present;
    c->masked_comp = masked;
    if (sign_bias8)
        memcpy(c->sign_bias, sign_bias8, 8);
    else
        memset(c->sign_bias, 0, 8);
}

int64_t tpuc_encode_inter(TpuCommit *c, TpuEc *ec, ModeCdfs *mc,
                          TxbCdfs *tc, InterCdfs *ic,
                          const uint8_t *split64, const uint8_t *split32,
                          const uint8_t *split16, const uint8_t *mode64,
                          const uint8_t *mode32, const uint8_t *mode16,
                          const uint8_t *mode8, const int16_t *mv16,
                          const int16_t *mv16b,
                          int mv16_cols, const int16_t *sbq,
                          int dq_res_log2, int base_q, int mi_row0,
                          int mi_row1, int mi_col0, int mi_col1,
                          int n_cands) {
    c->n_cands = n_cands > 0 ? n_cands : 1;
    c->ec = ec;
    c->mc = mc;
    c->tc = tc;
    c->ic = ic;
    c->dist_acc = 0;
    if (mi_row1 <= 0) mi_row1 = c->mi_rows;
    if (mi_col1 <= 0) mi_col1 = c->mi_cols;
    c->t_mi_row0 = mi_row0;
    c->t_mi_row1 = mi_row1;
    c->t_mi_col0 = mi_col0;
    c->t_mi_col1 = mi_col1;
    if (c->grid) tpui_grid_free(c->grid);
    c->grid = tpui_grid_new(c->mi_rows, c->mi_cols);
    int paw4;
    {
        int aw = c->mi_cols * 4;
        paw4 = ((aw + 63) & ~63);
    }
    int nc64 = paw4 / 64, nc32 = paw4 / 32, nc16 = paw4 / 16,
        nc8 = paw4 / 8;
    int prev_q = base_q;
    int nsb_c = (c->mi_cols + 15) / 16;
    tpu_lr_reset_refs(c);
    for (int sbr = mi_row0; sbr < mi_row1; sbr += 16) {
        for (int sbc = mi_col0; sbc < mi_col1; sbc += 16) {
            tpu_bd_reset_sb(c, sbr, sbc);
            tpu_write_lr_sb(c, sbr, sbc);
            int q = sbq ? sbq[(sbr / 16) * nsb_c + sbc / 16] : base_q;
            c->cur_q = q;
            {
                const int32_t *pq =
                    c->qtab + ((q * 3) + 0) * 10;
                c->rdmult = tpu_lambda_for_q(c, pq, q, base_q);
            }
            int dq_pending = dq_res_log2 >= 0;
            walk_p(c, sbr, sbc, 64, split64, split32, split16, mode64,
                   mode32, mode16, mode8, nc64, nc32, nc16, nc8, mv16,
                   mv16b, mv16_cols, q, &dq_pending, &prev_q,
                   dq_res_log2);
        }
    }
    /* grid kept alive for tpuc_grid_read (MFMV motion-field save);
     * freed on the next encode_inter or at context teardown */
    return c->dist_acc;
}

/* MFMV: attach the projected temporal motion field for this frame
 * (python inter/mfmv.py setup_motion_field output). NULL mv disables. */
void tpuc_set_tpl(TpuCommit *c, const int16_t *mv, const int16_t *off,
                  const uint8_t *valid, int n8r, int n8c,
                  const int32_t *cur_off8, int allow_hp) {
    c->tpl_mv = mv;
    c->tpl_off = off;
    c->tpl_valid = valid;
    c->tpl_n8r = n8r;
    c->tpl_n8c = n8c;
    c->tpl_allow_hp = allow_hp;
    for (int i = 0; i < 8; i++)
        c->tpl_cur_off[i] = cur_off8 ? cur_off8[i] : 0;
}

/* Export the frame's coded per-mi motion info (for spec 7.20 motion
 * field storage). Arrays sized mi_rows*mi_cols (mv: *2). Returns 0 when
 * no grid is live (intra frame / never encoded). */
int tpuc_grid_read(TpuCommit *c, int8_t *ref0, int8_t *ref1, int16_t *mv0,
                   int16_t *mv1) {
    if (!c->grid) return 0;
    size_t n = (size_t)c->mi_rows * c->mi_cols;
    memcpy(ref0, c->grid->ref0, n);
    memcpy(ref1, c->grid->ref1, n);
    memcpy(mv0, c->grid->mv, n * 2 * sizeof(int16_t));
    memcpy(mv1, c->grid->mv1, n * 2 * sizeof(int16_t));
    return 1;
}
