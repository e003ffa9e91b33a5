/* Native exact integer transforms + quantizer for the commit path.
 *
 * Runs the same data-driven butterfly stage machine as
 * svt_av1_psy_tpu/ops/transforms.py (tables registered from Python at init),
 * so numpy, JAX and C backends share one source of truth for the normative
 * math. int64 accumulators like the reference's C path
 * (ref: Source/Lib/Codec/transforms.c half_btf).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define MAX_STAGES 16
#define MAX_N 64

typedef struct {
    int n;            /* points */
    int nstages;
    /* per stage, arrays of length n */
    int16_t a[MAX_STAGES][MAX_N];
    int16_t b[MAX_STAGES][MAX_N];
    uint8_t mode[MAX_STAGES][MAX_N];   /* 1 = butterfly, 0 = linear */
    uint8_t clamp[MAX_STAGES][MAX_N];
    int32_t lw0[MAX_STAGES][MAX_N];
    int32_t lw1[MAX_STAGES][MAX_N];
    int16_t c0i[MAX_STAGES][MAX_N];    /* cospi index */
    int16_t c0s[MAX_STAGES][MAX_N];    /* sign */
    int16_t c1i[MAX_STAGES][MAX_N];
    int16_t c1s[MAX_STAGES][MAX_N];
} Txfm1d;

/* cospi/sinpi per cos_bit (10..13), uploaded from Python */
static int64_t g_cospi[14][64];
static int64_t g_sinpi_tab[14][5];
void tputx_set_cospi(int cos_bit, const int64_t *cospi,
                     const int64_t *sinpi) {
    memcpy(g_cospi[cos_bit], cospi, sizeof(int64_t) * 64);
    memcpy(g_sinpi_tab[cos_bit], sinpi, sizeof(int64_t) * 5);
}

/* registry: [fwd?1:0][kind 0=dct 1=adst][log2n-2] ; adst4 handled separately */
static Txfm1d g_txfms[2][2][5];
static int g_have[2][2][5];

void tputx_register(int forward, int kind, int log2n_m2, int nstages, int n,
                    const int16_t *a, const int16_t *b, const uint8_t *mode,
                    const uint8_t *clamp, const int32_t *lw0,
                    const int32_t *lw1, const int16_t *c0i,
                    const int16_t *c0s, const int16_t *c1i,
                    const int16_t *c1s) {
    Txfm1d *t = &g_txfms[forward][kind][log2n_m2];
    int s;
    t->n = n;
    t->nstages = nstages;
    for (s = 0; s < nstages; s++) {
        memcpy(t->a[s], a + s * n, sizeof(int16_t) * n);
        memcpy(t->b[s], b + s * n, sizeof(int16_t) * n);
        memcpy(t->mode[s], mode + s * n, sizeof(uint8_t) * n);
        memcpy(t->clamp[s], clamp + s * n, sizeof(uint8_t) * n);
        memcpy(t->lw0[s], lw0 + s * n, sizeof(int32_t) * n);
        memcpy(t->lw1[s], lw1 + s * n, sizeof(int32_t) * n);
        memcpy(t->c0i[s], c0i + s * n, sizeof(int16_t) * n);
        memcpy(t->c0s[s], c0s + s * n, sizeof(int16_t) * n);
        memcpy(t->c1i[s], c1i + s * n, sizeof(int16_t) * n);
        memcpy(t->c1s[s], c1s + s * n, sizeof(int16_t) * n);
    }
    g_have[forward][kind][log2n_m2] = 1;
}

static void run_stages(int64_t *x, const Txfm1d *t, int cos_bit,
                       int clamp_bits) {
    int64_t tmp[MAX_N];
    int64_t half = 1ll << (cos_bit - 1);
    const int64_t *cospi = g_cospi[cos_bit];
    int s, i;
    int n = t->n;
    for (s = 0; s < t->nstages; s++) {
        for (i = 0; i < n; i++) {
            int64_t xa = x[t->a[s][i]];
            int64_t xb = x[t->b[s][i]];
            if (t->mode[s][i]) {
                int64_t w0 = (int64_t)t->c0s[s][i] * cospi[t->c0i[s][i]];
                int64_t w1 = (int64_t)t->c1s[s][i] * cospi[t->c1i[s][i]];
                tmp[i] = (w0 * xa + w1 * xb + half) >> cos_bit;
            } else {
                int64_t v = (int64_t)t->lw0[s][i] * xa +
                            (int64_t)t->lw1[s][i] * xb;
                if (clamp_bits > 0 && t->clamp[s][i]) {
                    int64_t hi = (1ll << (clamp_bits - 1)) - 1;
                    int64_t lo = -(1ll << (clamp_bits - 1));
                    if (v > hi) v = hi;
                    if (v < lo) v = lo;
                }
                tmp[i] = v;
            }
        }
        memcpy(x, tmp, sizeof(int64_t) * n);
    }
}

/* ---- lane-parallel variants --------------------------------------------
 * The 2-D transform applies the SAME 1-D butterfly program to every
 * column (then every row). Rather than interpreting the program once per
 * column, these variants keep the data as [element][lane] (lane = column
 * or row index) and run each butterfly over all L lanes in a contiguous
 * inner loop — the structure a SIMD unit wants (auto-vectorized with
 * -march=native; AVX-512 does 8 int64 lanes per op). Identical per-lane
 * integer ops, so results stay bit-exact vs run_stages. This is the
 * replacement for the reference's per-size hand-written SIMD
 * (ASM_AVX2/av1_fwd_txfm2d_*.c) with one generic kernel. */
static void run_stages_ln(int64_t *x, const Txfm1d *t, int cos_bit,
                          int clamp_bits, int L) {
    static __thread int64_t tmp[MAX_N * MAX_N];
    int64_t half = 1ll << (cos_bit - 1);
    const int64_t *cospi = g_cospi[cos_bit];
    int s, i, l;
    int n = t->n;
    /* ping-pong between x and tmp instead of a per-stage copy-back */
    int64_t *cur = x, *nxt = tmp;
    for (s = 0; s < t->nstages; s++) {
        for (i = 0; i < n; i++) {
            const int64_t *xa = cur + (int)t->a[s][i] * L;
            const int64_t *xb = cur + (int)t->b[s][i] * L;
            int64_t *o = nxt + i * L;
            if (t->mode[s][i]) {
                int64_t w0 = (int64_t)t->c0s[s][i] * cospi[t->c0i[s][i]];
                int64_t w1 = (int64_t)t->c1s[s][i] * cospi[t->c1i[s][i]];
                for (l = 0; l < L; l++)
                    o[l] = (w0 * xa[l] + w1 * xb[l] + half) >> cos_bit;
            } else {
                int64_t lw0 = t->lw0[s][i], lw1 = t->lw1[s][i];
                if (clamp_bits > 0 && t->clamp[s][i]) {
                    int64_t hi = (1ll << (clamp_bits - 1)) - 1;
                    int64_t lo = -(1ll << (clamp_bits - 1));
                    for (l = 0; l < L; l++) {
                        int64_t v = lw0 * xa[l] + lw1 * xb[l];
                        if (v > hi) v = hi;
                        if (v < lo) v = lo;
                        o[l] = v;
                    }
                } else {
                    for (l = 0; l < L; l++)
                        o[l] = lw0 * xa[l] + lw1 * xb[l];
                }
            }
        }
        {
            int64_t *sw = cur;
            cur = nxt;
            nxt = sw;
        }
    }
    if (cur != x) memcpy(x, cur, sizeof(int64_t) * n * L);
}

static void adst4_ln(int64_t *x, int cos_bit, int forward, int L) {
    int64_t half = 1ll << (cos_bit - 1);
    const int64_t *g_sinpi = g_sinpi_tab[cos_bit];
    int64_t *x0 = x, *x1 = x + L, *x2 = x + 2 * L, *x3 = x + 3 * L;
    int l;
    if (forward) {
        for (l = 0; l < L; l++) {
            int64_t s0 = g_sinpi[1] * x0[l];
            int64_t s1 = g_sinpi[4] * x0[l];
            int64_t s2 = g_sinpi[2] * x1[l];
            int64_t s3 = g_sinpi[1] * x1[l];
            int64_t s4 = g_sinpi[3] * x2[l];
            int64_t s5 = g_sinpi[4] * x3[l];
            int64_t s6 = g_sinpi[2] * x3[l];
            int64_t s7 = (x0[l] + x1[l]) - x3[l];
            int64_t t0 = s0 + s2 + s5;
            int64_t t1 = g_sinpi[3] * s7;
            int64_t t2 = s1 - s3 + s6;
            int64_t t3 = s4;
            x0[l] = (t0 + t3 + half) >> cos_bit;
            x1[l] = (t1 + half) >> cos_bit;
            x2[l] = (t2 - t3 + half) >> cos_bit;
            x3[l] = (t2 - t0 + t3 + half) >> cos_bit;
        }
    } else {
        for (l = 0; l < L; l++) {
            int64_t s0 = g_sinpi[1] * x0[l];
            int64_t s1 = g_sinpi[2] * x0[l];
            int64_t s2 = g_sinpi[3] * x1[l];
            int64_t s3 = g_sinpi[4] * x2[l];
            int64_t s4 = g_sinpi[1] * x2[l];
            int64_t s5 = g_sinpi[2] * x3[l];
            int64_t s6 = g_sinpi[4] * x3[l];
            int64_t s7 = (x0[l] - x2[l]) + x3[l];
            int64_t t0 = s0 + s3 + s5;
            int64_t t1 = s1 - s4 - s6;
            int64_t t3 = s2;
            int64_t t2 = g_sinpi[3] * s7;
            x0[l] = (t0 + t3 + half) >> cos_bit;
            x1[l] = (t1 + t3 + half) >> cos_bit;
            x2[l] = (t2 + half) >> cos_bit;
            x3[l] = ((t0 + t1) - t3 + half) >> cos_bit;
        }
    }
}


static void adst4(int64_t *x, int cos_bit, int forward) {
    int64_t s0, s1, s2, s3, s4, s5, s6, s7, t0, t1, t2, t3, o0, o1, o2, o3;
    int64_t half = 1ll << (cos_bit - 1);
    const int64_t *g_sinpi = g_sinpi_tab[cos_bit];
    if (forward) {
        s0 = g_sinpi[1] * x[0];
        s1 = g_sinpi[4] * x[0];
        s2 = g_sinpi[2] * x[1];
        s3 = g_sinpi[1] * x[1];
        s4 = g_sinpi[3] * x[2];
        s5 = g_sinpi[4] * x[3];
        s6 = g_sinpi[2] * x[3];
        s7 = (x[0] + x[1]) - x[3];
        t0 = s0 + s2 + s5;
        t1 = g_sinpi[3] * s7;
        t2 = s1 - s3 + s6;
        t3 = s4;
        o0 = t0 + t3;
        o1 = t1;
        o2 = t2 - t3;
        o3 = t2 - t0 + t3;
    } else {
        s0 = g_sinpi[1] * x[0];
        s1 = g_sinpi[2] * x[0];
        s2 = g_sinpi[3] * x[1];
        s3 = g_sinpi[4] * x[2];
        s4 = g_sinpi[1] * x[2];
        s5 = g_sinpi[2] * x[3];
        s6 = g_sinpi[4] * x[3];
        s7 = (x[0] - x[2]) + x[3];
        t0 = s0 + s3 + s5;
        t1 = s1 - s4 - s6;
        t3 = s2;
        t2 = g_sinpi[3] * s7;
        o0 = t0 + t3;
        o1 = t1 + t3;
        o2 = t2;
        o3 = (t0 + t1) - t3;
    }
    x[0] = (o0 + half) >> cos_bit;
    x[1] = (o1 + half) >> cos_bit;
    x[2] = (o2 + half) >> cos_bit;
    x[3] = (o3 + half) >> cos_bit;
}

#define NEW_SQRT2 5793
#define NEW_INV_SQRT2 2896
#define NEW_SQRT2_BITS 12

static void identity_1d(int64_t *x, int n) {
    int i;
    if (n == 4)
        for (i = 0; i < 4; i++)
            x[i] = (x[i] * NEW_SQRT2 + 2048) >> 12;
    else if (n == 8)
        for (i = 0; i < 8; i++) x[i] *= 2;
    else if (n == 16)
        for (i = 0; i < 16; i++)
            x[i] = (x[i] * 2 * NEW_SQRT2 + 2048) >> 12;
    else if (n == 32)
        for (i = 0; i < 32; i++) x[i] *= 4;
    else
        for (i = 0; i < 64; i++)
            x[i] = (x[i] * 4 * NEW_SQRT2 + 2048) >> 12;
}

static void identity_ln(int64_t *x, int n, int L) {
    int i;
    int total = n * L;
    if (n == 4)
        for (i = 0; i < total; i++)
            x[i] = (x[i] * NEW_SQRT2 + 2048) >> 12;
    else if (n == 8)
        for (i = 0; i < total; i++) x[i] *= 2;
    else if (n == 16)
        for (i = 0; i < total; i++)
            x[i] = (x[i] * 2 * NEW_SQRT2 + 2048) >> 12;
    else if (n == 32)
        for (i = 0; i < total; i++) x[i] *= 4;
    else
        for (i = 0; i < total; i++)
            x[i] = (x[i] * 4 * NEW_SQRT2 + 2048) >> 12;
}

static int log2i(int v) {
    int n = -1;
    while (v) {
        v >>= 1;
        n++;
    }
    return n;
}

/* kind: 0=DCT 1=ADST 2=FLIPADST 3=IDTX; flips handled by caller */
static void run_1d(int64_t *x, int kind, int n, int cos_bit, int clamp_bits,
                   int forward) {
    if (kind == 3) {
        identity_1d(x, n);
        return;
    }
    if ((kind == 1 || kind == 2) && n == 4) {
        adst4(x, cos_bit, forward);
        return;
    }
    {
        int k = (kind == 1 || kind == 2) ? 1 : 0;
        run_stages(x, &g_txfms[forward][k][log2i(n) - 2], cos_bit,
                   forward ? 0 : clamp_bits);
    }
}

/* lane-parallel 1-D transform over x[n][L] (all L vectors at once) */
static void run_1d_ln(int64_t *x, int kind, int n, int cos_bit,
                      int clamp_bits, int forward, int L) {
    if (kind == 3) {
        identity_ln(x, n, L);
        return;
    }
    if ((kind == 1 || kind == 2) && n == 4) {
        adst4_ln(x, cos_bit, forward, L);
        return;
    }
    {
        int k = (kind == 1 || kind == 2) ? 1 : 0;
        run_stages_ln(x, &g_txfms[forward][k][log2i(n) - 2], cos_bit,
                      forward ? 0 : clamp_bits, L);
    }
}

static void round_shift_arr(int64_t *x, int n, int bit) {
    int i;
    if (bit == 0) return;
    if (bit > 0) {
        int64_t half = 1ll << (bit - 1);
        for (i = 0; i < n; i++) x[i] = (x[i] + half) >> bit;
    } else {
        for (i = 0; i < n; i++) x[i] <<= -bit;
    }
}

static void clamp_arr(int64_t *x, int n, int bits) {
    int64_t hi = (1ll << (bits - 1)) - 1, lo = -(1ll << (bits - 1));
    int i;
    for (i = 0; i < n; i++) {
        if (x[i] > hi) x[i] = hi;
        if (x[i] < lo) x[i] = lo;
    }
}

/* tables mirrored from ops/transforms.py */
static const int8_t INV_SHIFT[19][2] = {
    {0, -4}, {-1, -4}, {-2, -4}, {-2, -4}, {-2, -4}, {0, -4}, {0, -4},
    {-1, -4}, {-1, -4}, {-1, -4}, {-1, -4}, {-1, -4}, {-1, -4}, {-1, -4},
    {-1, -4}, {-2, -4}, {-2, -4}, {-2, -4}, {-2, -4}};
static const int8_t FWD_SHIFT[19][3] = {
    {2, 0, 0}, {2, -1, 0}, {2, -2, 0}, {2, -4, 0}, {0, -2, -2},
    {2, -1, 0}, {2, -1, 0}, {2, -2, 0}, {2, -2, 0}, {2, -4, 0},
    {2, -4, 0}, {0, -2, -2}, {2, -4, -2}, {2, -1, 0}, {2, -1, 0},
    {2, -2, 0}, {2, -2, 0}, {0, -2, 0}, {2, -4, 0}};
static const int8_t FWD_COS_BIT_COL[5][5] = {
    {13, 13, 13, 0, 0}, {13, 13, 13, 12, 0}, {13, 13, 13, 12, 13},
    {0, 13, 13, 12, 13}, {0, 0, 13, 12, 13}};
static const int8_t FWD_COS_BIT_ROW[5][5] = {
    {13, 13, 12, 0, 0}, {13, 13, 13, 12, 0}, {13, 13, 12, 13, 12},
    {0, 12, 13, 12, 11}, {0, 0, 12, 11, 10}};
static const int8_t VTX_TAB[16] = {0, 1, 0, 1, 2, 0, 2, 1, 2, 3, 0, 3, 1,
                                   3, 2, 3};
static const int8_t HTX_TAB[16] = {0, 0, 1, 1, 0, 2, 2, 2, 1, 3, 3, 0, 3,
                                   1, 3, 2};
static const int16_t TSW[19] = {4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32,
                                32, 64, 4, 16, 8, 32, 16, 64};
static const int16_t TSH[19] = {4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16,
                                64, 32, 16, 4, 32, 8, 64, 16};

#define INV_COS_BIT 12

/* inverse: coeff (compact ch x cw int32) -> residual (h x w int32)
 * exact mirror of ops/transforms.py inverse_transform_2d */
void tputx_inv2d(const int32_t *coeff, int32_t *resid, int tx_size,
                 int tx_type, int bd) {
    int w = TSW[tx_size], h = TSH[tx_size];
    int cw = w > 32 ? 32 : w, ch = h > 32 ? 32 : h;
    int vk = VTX_TAB[tx_type], hk = HTX_TAB[tx_type];
    int ud_flip = vk == 2, lr_flip = hk == 2;
    int s0 = INV_SHIFT[tx_size][0], s1 = INV_SHIFT[tx_size][1];
    int range_row = bd == 8 ? 16 : (bd == 10 ? 18 : 20);
    int range_col = bd <= 10 ? 16 : 18;
    int lw = log2i(w), lh = log2i(h);
    int rect = (lw - lh == 1) || (lh - lw == 1);
    static __thread int64_t buf[64 * 64];
    static __thread int64_t colbuf[64 * 64]; /* transposed (w x h) */
    int64_t line[MAX_N];
    int i, j;

    /* row pass, lane-parallel over the h rows: layout [element j][lane i]
     * (identical per-lane integer ops as the per-row loop — bit-exact) */
    memset(colbuf, 0, sizeof(int64_t) * w * h);
    for (i = 0; i < ch; i++)
        for (j = 0; j < cw; j++) {
            int64_t v = coeff[i * cw + j];
            if (rect) v = (v * NEW_INV_SQRT2 + 2048) >> 12;
            colbuf[j * h + i] = v;
        }
    clamp_arr(colbuf, w * h, bd + 8);
    run_1d_ln(colbuf, hk, w, INV_COS_BIT, range_row, 0, h);
    round_shift_arr(colbuf, w * h, -s0);
    /* transpose to [element i][lane j] (+ lr flip over the column index) */
    for (j = 0; j < w; j++) {
        int sj = lr_flip ? (w - 1 - j) : j;
        for (i = 0; i < h; i++) buf[i * w + j] = colbuf[sj * h + i];
    }
    clamp_arr(buf, w * h, (bd + 6) > 16 ? (bd + 6) : 16);
    run_1d_ln(buf, vk, h, INV_COS_BIT, range_col, 0, w);
    round_shift_arr(buf, w * h, -s1);
    /* ud flip over the h index */
    for (i = 0; i < h; i++) {
        int si = ud_flip ? (h - 1 - i) : i;
        for (j = 0; j < w; j++)
            resid[i * w + j] = (int32_t)buf[si * w + j];
    }
    (void)line;
}

/* forward: residual (h x w int32) -> compact coeff (ch x cw int32)
 * exact mirror of ops/transforms.py forward_transform_2d */
void tputx_fwd2d(const int32_t *residual, int32_t *coeff, int tx_size,
                 int tx_type, int bd) {
    int w = TSW[tx_size], h = TSH[tx_size];
    int cw = w > 32 ? 32 : w, ch = h > 32 ? 32 : h;
    int lw = log2i(w), lh = log2i(h);
    int txw_idx = lw - 2, txh_idx = lh - 2;
    int s0 = FWD_SHIFT[tx_size][0], s1 = FWD_SHIFT[tx_size][1],
        s2 = FWD_SHIFT[tx_size][2];
    int cos_bit_col = FWD_COS_BIT_COL[txw_idx][txh_idx];
    int cos_bit_row = FWD_COS_BIT_ROW[txw_idx][txh_idx];
    int vk = VTX_TAB[tx_type], hk = HTX_TAB[tx_type];
    int ud_flip = vk == 2, lr_flip = hk == 2;
    int rect = (lw - lh == 1) || (lh - lw == 1);
    static __thread int64_t colbuf[64 * 64]; /* (w x h): columns */
    static __thread int64_t buf[64 * 64];    /* (h x w) */
    int i, j;
    (void)bd;

    /* column pass, lane-parallel over the w columns: the [element i]
     * [lane j] layout IS the input's row-major layout (with ud flip on
     * the element index) — no gather needed */
    for (i = 0; i < h; i++) {
        int si = ud_flip ? (h - 1 - i) : i;
        for (j = 0; j < w; j++) buf[i * w + j] = residual[si * w + j];
    }
    round_shift_arr(buf, w * h, -s0);
    run_1d_ln(buf, vk, h, cos_bit_col, 0, 1, w);
    round_shift_arr(buf, w * h, -s1);
    /* transpose to [element j][lane i] (+ lr flip over the column index) */
    for (j = 0; j < w; j++) {
        int sj = lr_flip ? (w - 1 - j) : j;
        for (i = 0; i < h; i++) colbuf[j * h + i] = buf[i * w + sj];
    }
    run_1d_ln(colbuf, hk, w, cos_bit_row, 0, 1, h);
    round_shift_arr(colbuf, w * h, -s2);
    if (rect)
        for (i = 0; i < w * h; i++)
            colbuf[i] = (colbuf[i] * NEW_SQRT2 + 2048) >> 12;
    for (i = 0; i < ch; i++)
        for (j = 0; j < cw; j++)
            coeff[i * cw + j] = (int32_t)colbuf[j * h + i];
}

/* quantize_b: exact mirror of ops/quant.py quantize_b (no-QM path;
 * the *32 weight fold is kept so rounding matches bit-for-bit) */
void tputx_quantize_b(const int32_t *coeff, int32_t *qc, int32_t *dqc,
                      int n, int log_scale,
                      int zbin_dc, int zbin_ac, int rnd_dc, int rnd_ac,
                      int quant_dc, int quant_ac, int qshift_dc,
                      int qshift_ac, int deq_dc, int deq_ac) {
    int i;
    int half = (1 << log_scale) >> 1;
    int zb_dc = (zbin_dc + half) >> log_scale;
    int zb_ac = (zbin_ac + half) >> log_scale;
    int rn_dc = (rnd_dc + half) >> log_scale;
    int rn_ac = (rnd_ac + half) >> log_scale;
    for (i = 0; i < n; i++) {
        int dc = i == 0;
        int32_t c = coeff[i];
        int sign = c < 0 ? -1 : 1;
        int64_t ac = c < 0 ? -(int64_t)c : c;
        int64_t tmp, tmp32, dqv, absdq;
        if (ac * 32 < ((int64_t)(dc ? zb_dc : zb_ac) << 5)) {
            qc[i] = 0;
            dqc[i] = 0;
            continue;
        }
        tmp = ac + (dc ? rn_dc : rn_ac);
        if (tmp > 32767) tmp = 32767;
        tmp *= 32;
        tmp32 = ((((tmp * (dc ? quant_dc : quant_ac)) >> 16) + tmp) *
                 (dc ? qshift_dc : qshift_ac)) >> (16 - log_scale + 5);
        qc[i] = (int32_t)(tmp32 * sign);
        dqv = (((int64_t)(dc ? deq_dc : deq_ac)) * 32 + 16) >> 5;
        absdq = (tmp32 * dqv) >> log_scale;
        dqc[i] = (int32_t)(absdq * sign);
    }
}

/* quantize_b with quantizer matrices (ref svt_aom_quantize_b_c QM path,
 * full_loop.c:78; exact mirror of ops/quant.py quantize_b with qm/iqm):
 * wt/iwt are the per-coefficient Q5 weights in raster order. */
void tputx_quantize_b_qm(const int32_t *coeff, int32_t *qc, int32_t *dqc,
                         int n, int log_scale,
                         int zbin_dc, int zbin_ac, int rnd_dc, int rnd_ac,
                         int quant_dc, int quant_ac, int qshift_dc,
                         int qshift_ac, int deq_dc, int deq_ac,
                         const int32_t *wt, const int32_t *iwt) {
    int i;
    int half = (1 << log_scale) >> 1;
    int zb_dc = (zbin_dc + half) >> log_scale;
    int zb_ac = (zbin_ac + half) >> log_scale;
    int rn_dc = (rnd_dc + half) >> log_scale;
    int rn_ac = (rnd_ac + half) >> log_scale;
    for (i = 0; i < n; i++) {
        int dc = i == 0;
        int32_t c = coeff[i];
        int sign = c < 0 ? -1 : 1;
        int64_t ac = c < 0 ? -(int64_t)c : c;
        int64_t w = wt[i], iw = iwt[i];
        int64_t tmp, tmp32, dqv, absdq;
        if (ac * w < ((int64_t)(dc ? zb_dc : zb_ac) << 5)) {
            qc[i] = 0;
            dqc[i] = 0;
            continue;
        }
        tmp = ac + (dc ? rn_dc : rn_ac);
        if (tmp > 32767) tmp = 32767;
        tmp *= w;
        tmp32 = ((((tmp * (dc ? quant_dc : quant_ac)) >> 16) + tmp) *
                 (dc ? qshift_dc : qshift_ac)) >> (16 - log_scale + 5);
        qc[i] = (int32_t)(tmp32 * sign);
        dqv = (((int64_t)(dc ? deq_dc : deq_ac)) * iw + 16) >> 5;
        absdq = (tmp32 * dqv) >> log_scale;
        dqc[i] = (int32_t)(absdq * sign);
    }
}

/* Fused encoder RD trial for one txb candidate: forward transform,
 * quantize, dequantize, inverse transform, SSE vs the residual, and the
 * exact coefficient rate from the live CDFs. One call replaces four
 * python<->C roundtrips in the mode-decision inner loop. */
typedef struct TxbCdfs TxbCdfs;
int tpuec_cost_txb(TxbCdfs *cdfs, const int32_t *qcoeff,
                   const int16_t *scan, int n, int w, int h, int rw, int rh,
                   int ems, int txs_ctx, int tx_class, int ptype,
                   int sign_ctx);

double tputx_rd_txb(const int32_t *resid, int tx_size, int tx_type, int bd,
                    int log_scale,
                    int zbin_dc, int zbin_ac, int rnd_dc, int rnd_ac,
                    int quant_dc, int quant_ac, int qshift_dc, int qshift_ac,
                    int deq_dc, int deq_ac,
                    const int16_t *scan, int nscan, int cw, int ch,
                    int rw, int rh, int ems, int txs_ctx, int tx_class,
                    int ptype, int sign_ctx, TxbCdfs *cdfs,
                    int32_t *qc_out, int *rate512_out) {
    static __thread int32_t coeff[32 * 32], dqc[32 * 32], rec[64 * 64];
    int n = cw * ch;
    int full = rw * rh;
    int i;
    tputx_fwd2d(resid, coeff, tx_size, tx_type, bd);
    tputx_quantize_b(coeff, qc_out, dqc, n, log_scale,
                     zbin_dc, zbin_ac, rnd_dc, rnd_ac, quant_dc, quant_ac,
                     qshift_dc, qshift_ac, deq_dc, deq_ac);
    int any = 0;
    for (i = 0; i < n; i++)
        if (qc_out[i]) { any = 1; break; }
    double sse = 0.0;
    if (!any) {
        for (i = 0; i < full; i++) sse += (double)resid[i] * resid[i];
        *rate512_out = 0;
        return sse;
    }
    tputx_inv2d(dqc, rec, tx_size, tx_type, bd);
    for (i = 0; i < full; i++) {
        double d = (double)resid[i] - rec[i];
        sse += d * d;
    }
    *rate512_out = tpuec_cost_txb(cdfs, qc_out, scan, nscan, cw, ch, rw, rh,
                                  ems, txs_ctx, tx_class, ptype, sign_ctx);
    return sse;
}
