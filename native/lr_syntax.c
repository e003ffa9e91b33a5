/* Loop-restoration unit syntax for the fast-path commit walks.
 *
 * Mirrors spec 5.11.57 read_lr / read_lr_unit exactly (the encode side of
 * the decoder's tile_parser LR path, and the native analog of
 * entropy/tile_writer.py write_lr). Reference counterpart (behavioral):
 * Source/Lib/Codec/entropy_coding.c loop_restoration_write_sb_coeffs.
 *
 * Per-tile subexp reference state (lr_ref_wiener / lr_ref_sgr) lives in
 * the TpuCommit engine -- one engine per tile, reset at every walk start,
 * matching the decoder's per-tile clear_loop_restoration.
 */
#include "commit_internal.h"

/* coded-value spec for the three free wiener taps: {min, max, subexp k}
 * (spec wiener_taps_min/max/k) */
static const int WTAP_MIN[3] = {-5, -23, -17};
static const int WTAP_MAX[3] = {10, 8, 46};
static const int WTAP_K[3] = {1, 2, 3};

/* SGR_PARAMS r0/r1 presence per ep (ops/restoration.py SGR_PARAMS) */
static const int SGR_R0[16] = {1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1};
static const int SGR_R1[16] = {1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0};

static void enc_quniform(TpuEc *ec, int n, int v) {
    if (n <= 1) return;
    int ln = 0;                          /* bit_length(n-1) */
    for (int t = n - 1; t; t >>= 1) ln++;
    int m = (1 << ln) - n;
    if (v < m) {
        tpuec_literal(ec, v, ln - 1);
    } else {
        tpuec_literal(ec, m + ((v - m) >> 1), ln - 1);
        tpuec_literal(ec, (v - m) & 1, 1);
    }
}

static void enc_subexp(TpuEc *ec, int n, int k, int v) {
    int i = 0, mk = 0;
    for (;;) {
        int b2 = i ? (k + i - 1) : k;
        int a = 1 << b2;
        if (n <= mk + 3 * a) {
            enc_quniform(ec, n - mk, v - mk);
            return;
        }
        int t = v >= mk + a;
        tpuec_literal(ec, t, 1);
        if (t) {
            i++;
            mk += a;
        } else {
            tpuec_literal(ec, v - mk, b2);
            return;
        }
    }
}

static int recenter(int r, int x) {
    if (x > (r << 1)) return x;
    if (x >= r) return (x - r) << 1;
    return ((r - x) << 1) - 1;
}

static void enc_signed_subexp(TpuEc *ec, int low, int high, int k, int ref,
                              int v) {
    int n = high - low;
    int rr = ref - low;
    int x = v - low;
    if ((rr << 1) <= n)
        enc_subexp(ec, n, k, recenter(rr, x));
    else
        enc_subexp(ec, n, k, recenter(n - 1 - rr, n - 1 - x));
}

void tpuc_set_lr(TpuCommit *c, const int32_t *ftype, const int32_t *usize,
                 const int16_t *u0, const int16_t *u1, const int16_t *u2,
                 const int32_t *ucols, const int32_t *urows) {
    const int16_t *us[3] = {u0, u1, u2};
    for (int p = 0; p < 3; p++) {
        c->lr_ftype[p] = ftype ? ftype[p] : 0;
        c->lr_usize[p] = usize ? usize[p] : 0;
        c->lr_units[p] = us[p];
        c->lr_ucols[p] = ucols ? ucols[p] : 0;
        c->lr_urows[p] = urows ? urows[p] : 0;
    }
}

void tpu_lr_reset_refs(TpuCommit *c) {
    for (int p = 0; p < 3; p++) {
        for (int d = 0; d < 2; d++) {
            c->lr_ref_wiener[p][d][0] = 3;
            c->lr_ref_wiener[p][d][1] = -7;
            c->lr_ref_wiener[p][d][2] = 15;
        }
        c->lr_ref_sgr[p][0] = -32;
        c->lr_ref_sgr[p][1] = 31;
    }
}

/* one unit: restoration type symbol + params (spec read_lr_unit) */
static void write_lr_unit(TpuCommit *c, int plane, int ur, int uc) {
    const int16_t *u =
        c->lr_units[plane] + ((long)ur * c->lr_ucols[plane] + uc) * 10;
    int rtype = u[0];
    int ftype = c->lr_ftype[plane];
    if (ftype == 3)
        tpuec_symbol(c->ec, rtype, c->mc->switchable_restore, 3, 1);
    else if (ftype == 1)
        tpuec_symbol(c->ec, rtype == 1, c->mc->wiener_restore, 2, 1);
    else
        tpuec_symbol(c->ec, rtype == 2, c->mc->sgrproj_restore, 2, 1);
    if (rtype == 1) {
        /* vertical taps then horizontal (decoder read order) */
        for (int d = 0; d < 2; d++) {
            int first = plane ? 1 : 0;
            for (int j = first; j < 3; j++) {
                int v = u[1 + d * 3 + j];
                enc_signed_subexp(c->ec, WTAP_MIN[j], WTAP_MAX[j] + 1,
                                  WTAP_K[j], c->lr_ref_wiener[plane][d][j],
                                  v);
                c->lr_ref_wiener[plane][d][j] = v;
            }
        }
    } else if (rtype == 2) {
        int ep = u[7], x0 = u[8], x1 = u[9];
        tpuec_literal(c->ec, ep, 4);
        if (SGR_R0[ep])
            enc_signed_subexp(c->ec, -96, 32, 4, c->lr_ref_sgr[plane][0],
                              x0);
        if (SGR_R1[ep])
            enc_signed_subexp(c->ec, -32, 96, 4, c->lr_ref_sgr[plane][1],
                              x1);
        c->lr_ref_sgr[plane][0] = x0;
        c->lr_ref_sgr[plane][1] = x1;
    }
}

/* all units whose start falls inside this SB (spec read_lr loop; same
 * index math as tile_writer.write_lr) */
void tpu_write_lr_sb(TpuCommit *c, int sbr, int sbc) {
    for (int plane = 0; plane < 3; plane++) {
        if (!c->lr_ftype[plane] || !c->lr_units[plane]) continue;
        int sub = plane ? 1 : 0;
        int usize = c->lr_usize[plane];
        int px = 4 >> sub;                      /* px per mi unit */
        int urows = c->lr_urows[plane], ucols = c->lr_ucols[plane];
        int r0 = (sbr * px + usize - 1) / usize;
        int r1 = ((sbr + 16) * px + usize - 1) / usize;
        if (r1 > urows) r1 = urows;
        int c0 = (sbc * px + usize - 1) / usize;
        int c1 = ((sbc + 16) * px + usize - 1) / usize;
        if (c1 > ucols) c1 = ucols;
        for (int ur = r0; ur < r1; ur++)
            for (int uc = c0; uc < c1; uc++)
                write_lr_unit(c, plane, ur, uc);
    }
}
