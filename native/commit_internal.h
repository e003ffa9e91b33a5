/* Private shared state between commit_backend.c (intra walk) and
 * inter_backend.c (P-frame walk). Not part of the Python ABI. */
#ifndef TPU_COMMIT_INTERNAL_H
#define TPU_COMMIT_INTERNAL_H

#include "tpu_native.h"

typedef struct InterGrid InterGrid;

struct TpuCommit {
    int width, height, bd;
    int mi_rows, mi_cols;
    int ystride, cstride;
    uint16_t *plane[3];
    int planes_owned;
    /* tile bounds (mi units); whole frame when not set */
    int t_mi_row0, t_mi_row1, t_mi_col0, t_mi_col1;
    const uint16_t *src[3];
    int sstride[3];
    int32_t qtab[256 * 3 * 10];
    /* quantizer matrices (spec 5.9.12): flat per-plane forward/inverse
     * Q5 weight tables at the frame's qm level, laid out over the
     * self-adjusted tx sizes in TX_SIZES_ALL order (libaom av1_qm_init
     * layout; ref md_config_process.c:218 svt_av1_qm_init). NULL = flat
     * (level 15 / QM off). */
    const int32_t *qm_wt[3], *qm_iwt[3];
    /* PSY noise-normalization strength 0..4 (ref full_loop.c:1464;
     * auto 3 at tune 3 handled by the caller) */
    int noise_norm;
    /* Tune 3: SSIM-weighted candidate distortion (the DIST_SSIM arm of
     * md_stage_3; ref enc_mode_config.c:7883 tune_ssim_level) */
    int tune_ssim;
    /* PSY max-32-tx-size: force the depth-1 split for 64-side TX
     * (ref README.md:67-69) */
    int max_tx32;
    /* neighbor context state (tile-wide) */
    uint8_t *above_part, *left_part;
    uint8_t *above_mode, *left_mode;
    uint8_t *above_skip, *left_skip;
    uint8_t *above_coef[3], *left_coef[3];
    uint8_t *above_smooth[2], *left_smooth[2];
    /* block-decoded bitmaps (per current SB), (n+2)x(n+2), n=16 luma */
    uint8_t bdmap[3][18 * 18];
    int sb_r4, sb_c4;
    /* per-frame wiring */
    TpuEc *ec;
    ModeCdfs *mc;
    TxbCdfs *tc;
    double rdmult;
    /* frame-kind lambda scale (ref rc_process.c svt_aom_compute_rd_mult:
     * rd_frame_type_factor x def_*_rd_multiplier, normalized to the
     * mid-pyramid INTNL_ARF point); 0 means "unset" = 1.0 */
    double rdmult_scale;
    double psy_rd;        /* PSY energy-preservation strength (0 = off) */
    int cur_q;
    int n_cands;
    int64_t dist_acc;
    /* shared loop-filter maps (uint8 tx dim in px per 4px unit) */
    uint8_t *lf_txdim[2];   /* [0] luma, [1] chroma */
    int lf_stride[2];
    /* shared per-4x4 skip map (CDEF block lists) */
    uint8_t *skip_map;
    int skip_stride;
    /* loop-restoration syntax state (lr_syntax.c); per-tile subexp refs */
    int lr_ftype[3];              /* 0=NONE 1=WIENER 2=SGR 3=SWITCHABLE */
    int lr_usize[3];              /* unit size, plane px */
    const int16_t *lr_units[3];   /* [urows*ucols][10]:
                                     type, v0..2, h0..2, ep, xq0, xq1 */
    int lr_ucols[3], lr_urows[3];
    int lr_ref_wiener[3][2][3];
    int lr_ref_sgr[3][2];
    /* inter state */
    InterCdfs *ic;
    InterGrid *grid;                /* per-tile mode-info grid (shared) */
    const uint16_t *refp[3];        /* reference planes (LAST recon) */
    int ref_stride[3];
    /* LAST-ref global MV (1/8 px, precision-lowered); {0,0} = identity */
    int gm_mv[2];
    /* compound (RA bidirectional) state: second reference (ALTREF),
     * skip-mode signalling + neighbor rows, RefFrameSignBias */
    const uint16_t *ref2p[3];
    int ref2_stride[3];
    int has_ref2;
    int skip_mode_present;
    int masked_comp;    /* masked-compound (wedge/diffwtd) search+syntax */
    uint8_t sign_bias[8];
    uint8_t *above_skip_mode, *left_skip_mode;
    /* per-block interpolation filter search (is_filter_switchable) */
    int switchable_filter;
    int gm_coded;   /* gm TRANSLATION coded (is_nontrans gate needs it) */
    /* LAST-ref ROTZOOM global motion (spec 5.9.24 type 2): full affine
     * mat + shear params; gm_wp_ok = shear-valid, GLOBALMV blocks then
     * predict through the warp filter (spec 7.11.3.2 globalValid) */
    int32_t gm_wp_mat[6];
    int gm_wp_shear[4];           /* alpha, beta, gamma, delta */
    int gm_wp_ok;
    /* motion-mode search (frame is_motion_mode_switchable): OBMC +
     * optionally WARPED_CAUSAL (frame allow_warped_motion) */
    int motion_mode_sw;
    int allow_warp;
    /* inter-intra search (seq enable_interintra_compound) */
    int interintra;
    /* TX_MODE_SELECT (intra walk): depth-1 tx split search + syntax */
    int tx_select;
    /* CfL chroma candidate in the intra walk (spec 7.11.5) */
    int cfl_search;
    /* filter-intra candidates in the intra walk (spec 7.11.6) */
    int fi_search;
    uint8_t *above_txw, *left_txh;   /* AboveTxWidth / LeftTxHeight */
    /* MFMV temporal motion field (spec 7.9 projection; NULL = off) */
    const int16_t *tpl_mv;
    const int16_t *tpl_off;
    const uint8_t *tpl_valid;
    int tpl_n8r, tpl_n8c;
    int tpl_cur_off[8];
    int tpl_allow_hp;
    /* multi-reference prediction (MRP; ref pd_process.c ref lists):
     * a third reference (GOLDEN) selectable per block via the device
     * HME SAD map. srefp/sref_frame are the ACTIVE single reference of
     * the block being coded (LAST by default). */
    const uint16_t *ref3p[3];
    int ref3_stride[3];
    int has_ref3;
    const uint16_t *srefp[3];
    int sref_stride[3];
    int sref_frame;
    const uint8_t *ref_sel;     /* per-16x16 cell: 1 = prefer GOLDEN */
    int ref_sel_cols;
    const int16_t *mv16g;       /* GOLDEN HME seeds (mv16 layout) */
};

int16_t *tpu_scan(int ts, int tt, int *n);

typedef struct {
    int32_t qc[32 * 32];
    int32_t dqc[32 * 32];
    int rate512;
    long sse;
    long psy;          /* |AC energy(src) - AC energy(rec)|, pixel scale */
    int eob;
    int tt;
    int q;             /* qindex the trial quantized at (noise-norm) */
} TxTrial;

void tpu_noise_norm_txb(struct TpuCommit *c, int ts, const int32_t *resid,
                        int q, TxTrial *t);
double tpu_dist_eval(struct TpuCommit *c, int ts, const int32_t *pred,
                     const int32_t *resid, const TxTrial *t);

/* helpers exported by commit_backend.c for the inter walk */
int tpu_sq_bsize(int size);
double tpu_lambda_for_q(const TpuCommit *c, const int32_t *pq, int q,
                        int frame_base_q);
int tpu_sq_tx(int size);
int tpu_uv_tx(int size);
void tpu_predict_txb(TpuCommit *c, int plane, int mode, int ad, int mi_row,
                     int mi_col, int u_row, int u_col, int ts,
                     int32_t *pred);
void tpu_trial_txb(TpuCommit *c, int plane, int ts, int tt,
                   const int32_t *resid, int q, int ptype, int sctx_sign,
                   int is_inter, TxTrial *out);
int tpu_txb_skip_ctx(TpuCommit *c, int plane, int u_row, int u_col, int ts,
                     int bw, int bh);
int tpu_dc_sign_ctx(TpuCommit *c, int plane, int u_row, int u_col, int ts);
void tpu_set_coef_ctx(TpuCommit *c, int plane, int u_row, int u_col, int ts,
                      int cul);
void tpu_commit_recon(TpuCommit *c, int plane, int u_row, int u_col, int ts,
                      const int32_t *pred, const TxTrial *t);
void tpu_write_partition(TpuCommit *c, int r, int c4, int size, int part);
void tpu_write_delta_q(TpuCommit *c, int absv, int sign);
void tpu_write_txb_inter(TpuCommit *c, int plane, int u_row, int u_col,
                         int ts, int bw, int bh, const TxTrial *t);
double tpu_sym_cost_bits(const uint16_t *icdf, int s);
int tpu_txs_entropy_ctx(int ts);
double tpu_inter_txtype_cost(TpuCommit *c, int ts, int tt);
int tpu_cul_of_trial(const TxTrial *t, int ts);
int tpui_grid_inter_bw(InterGrid *g, int r, int c);
int tpui_grid_inter_bh(InterGrid *g, int r, int c);
int tpu_clamp_w4(TpuCommit *c, int plane, int u_col, int tw4);
int tpu_clamp_h4(TpuCommit *c, int plane, int u_row, int th4);
void tpu_bd_reset_sb(TpuCommit *c, int sbr4, int sbc4);
void tpu_bd_set(TpuCommit *c, int plane, int y4, int x4, int h4, int w4);
void tpu_update_part_ctx(TpuCommit *c, int r, int c4, int size);
void tpu_intra_block(TpuCommit *c, int r, int c4, int size,
                     const uint8_t *cand_modes, int q, int frame_is_intra,
                     int *out_skip);
void tpu_intra_trial_only(TpuCommit *c, int r, int c4, int size,
                          const uint8_t *cand_modes, int q,
                          double *cost, int *y_mode, int *uv_mode,
                          int *skip);
void tpu_intra_commit_choice(TpuCommit *c, int r, int c4, int size,
                             int y_mode, int uv_mode, int skip);

/* inter_backend.c exports */
InterGrid *tpui_grid_new(int mi_rows, int mi_cols);
void tpui_grid_free(InterGrid *g);
void tpui_grid_set(InterGrid *g, int r, int c, int h4, int w4, int bsize,
                   int ref0, int mvr, int mvc, int has_newmv);
void tpui_grid_mark_ii(InterGrid *g, int r, int c, int h4, int w4);

void tpui_mc_block(const uint16_t *ref, int rstride, int rw, int rh,
                   int px, int py, int w, int h, int mvx_q4, int mvy_q4,
                   int bd, int32_t *out);

#endif /* TPU_COMMIT_INTERNAL_H */
