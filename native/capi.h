/* svt-av1-psy-tpu public C API — the EbSvtAv1Enc.h analog (L4).
 *
 * Lifecycle mirrors the reference encoder library exactly
 * (ref Source/API/EbSvtAv1Enc.h:1101-1217):
 *
 *   svt_tpu_enc_init_handle  -> svt_av1_enc_init_handle
 *   svt_tpu_enc_set_parameter-> svt_av1_enc_set_parameter
 *   svt_tpu_enc_parse_parameter -> svt_av1_enc_parse_parameter
 *   svt_tpu_enc_init         -> svt_av1_enc_init
 *   svt_tpu_enc_send_picture -> svt_av1_enc_send_picture
 *   svt_tpu_enc_get_packet   -> svt_av1_enc_get_packet
 *   svt_tpu_enc_stream_header-> svt_av1_enc_stream_header
 *   svt_tpu_enc_deinit       -> svt_av1_enc_deinit
 *
 * The library embeds the Python runtime and drives
 * svt_av1_psy_tpu.api.Encoder; it is safe to load either from a plain
 * C program (Py_Initialize happens on first init_handle) or inside an
 * existing Python process (the GIL is acquired per call).
 */
#ifndef SVT_TPU_CAPI_H_
#define SVT_TPU_CAPI_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct SvtTpuEncoder SvtTpuEncoder;

typedef struct {
    int32_t width;
    int32_t height;
    int32_t bit_depth;        /* 8 or 10 */
    int32_t enc_mode;         /* preset 0..13 */
    double  crf;              /* extended CRF (qindex = crf * 4) */
    int32_t intra_period;     /* -1 open GOP, 0 all-intra, N keyint-1 */
    int32_t frame_rate;       /* fps numerator (den 1) */
    int32_t tile_columns;     /* log2, -1 = auto */
    int32_t hierarchical_levels;
    int32_t pred_structure;   /* 1 low-delay, 2 random access */
} SvtTpuConfig;

/* error codes (EbErrorType analog) */
enum {
    SVT_TPU_OK = 0,
    SVT_TPU_ERROR_BAD_PARAMETER = -1,
    SVT_TPU_ERROR_RUNTIME = -2,
    SVT_TPU_NO_PACKET = 1,
};

/* Allocate a handle and populate cfg with defaults. */
int svt_tpu_enc_init_handle(SvtTpuEncoder **handle, SvtTpuConfig *cfg);

/* Validate + stage the configuration (before init). */
int svt_tpu_enc_set_parameter(SvtTpuEncoder *handle,
                              const SvtTpuConfig *cfg);

/* Apply one "key=value" or "key=value:key=value" parameter string
 * (the svt_av1_enc_parse_parameter surface). */
int svt_tpu_enc_parse_parameter(SvtTpuEncoder *handle, const char *kv);

/* Construct the encoder (after set_parameter). */
int svt_tpu_enc_init(SvtTpuEncoder *handle);

/* Standalone sequence header OBU (svt_av1_enc_stream_header analog).
 * The returned buffer lives until the next call / deinit. */
int svt_tpu_enc_stream_header(SvtTpuEncoder *handle, const uint8_t **data,
                              size_t *size);

/* Send one 4:2:0 picture (y: width x height; u/v: halved dims; strides
 * in SAMPLES; 10-bit uses uint16 samples and stride counts uint16s).
 * Pass y == NULL to signal end of stream (flush). */
int svt_tpu_enc_send_picture(SvtTpuEncoder *handle, const void *y,
                             int32_t y_stride, const void *u,
                             const void *v, int32_t uv_stride);

/* Dequeue one coded packet (decode order). Returns SVT_TPU_OK with the
 * packet, or SVT_TPU_NO_PACKET when none is pending. The buffer lives
 * until the next get_packet / deinit. pts = display index (-1 for
 * hidden alt-ref packets). */
int svt_tpu_enc_get_packet(SvtTpuEncoder *handle, const uint8_t **data,
                           size_t *size, int64_t *pts);

/* Tear the channel down. */
void svt_tpu_enc_deinit(SvtTpuEncoder *handle);

#ifdef __cplusplus
}
#endif

#endif /* SVT_TPU_CAPI_H_ */
