/*
 * svt-av1-psy-tpu FFmpeg encoder wrapper (the ffmpeg_plugin/ analog of
 * the reference: an AVCodec that drives the public C API in
 * native/capi.h — ref ffmpeg_plugin/README.md + libsvtav1 in FFmpeg).
 *
 * Build: drop this file into libavcodec/, register "libsvtav1_tpu" in
 * allcodecs.c (extern const FFCodec ff_libsvtav1_tpu_encoder;), add
 *   libavcodec/libsvtav1_tpu.o  to the Makefile, and configure FFmpeg
 * with  --extra-cflags=-I<repo>/native
 *       --extra-ldflags="-L<repo>/native -lsvtav1_tpu"
 * (set PYTHONPATH=<repo> at runtime: the library embeds CPython).
 * See README.md in this directory. NOT compiled in this repo's CI —
 * the image carries no FFmpeg headers; the library side is covered by
 * tests/test_capi.py.
 */

#include "libavutil/avassert.h"
#include "libavutil/common.h"
#include "libavutil/imgutils.h"
#include "libavutil/opt.h"

#include "avcodec.h"
#include "codec_internal.h"
#include "encode.h"
#include "internal.h"

#include "capi.h"

typedef struct SvtTpuContext {
    const AVClass *class;
    SvtTpuEncoder *handle;
    SvtTpuConfig cfg;
    int eos_sent;
    /* AVOptions */
    int preset;
    double crf;
    int hierarchical_levels;
    char *params;          /* -svtav1_tpu_params key=value:... */
} SvtTpuContext;

static av_cold int svt_tpu_enc_init_ff(AVCodecContext *avctx)
{
    SvtTpuContext *s = avctx->priv_data;
    int ret;

    ret = svt_tpu_enc_init_handle(&s->handle, &s->cfg);
    if (ret != SVT_TPU_OK)
        return AVERROR_EXTERNAL;

    s->cfg.width = avctx->width;
    s->cfg.height = avctx->height;
    s->cfg.bit_depth =
        avctx->pix_fmt == AV_PIX_FMT_YUV420P10 ? 10 : 8;
    s->cfg.enc_mode = s->preset;
    s->cfg.crf = s->crf;
    s->cfg.intra_period = avctx->gop_size > 0 ? avctx->gop_size - 1 : -1;
    if (avctx->framerate.num > 0 && avctx->framerate.den > 0)
        s->cfg.frame_rate = avctx->framerate.num / avctx->framerate.den;
    s->cfg.hierarchical_levels = s->hierarchical_levels;

    ret = svt_tpu_enc_set_parameter(s->handle, &s->cfg);
    if (ret != SVT_TPU_OK) {
        av_log(avctx, AV_LOG_ERROR, "bad encoder parameters\n");
        return AVERROR(EINVAL);
    }
    if (s->params) {
        ret = svt_tpu_enc_parse_parameter(s->handle, s->params);
        if (ret != SVT_TPU_OK)
            return AVERROR(EINVAL);
    }
    ret = svt_tpu_enc_init(s->handle);
    if (ret != SVT_TPU_OK)
        return AVERROR_EXTERNAL;

    if (avctx->flags & AV_CODEC_FLAG_GLOBAL_HEADER) {
        const uint8_t *hdr;
        size_t hdr_size;
        if (svt_tpu_enc_stream_header(s->handle, &hdr, &hdr_size) ==
            SVT_TPU_OK) {
            avctx->extradata = av_mallocz(hdr_size +
                                          AV_INPUT_BUFFER_PADDING_SIZE);
            if (!avctx->extradata)
                return AVERROR(ENOMEM);
            memcpy(avctx->extradata, hdr, hdr_size);
            avctx->extradata_size = hdr_size;
        }
    }
    return 0;
}

static int svt_tpu_receive_packet(AVCodecContext *avctx, AVPacket *pkt)
{
    SvtTpuContext *s = avctx->priv_data;
    const uint8_t *data;
    size_t size;
    int64_t pts;
    int ret;

    /* drain queued packets first */
    ret = svt_tpu_enc_get_packet(s->handle, &data, &size, &pts);
    if (ret == SVT_TPU_OK) {
        ret = ff_get_encode_buffer(avctx, pkt, size, 0);
        if (ret < 0)
            return ret;
        memcpy(pkt->data, data, size);
        pkt->pts = pts;
        pkt->dts = pts;
        return 0;
    }

    if (s->eos_sent)
        return AVERROR_EOF;

    AVFrame *frame = av_frame_alloc();
    if (!frame)
        return AVERROR(ENOMEM);
    ret = ff_encode_get_frame(avctx, frame);
    if (ret == AVERROR_EOF) {
        svt_tpu_enc_send_picture(s->handle, NULL, 0, NULL, NULL, 0);
        s->eos_sent = 1;
        av_frame_free(&frame);
        return svt_tpu_receive_packet(avctx, pkt);
    }
    if (ret < 0) {
        av_frame_free(&frame);
        return ret;
    }

    {
        int sample = s->cfg.bit_depth == 10 ? 2 : 1;
        ret = svt_tpu_enc_send_picture(
            s->handle, frame->data[0], frame->linesize[0] / sample,
            frame->data[1], frame->data[2], frame->linesize[1] / sample);
    }
    av_frame_free(&frame);
    if (ret != SVT_TPU_OK)
        return AVERROR_EXTERNAL;
    return svt_tpu_receive_packet(avctx, pkt);
}

static av_cold int svt_tpu_enc_close(AVCodecContext *avctx)
{
    SvtTpuContext *s = avctx->priv_data;
    if (s->handle)
        svt_tpu_enc_deinit(s->handle);
    s->handle = NULL;
    return 0;
}

#define OFFSET(x) offsetof(SvtTpuContext, x)
#define VE AV_OPT_FLAG_VIDEO_PARAM | AV_OPT_FLAG_ENCODING_PARAM
static const AVOption options[] = {
    { "preset", "encoding preset (0..13)", OFFSET(preset),
      AV_OPT_TYPE_INT, { .i64 = 8 }, 0, 13, VE },
    { "crf", "constant rate factor (extended CRF, up to 70)",
      OFFSET(crf), AV_OPT_TYPE_DOUBLE, { .dbl = 35 }, 0, 70, VE },
    { "hierarchical_levels", "pyramid levels", OFFSET(hierarchical_levels),
      AV_OPT_TYPE_INT, { .i64 = 0 }, 0, 5, VE },
    { "svtav1_tpu_params", "colon-separated key=value parameters",
      OFFSET(params), AV_OPT_TYPE_STRING, { .str = NULL }, 0, 0, VE },
    { NULL },
};

static const AVClass svt_tpu_class = {
    .class_name = "libsvtav1_tpu",
    .item_name  = av_default_item_name,
    .option     = options,
    .version    = LIBAVUTIL_VERSION_INT,
};

const FFCodec ff_libsvtav1_tpu_encoder = {
    .p.name         = "libsvtav1_tpu",
    CODEC_LONG_NAME("svt-av1-psy-tpu AV1 encoder"),
    .p.type         = AVMEDIA_TYPE_VIDEO,
    .p.id           = AV_CODEC_ID_AV1,
    .p.capabilities = AV_CODEC_CAP_DELAY | AV_CODEC_CAP_OTHER_THREADS,
    .p.pix_fmts     = (const enum AVPixelFormat[]) {
        AV_PIX_FMT_YUV420P, AV_PIX_FMT_YUV420P10, AV_PIX_FMT_NONE },
    .p.priv_class   = &svt_tpu_class,
    .p.wrapper_name = "libsvtav1_tpu",
    .priv_data_size = sizeof(SvtTpuContext),
    .init           = svt_tpu_enc_init_ff,
    FF_CODEC_RECEIVE_PACKET_CB(svt_tpu_receive_packet),
    .close          = svt_tpu_enc_close,
    .caps_internal  = FF_CODEC_CAP_INIT_CLEANUP,
};
