/* C API implementation: embeds CPython and drives
 * svt_av1_psy_tpu.api.Encoder (see capi.h for the surface map to
 * ref Source/API/EbSvtAv1Enc.h). Built as libsvtav1_tpu.so by
 * tools/build_capi.py.
 *
 * Threading model: every entry point runs under PyGILState_Ensure, so
 * the library works both from a plain C program (we initialize the
 * interpreter) and inside an existing Python process. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include "capi.h"

struct SvtTpuEncoder {
    SvtTpuConfig cfg;
    PyObject *encoder;        /* svt_av1_psy_tpu.api.Encoder */
    PyObject *pending;        /* list of (bytes, pts) packets */
    PyObject *last_packet;    /* bytes kept alive for the caller */
    PyObject *last_header;
    int initialized;
};

static int g_py_started = 0;

static int ensure_python(void) {
    if (Py_IsInitialized()) return 0;
    Py_InitializeEx(0);
    g_py_started = 1;
    /* release the GIL so PyGILState_Ensure works from any thread */
    PyEval_SaveThread();
    return 0;
}

static void clear_err(void) {
    if (PyErr_Occurred()) {
        PyErr_Print();
        PyErr_Clear();
    }
}

int svt_tpu_enc_init_handle(SvtTpuEncoder **handle, SvtTpuConfig *cfg) {
    if (!handle) return SVT_TPU_ERROR_BAD_PARAMETER;
    if (ensure_python()) return SVT_TPU_ERROR_RUNTIME;
    SvtTpuEncoder *h = calloc(1, sizeof(*h));
    if (!h) return SVT_TPU_ERROR_RUNTIME;
    h->cfg.width = 0;
    h->cfg.height = 0;
    h->cfg.bit_depth = 8;
    h->cfg.enc_mode = 8;
    h->cfg.crf = 35.0;
    h->cfg.intra_period = 0;
    h->cfg.frame_rate = 30;
    h->cfg.tile_columns = -1;
    h->cfg.hierarchical_levels = 0;
    h->cfg.pred_structure = 2;
    if (cfg) *cfg = h->cfg;
    *handle = h;
    return SVT_TPU_OK;
}

int svt_tpu_enc_set_parameter(SvtTpuEncoder *h, const SvtTpuConfig *cfg) {
    if (!h || !cfg) return SVT_TPU_ERROR_BAD_PARAMETER;
    if (cfg->width <= 0 || cfg->height <= 0 || (cfg->width & 1) ||
        (cfg->height & 1))
        return SVT_TPU_ERROR_BAD_PARAMETER;
    if (cfg->bit_depth != 8 && cfg->bit_depth != 10)
        return SVT_TPU_ERROR_BAD_PARAMETER;
    if (cfg->enc_mode < 0 || cfg->enc_mode > 13)
        return SVT_TPU_ERROR_BAD_PARAMETER;
    h->cfg = *cfg;
    return SVT_TPU_OK;
}

/* staged parameter strings applied at init via parse_parameter_string */
static char g_params[4][512];

int svt_tpu_enc_parse_parameter(SvtTpuEncoder *h, const char *kv) {
    if (!h || !kv) return SVT_TPU_ERROR_BAD_PARAMETER;
    for (int i = 0; i < 4; i++) {
        if (!g_params[i][0]) {
            snprintf(g_params[i], sizeof(g_params[i]), "%s", kv);
            return SVT_TPU_OK;
        }
    }
    return SVT_TPU_ERROR_BAD_PARAMETER;
}

int svt_tpu_enc_init(SvtTpuEncoder *h) {
    if (!h || h->initialized) return SVT_TPU_ERROR_BAD_PARAMETER;
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = SVT_TPU_ERROR_RUNTIME;
    PyObject *mod = NULL, *code = NULL, *globals = NULL;
    mod = PyImport_ImportModule("svt_av1_psy_tpu.capi_bridge");
    if (!mod) {
        clear_err();
        goto done;
    }
    {
        PyObject *fn = PyObject_GetAttrString(mod, "make_encoder");
        if (!fn) { clear_err(); goto done; }
        PyObject *args = Py_BuildValue(
            "(iiiidiiiii)", h->cfg.width, h->cfg.height, h->cfg.bit_depth,
            h->cfg.enc_mode, h->cfg.crf, h->cfg.intra_period,
            h->cfg.frame_rate, h->cfg.tile_columns,
            h->cfg.hierarchical_levels, h->cfg.pred_structure);
        PyObject *extras = PyList_New(0);
        for (int i = 0; i < 4; i++)
            if (g_params[i][0]) {
                PyObject *s = PyUnicode_FromString(g_params[i]);
                PyList_Append(extras, s);
                Py_DECREF(s);
            }
        PyObject *enc = PyObject_Call(
            fn, args, Py_BuildValue("{s:O}", "extra_params", extras));
        Py_DECREF(extras);
        Py_DECREF(args);
        Py_DECREF(fn);
        if (!enc) { clear_err(); goto done; }
        h->encoder = enc;
        h->pending = PyList_New(0);
        h->initialized = 1;
        rc = SVT_TPU_OK;
    }
done:
    Py_XDECREF(mod);
    Py_XDECREF(code);
    Py_XDECREF(globals);
    PyGILState_Release(st);
    return rc;
}

int svt_tpu_enc_stream_header(SvtTpuEncoder *h, const uint8_t **data,
                              size_t *size) {
    if (!h || !h->initialized || !data || !size)
        return SVT_TPU_ERROR_BAD_PARAMETER;
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = SVT_TPU_ERROR_RUNTIME;
    PyObject *b = PyObject_CallMethod(h->encoder, "stream_header", NULL);
    if (b && PyBytes_Check(b)) {
        Py_XDECREF(h->last_header);
        h->last_header = b;
        *data = (const uint8_t *)PyBytes_AS_STRING(b);
        *size = (size_t)PyBytes_GET_SIZE(b);
        rc = SVT_TPU_OK;
    } else {
        clear_err();
        Py_XDECREF(b);
    }
    PyGILState_Release(st);
    return rc;
}

int svt_tpu_enc_send_picture(SvtTpuEncoder *h, const void *y,
                             int32_t y_stride, const void *u,
                             const void *v, int32_t uv_stride) {
    if (!h || !h->initialized) return SVT_TPU_ERROR_BAD_PARAMETER;
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = SVT_TPU_ERROR_RUNTIME;
    PyObject *mod = PyImport_ImportModule("svt_av1_psy_tpu.capi_bridge");
    if (!mod) { clear_err(); goto done; }
    {
        const char *meth = y ? "send_picture" : "flush";
        PyObject *pkts;
        if (y) {
            pkts = PyObject_CallMethod(
                mod, meth, "OKiKKi", h->encoder, (unsigned long long)y,
                y_stride, (unsigned long long)u, (unsigned long long)v,
                uv_stride);
        } else {
            pkts = PyObject_CallMethod(mod, meth, "O", h->encoder);
        }
        Py_DECREF(mod);
        if (!pkts) { clear_err(); goto done; }
        /* append (bytes, pts) tuples to the pending queue */
        Py_ssize_t n = PyList_Size(pkts);
        for (Py_ssize_t i = 0; i < n; i++)
            PyList_Append(h->pending, PyList_GetItem(pkts, i));
        Py_DECREF(pkts);
        rc = SVT_TPU_OK;
    }
done:
    PyGILState_Release(st);
    return rc;
}

int svt_tpu_enc_get_packet(SvtTpuEncoder *h, const uint8_t **data,
                           size_t *size, int64_t *pts) {
    if (!h || !h->initialized || !data || !size)
        return SVT_TPU_ERROR_BAD_PARAMETER;
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = SVT_TPU_NO_PACKET;
    if (PyList_Size(h->pending) > 0) {
        PyObject *item = PyList_GetItem(h->pending, 0);  /* borrowed */
        Py_INCREF(item);
        PySequence_DelItem(h->pending, 0);
        PyObject *payload = PyTuple_GetItem(item, 0);
        PyObject *ppts = PyTuple_GetItem(item, 1);
        Py_XDECREF(h->last_packet);
        Py_INCREF(payload);
        h->last_packet = payload;
        *data = (const uint8_t *)PyBytes_AS_STRING(payload);
        *size = (size_t)PyBytes_GET_SIZE(payload);
        if (pts) *pts = PyLong_AsLongLong(ppts);
        Py_DECREF(item);
        rc = SVT_TPU_OK;
    }
    PyGILState_Release(st);
    return rc;
}

void svt_tpu_enc_deinit(SvtTpuEncoder *h) {
    if (!h) return;
    if (h->initialized) {
        PyGILState_STATE st = PyGILState_Ensure();
        Py_XDECREF(h->encoder);
        Py_XDECREF(h->pending);
        Py_XDECREF(h->last_packet);
        Py_XDECREF(h->last_header);
        PyGILState_Release(st);
    }
    memset(g_params, 0, sizeof(g_params));
    free(h);
}
