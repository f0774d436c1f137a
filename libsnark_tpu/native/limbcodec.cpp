/* Native host codec: big integers <-> packed 16-bit limbs in uint32.
 *
 * The TPU framework's equivalent of libff's GMP bigint host layer
 * (reference depends on GMP mp_limb_t arrays; here the host<->device
 * boundary is a limb-major uint32 buffer consumed by JAX). The pure
 * Python fallback in ops/limbs.py loops per limb; this extension does
 * the conversion at memcpy speed via CPython's byte-array long API.
 *
 * Exposed functions (module _limbcodec):
 *   encode(xs: list[int], n: int) -> bytes      # (n, len(xs)) uint32,
 *                                               # limb-major, little-endian
 *   decode(buf: bytes, n: int, m: int) -> list[int]
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstring>
#include <vector>

static PyObject *encode(PyObject *, PyObject *args) {
    PyObject *xs;
    Py_ssize_t n;
    if (!PyArg_ParseTuple(args, "On", &xs, &n)) return nullptr;
    PyObject *seq = PySequence_Fast(xs, "expected a sequence");
    if (!seq) return nullptr;
    Py_ssize_t m = PySequence_Fast_GET_SIZE(seq);

    PyObject *out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)(n * m * 4));
    if (!out) { Py_DECREF(seq); return nullptr; }
    uint32_t *dst = (uint32_t *)PyBytes_AS_STRING(out);
    std::memset(dst, 0, (size_t)(n * m * 4));

    std::vector<unsigned char> tmp((size_t)(2 * n));
    for (Py_ssize_t j = 0; j < m; ++j) {
        PyObject *item = PySequence_Fast_GET_ITEM(seq, j);
        PyObject *val = PyNumber_Long(item);
        if (!val) { Py_DECREF(seq); Py_DECREF(out); return nullptr; }
        std::memset(tmp.data(), 0, tmp.size());
        /* little-endian, unsigned */
        if (_PyLong_AsByteArray((PyLongObject *)val, tmp.data(), tmp.size(),
                                1, 0) < 0) {
            Py_DECREF(val); Py_DECREF(seq); Py_DECREF(out);
            return nullptr;
        }
        Py_DECREF(val);
        for (Py_ssize_t i = 0; i < n; ++i) {
            dst[(size_t)i * m + j] =
                (uint32_t)tmp[2 * i] | ((uint32_t)tmp[2 * i + 1] << 8);
        }
    }
    Py_DECREF(seq);
    return out;
}

static PyObject *decode(PyObject *, PyObject *args) {
    Py_buffer buf;
    Py_ssize_t n, m;
    if (!PyArg_ParseTuple(args, "y*nn", &buf, &n, &m)) return nullptr;
    if (buf.len < (Py_ssize_t)(n * m * 4)) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer too small");
        return nullptr;
    }
    const uint32_t *src = (const uint32_t *)buf.buf;
    PyObject *out = PyList_New(m);
    if (!out) { PyBuffer_Release(&buf); return nullptr; }
    std::vector<unsigned char> tmp((size_t)(2 * n));
    for (Py_ssize_t j = 0; j < m; ++j) {
        for (Py_ssize_t i = 0; i < n; ++i) {
            uint32_t v = src[(size_t)i * m + j];
            tmp[2 * i] = (unsigned char)(v & 0xFF);
            tmp[2 * i + 1] = (unsigned char)((v >> 8) & 0xFF);
        }
        PyObject *val = _PyLong_FromByteArray(tmp.data(), tmp.size(), 1, 0);
        if (!val) { PyBuffer_Release(&buf); Py_DECREF(out); return nullptr; }
        PyList_SET_ITEM(out, j, val);
    }
    PyBuffer_Release(&buf);
    return out;
}

static PyMethodDef methods[] = {
    {"encode", encode, METH_VARARGS,
     "encode(xs, n) -> limb-major uint32 bytes"},
    {"decode", decode, METH_VARARGS,
     "decode(buf, n, m) -> list of ints"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_limbcodec",
    "native bigint<->limb codec", -1, methods};

PyMODINIT_FUNC PyInit__limbcodec(void) {
    return PyModule_Create(&moduledef);
}
