/* _addrops: native address-layer ops for the eager interpreter.
 *
 * The reference gets its address layer (modppl/src/address.rs: regex parse,
 * whitespace trim, per-address hashing) at compiled-Rust speed; this module
 * is the equivalent for the Python eager tier, where every `sample` site of
 * every eager GFI call parses/normalizes/hashes its address string.
 *
 * Exposes:
 *   split_addr(s)      -> (term,) | (first, rest)     [address.rs:24-37]
 *   normalize_addr(s)  -> canonical " / "-joined form [address.rs:39-48]
 *   addr_components(s) -> tuple of trimmed components
 *   addr_hash(s)       -> 31-bit FNV-1a of the normalized address
 *   lookup(s)          -> (normalized, components, hash), memoized in an
 *                         internal dict keyed by the raw string.
 *
 * The semantics mirror the Python fallback in modppl_tpu/core/address.py
 * exactly (same split-at-first-'/' rule, same trim, same FNV-1a constants);
 * tests/test_native.py asserts parity.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

static PyObject *cache = NULL; /* raw string -> (normalized, components, hash) */

/* trim ASCII whitespace (matches Python str.strip for the address charset) */
static void trim(const char *s, Py_ssize_t len, const char **out, Py_ssize_t *outlen)
{
    const char *end = s + len;
    while (s < end && (*s == ' ' || *s == '\t' || *s == '\n' || *s == '\r' ||
                       *s == '\f' || *s == '\v'))
        s++;
    while (end > s && (end[-1] == ' ' || end[-1] == '\t' || end[-1] == '\n' ||
                       end[-1] == '\r' || end[-1] == '\f' || end[-1] == '\v'))
        end--;
    *out = s;
    *outlen = end - s;
}

/* build (normalized, components) for an address; returns new references */
static int parse_addr(const char *s, Py_ssize_t len, PyObject **norm_out,
                      PyObject **comps_out)
{
    PyObject *comps = PyList_New(0);
    if (!comps)
        return -1;

    const char *p = s;
    const char *end = s + len;
    for (;;) {
        const char *slash = memchr(p, '/', end - p);
        const char *piece = p;
        Py_ssize_t piece_len = (slash ? slash : end) - p;
        const char *t;
        Py_ssize_t tlen;
        trim(piece, piece_len, &t, &tlen);
        PyObject *c = PyUnicode_FromStringAndSize(t, tlen);
        if (!c || PyList_Append(comps, c) < 0) {
            Py_XDECREF(c);
            Py_DECREF(comps);
            return -1;
        }
        Py_DECREF(c);
        if (!slash)
            break;
        p = slash + 1;
    }

    PyObject *sep = PyUnicode_FromString(" / ");
    if (!sep) {
        Py_DECREF(comps);
        return -1;
    }
    PyObject *norm = PyUnicode_Join(sep, comps);
    Py_DECREF(sep);
    if (!norm) {
        Py_DECREF(comps);
        return -1;
    }
    PyObject *ctuple = PyList_AsTuple(comps);
    Py_DECREF(comps);
    if (!ctuple) {
        Py_DECREF(norm);
        return -1;
    }
    *norm_out = norm;
    *comps_out = ctuple;
    return 0;
}

static unsigned long fnv1a31(const char *s, Py_ssize_t len)
{
    unsigned long h = 2166136261UL;
    for (Py_ssize_t i = 0; i < len; i++) {
        h ^= (unsigned char)s[i];
        h = (h * 16777619UL) & 0xFFFFFFFFUL;
    }
    return h & 0x7FFFFFFFUL;
}

static PyObject *entry_for(PyObject *arg)
{
    PyObject *hit = PyDict_GetItemWithError(cache, arg); /* borrowed */
    if (hit) {
        Py_INCREF(hit);
        return hit;
    }
    if (PyErr_Occurred())
        return NULL;

    Py_ssize_t len;
    const char *s = PyUnicode_AsUTF8AndSize(arg, &len);
    if (!s)
        return NULL;

    PyObject *norm, *comps;
    if (parse_addr(s, len, &norm, &comps) < 0)
        return NULL;

    Py_ssize_t nlen;
    const char *ns = PyUnicode_AsUTF8AndSize(norm, &nlen);
    if (!ns) {
        Py_DECREF(norm);
        Py_DECREF(comps);
        return NULL;
    }
    PyObject *h = PyLong_FromUnsignedLong(fnv1a31(ns, nlen));
    if (!h) {
        Py_DECREF(norm);
        Py_DECREF(comps);
        return NULL;
    }
    PyObject *entry = PyTuple_Pack(3, norm, comps, h);
    Py_DECREF(norm);
    Py_DECREF(comps);
    Py_DECREF(h);
    if (!entry)
        return NULL;
    if (PyDict_SetItem(cache, arg, entry) < 0) {
        Py_DECREF(entry);
        return NULL;
    }
    return entry;
}

static PyObject *py_lookup(PyObject *self, PyObject *arg)
{
    if (!PyUnicode_Check(arg)) {
        PyErr_SetString(PyExc_TypeError, "lookup: address must be str");
        return NULL;
    }
    return entry_for(arg);
}

static PyObject *py_normalize(PyObject *self, PyObject *arg)
{
    PyObject *e = py_lookup(self, arg);
    if (!e)
        return NULL;
    PyObject *r = PyTuple_GET_ITEM(e, 0);
    Py_INCREF(r);
    Py_DECREF(e);
    return r;
}

static PyObject *py_components(PyObject *self, PyObject *arg)
{
    PyObject *e = py_lookup(self, arg);
    if (!e)
        return NULL;
    PyObject *r = PyTuple_GET_ITEM(e, 1);
    Py_INCREF(r);
    Py_DECREF(e);
    return r;
}

static PyObject *py_hash(PyObject *self, PyObject *arg)
{
    PyObject *e = py_lookup(self, arg);
    if (!e)
        return NULL;
    PyObject *r = PyTuple_GET_ITEM(e, 2);
    Py_INCREF(r);
    Py_DECREF(e);
    return r;
}

/* split at the FIRST '/': (term,) or (first, rest) — rest untrimmed
 * (address.rs:24-37) */
static PyObject *py_split(PyObject *self, PyObject *arg)
{
    if (!PyUnicode_Check(arg)) {
        PyErr_SetString(PyExc_TypeError, "split_addr: address must be str");
        return NULL;
    }
    Py_ssize_t len;
    const char *s = PyUnicode_AsUTF8AndSize(arg, &len);
    if (!s)
        return NULL;
    const char *slash = memchr(s, '/', len);
    const char *t;
    Py_ssize_t tlen;
    if (!slash) {
        trim(s, len, &t, &tlen);
        PyObject *term = PyUnicode_FromStringAndSize(t, tlen);
        if (!term)
            return NULL;
        PyObject *r = PyTuple_Pack(1, term);
        Py_DECREF(term);
        return r;
    }
    trim(s, slash - s, &t, &tlen);
    PyObject *first = PyUnicode_FromStringAndSize(t, tlen);
    if (!first)
        return NULL;
    PyObject *rest = PyUnicode_FromStringAndSize(slash + 1, len - (slash - s) - 1);
    if (!rest) {
        Py_DECREF(first);
        return NULL;
    }
    PyObject *r = PyTuple_Pack(2, first, rest);
    Py_DECREF(first);
    Py_DECREF(rest);
    return r;
}

static PyObject *py_cache_size(PyObject *self, PyObject *noarg)
{
    return PyLong_FromSsize_t(PyDict_Size(cache));
}

static PyMethodDef methods[] = {
    {"lookup", py_lookup, METH_O,
     "lookup(addr) -> (normalized, components, hash31), memoized"},
    {"normalize_addr", py_normalize, METH_O, "canonical ' / ' form"},
    {"addr_components", py_components, METH_O, "tuple of trimmed components"},
    {"addr_hash", py_hash, METH_O, "31-bit FNV-1a of normalized address"},
    {"split_addr", py_split, METH_O, "(term,) or (first, rest)"},
    {"cache_size", py_cache_size, METH_NOARGS, "number of memoized addresses"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_addrops",
    "native address-layer ops for modppl_tpu", -1, methods,
};

PyMODINIT_FUNC PyInit__addrops(void)
{
    PyObject *m = PyModule_Create(&moduledef);
    if (!m)
        return NULL;
    cache = PyDict_New();
    if (!cache) {
        Py_DECREF(m);
        return NULL;
    }
    return m;
}
