/* sfast_tpu._C — native host-side runtime helpers.
 *
 * The reference implements its hot runtime paths in C++ (TorchScript
 * passes, shadow tensors, stride math — csrc/).  On TPU, XLA owns the
 * graph and device memory, so the native surface that matters is the
 * per-call *dispatch* path: building the input-signature key that routes
 * a call to its cached executable (the analog of the CUDA-graph cache
 * lookup, reference cuda/graphs.py:225-241).  This module implements
 * that recursion in C:
 *
 *   arg_signature(obj, shape_sensitive) -> hashable tuple
 *   call_signature(args, kwargs, shape_sensitive) -> (sig, sig)
 *   sig_hash(obj) -> Py_hash_t
 *
 * Semantics mirror sfast_tpu/runtime/signature.py exactly (asserted by
 * tests/runtime/test_native_signature.py); the Python implementation
 * remains the fallback when the extension isn't built.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

static PyObject *interned_array;
static PyObject *interned_array_type;
static PyObject *interned_scalar;
static PyObject *interned_prim;
static PyObject *interned_dict;
static PyObject *interned_opaque;
static PyObject *interned_dataclass;

static PyObject *arg_signature(PyObject *arg, int shape_sensitive);

/* unqualified type name (tp_name may be dotted, e.g. "numpy.float32") */
static PyObject *short_type_name(PyObject *arg) {
    const char *name = Py_TYPE(arg)->tp_name;
    const char *dot = strrchr(name, '.');
    return PyUnicode_FromString(dot ? dot + 1 : name);
}

/* ("prim", type_name, value) */
static PyObject *prim_sig(PyObject *arg) {
    PyObject *tname = short_type_name(arg);
    if (!tname) return NULL;
    PyObject *out = PyTuple_Pack(3, interned_prim, tname, arg);
    Py_DECREF(tname);
    return out;
}

static int is_numpy_scalar_like(PyObject *arg, PyObject *shape) {
    /* numpy 0-d array or numpy scalar: shape == () */
    return PyTuple_Check(shape) && PyTuple_GET_SIZE(shape) == 0 &&
           strncmp(Py_TYPE(arg)->tp_name, "jax", 3) != 0;
}

static PyObject *array_sig(PyObject *arg, int shape_sensitive) {
    if (!shape_sensitive) {
        PyObject *tname = short_type_name(arg);
        if (!tname) return NULL;
        PyObject *out = PyTuple_Pack(2, interned_array_type, tname);
        Py_DECREF(tname);
        return out;
    }
    PyObject *shape = PyObject_GetAttrString(arg, "shape");
    if (!shape) return NULL;
    PyObject *dtype = PyObject_GetAttrString(arg, "dtype");
    if (!dtype) { Py_DECREF(shape); return NULL; }
    PyObject *dtype_str = PyObject_Str(dtype);
    Py_DECREF(dtype);
    if (!dtype_str) { Py_DECREF(shape); return NULL; }

    /* host scalars (numpy 0-d / numpy generics) hash by value */
    if (is_numpy_scalar_like(arg, shape)) {
        PyObject *item = PyObject_CallMethod(arg, "item", NULL);
        if (!item) { Py_DECREF(shape); Py_DECREF(dtype_str); return NULL; }
        PyObject *out = PyTuple_Pack(3, interned_scalar, dtype_str, item);
        Py_DECREF(item);
        Py_DECREF(shape);
        Py_DECREF(dtype_str);
        return out;
    }
    PyObject *shape_tuple = PySequence_Tuple(shape);
    Py_DECREF(shape);
    if (!shape_tuple) { Py_DECREF(dtype_str); return NULL; }
    PyObject *out = PyTuple_Pack(3, interned_array, dtype_str, shape_tuple);
    Py_DECREF(dtype_str);
    Py_DECREF(shape_tuple);
    return out;
}

static PyObject *seq_sig(PyObject *arg, int shape_sensitive) {
    Py_ssize_t n = PySequence_Size(arg);
    if (n < 0) return NULL;
    PyObject *items = PyTuple_New(n);
    if (!items) return NULL;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *item = PySequence_GetItem(arg, i);
        if (!item) { Py_DECREF(items); return NULL; }
        PyObject *sig = arg_signature(item, shape_sensitive);
        Py_DECREF(item);
        if (!sig) { Py_DECREF(items); return NULL; }
        PyTuple_SET_ITEM(items, i, sig);
    }
    PyObject *tname = short_type_name(arg);
    if (!tname) { Py_DECREF(items); return NULL; }
    PyObject *out = PyTuple_Pack(2, tname, items);
    Py_DECREF(tname);
    Py_DECREF(items);
    return out;
}

static int key_cmp(const void *a, const void *b) {
    /* qsort comparator over (str(key), key, value_sig) triples by the
       pre-computed UTF-8 of str(key) */
    PyObject *sa = PyTuple_GET_ITEM(*(PyObject **)a, 0);
    PyObject *sb = PyTuple_GET_ITEM(*(PyObject **)b, 0);
    return PyUnicode_Compare(sa, sb);
}

static PyObject *dict_sig(PyObject *arg, int shape_sensitive) {
    Py_ssize_t n = PyDict_Size(arg);
    PyObject **triples = PyMem_Malloc(sizeof(PyObject *) * (n ? n : 1));
    if (!triples) return PyErr_NoMemory();
    Py_ssize_t pos = 0, i = 0;
    PyObject *key, *value;
    int ok = 1;
    while (PyDict_Next(arg, &pos, &key, &value)) {
        PyObject *kstr = PyObject_Str(key);
        PyObject *vsig = kstr ? arg_signature(value, shape_sensitive) : NULL;
        if (!kstr || !vsig) {
            Py_XDECREF(kstr);
            Py_XDECREF(vsig);
            ok = 0;
            break;
        }
        PyObject *triple = PyTuple_Pack(3, kstr, key, vsig);
        Py_DECREF(kstr);
        Py_DECREF(vsig);
        if (!triple) { ok = 0; break; }
        triples[i++] = triple;
    }
    if (!ok) {
        for (Py_ssize_t j = 0; j < i; j++) Py_DECREF(triples[j]);
        PyMem_Free(triples);
        return NULL;
    }
    qsort(triples, i, sizeof(PyObject *), key_cmp);
    PyObject *items = PyTuple_New(i);
    if (!items) {
        for (Py_ssize_t j = 0; j < i; j++) Py_DECREF(triples[j]);
        PyMem_Free(triples);
        return NULL;
    }
    for (Py_ssize_t j = 0; j < i; j++) {
        PyObject *pair = PyTuple_Pack(
            2, PyTuple_GET_ITEM(triples[j], 1), PyTuple_GET_ITEM(triples[j], 2));
        Py_DECREF(triples[j]);
        if (!pair) { Py_DECREF(items); PyMem_Free(triples); return NULL; }
        PyTuple_SET_ITEM(items, j, pair);
    }
    PyMem_Free(triples);
    PyObject *out = PyTuple_Pack(2, interned_dict, items);
    Py_DECREF(items);
    return out;
}

/* dataclass instances hash by (name, field-value signature) pairs in
 * declaration order — mirrors runtime/signature.py's dataclass branch.
 * Uses dataclasses.fields() so pseudo-fields (InitVar/ClassVar) are
 * excluded exactly as in Python; any failure raises, and the Python
 * fallback in runtime/signature.py:call_signature handles it. */
static PyObject *dataclasses_fields = NULL;

static PyObject *dataclass_sig(PyObject *arg, int shape_sensitive) {
    PyObject *fields =
        PyObject_CallFunctionObjArgs(dataclasses_fields, arg, NULL);
    if (!fields) return NULL;
    PyObject *fields_tuple = PySequence_Tuple(fields);
    Py_DECREF(fields);
    if (!fields_tuple) return NULL;
    Py_ssize_t n = PyTuple_GET_SIZE(fields_tuple);
    PyObject *items = PyTuple_New(n);
    if (!items) { Py_DECREF(fields_tuple); return NULL; }
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *field = PyTuple_GET_ITEM(fields_tuple, i);
        PyObject *name = PyObject_GetAttrString(field, "name");
        if (!name) { Py_DECREF(items); Py_DECREF(fields_tuple); return NULL; }
        PyObject *value = PyObject_GetAttr(arg, name);
        if (!value) {
            Py_DECREF(name);
            Py_DECREF(items);
            Py_DECREF(fields_tuple);
            return NULL;
        }
        PyObject *vsig = arg_signature(value, shape_sensitive);
        Py_DECREF(value);
        if (!vsig) {
            Py_DECREF(name);
            Py_DECREF(items);
            Py_DECREF(fields_tuple);
            return NULL;
        }
        PyObject *pair = PyTuple_Pack(2, name, vsig);
        Py_DECREF(name);
        Py_DECREF(vsig);
        if (!pair) { Py_DECREF(items); Py_DECREF(fields_tuple); return NULL; }
        PyTuple_SET_ITEM(items, i, pair);
    }
    Py_DECREF(fields_tuple);
    PyObject *tname = short_type_name(arg);
    if (!tname) { Py_DECREF(items); return NULL; }
    PyObject *out = PyTuple_Pack(3, interned_dataclass, tname, items);
    Py_DECREF(tname);
    Py_DECREF(items);
    return out;
}

static PyObject *arg_signature(PyObject *arg, int shape_sensitive) {
    /* primitives first (bool before int matters for tp_name fidelity) */
    if (arg == Py_None || PyBool_Check(arg) || PyLong_Check(arg) ||
        PyFloat_Check(arg) || PyUnicode_Check(arg) || PyBytes_Check(arg)) {
        return prim_sig(arg);
    }
    /* array-like: has both shape and dtype */
    if (PyObject_HasAttrString(arg, "shape") &&
        PyObject_HasAttrString(arg, "dtype")) {
        return array_sig(arg, shape_sensitive);
    }
    if (PyList_Check(arg) || PyTuple_Check(arg)) {
        return seq_sig(arg, shape_sensitive);
    }
    if (PyDict_Check(arg)) {
        return dict_sig(arg, shape_sensitive);
    }
    /* dataclass instance (not the class itself): hash by field values,
     * matching runtime/signature.py — without this branch two calls
     * differing only in dataclass field values would share a dispatch
     * key and reuse a stale executable */
    if (!PyType_Check(arg) &&
        PyObject_HasAttrString(arg, "__dataclass_fields__")) {
        return dataclass_sig(arg, shape_sensitive);
    }
    /* opaque: hash by type (reference trace_helper.py:118-119) */
    {
        PyObject *tname = short_type_name(arg);
        if (!tname) return NULL;
        PyObject *out = PyTuple_Pack(2, interned_opaque, tname);
        Py_DECREF(tname);
        return out;
    }
}

static PyObject *py_arg_signature(PyObject *self, PyObject *args, PyObject *kw) {
    PyObject *arg;
    int shape_sensitive = 1;
    static char *kwlist[] = {"arg", "shape_sensitive", NULL};
    if (!PyArg_ParseTupleAndKeywords(args, kw, "O|p", kwlist, &arg,
                                     &shape_sensitive))
        return NULL;
    return arg_signature(arg, shape_sensitive);
}

static PyObject *py_call_signature(PyObject *self, PyObject *args, PyObject *kw) {
    PyObject *a, *k;
    int shape_sensitive = 1;
    static char *kwlist[] = {"args", "kwargs", "shape_sensitive", NULL};
    if (!PyArg_ParseTupleAndKeywords(args, kw, "OO|p", kwlist, &a, &k,
                                     &shape_sensitive))
        return NULL;
    PyObject *sa = arg_signature(a, shape_sensitive);
    if (!sa) return NULL;
    PyObject *sk = arg_signature(k, shape_sensitive);
    if (!sk) { Py_DECREF(sa); return NULL; }
    PyObject *out = PyTuple_Pack(2, sa, sk);
    Py_DECREF(sa);
    Py_DECREF(sk);
    return out;
}

static PyObject *py_sig_hash(PyObject *self, PyObject *arg) {
    Py_hash_t h = PyObject_Hash(arg);
    if (h == -1 && PyErr_Occurred()) return NULL;
    return PyLong_FromSsize_t(h);
}

static PyMethodDef methods[] = {
    {"arg_signature", (PyCFunction)py_arg_signature,
     METH_VARARGS | METH_KEYWORDS,
     "Hashable signature tuple of an argument tree (C fast path)."},
    {"call_signature", (PyCFunction)py_call_signature,
     METH_VARARGS | METH_KEYWORDS,
     "Signature of (args, kwargs) — the executable dispatch key."},
    {"sig_hash", py_sig_hash, METH_O, "Hash a signature tuple."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_C",
    "sfast_tpu native runtime helpers (dispatch-path signature hashing)",
    -1, methods};

PyMODINIT_FUNC PyInit__C(void) {
    PyObject *m = PyModule_Create(&module);
    if (!m) return NULL;
    interned_array = PyUnicode_InternFromString("array");
    interned_array_type = PyUnicode_InternFromString("array_type");
    interned_scalar = PyUnicode_InternFromString("scalar");
    interned_prim = PyUnicode_InternFromString("prim");
    interned_dict = PyUnicode_InternFromString("dict");
    interned_opaque = PyUnicode_InternFromString("opaque");
    interned_dataclass = PyUnicode_InternFromString("dataclass");
    {
        PyObject *dc = PyImport_ImportModule("dataclasses");
        if (!dc) { Py_DECREF(m); return NULL; }
        dataclasses_fields = PyObject_GetAttrString(dc, "fields");
        Py_DECREF(dc);
        if (!dataclasses_fields) { Py_DECREF(m); return NULL; }
    }
    return m;
}
