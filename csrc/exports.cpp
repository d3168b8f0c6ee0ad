// libonnxstream_tpu — the 15-function C ABI (parity with reference
// src/exports.cpp:42-311), implemented by embedding CPython and forwarding to
// onnxstream_tpu.api.capi. The runtime itself executes as compiled XLA
// programs on TPU; this shim gives C/C#/foreign-language clients the same
// entry points the reference exports.
//
// Build: make -C csrc  (or python csrc/build.py). Requires libpython.
//
// Thread-safety: every call grabs the GIL (PyGILState_Ensure), so the ABI is
// callable from any thread, like the reference.

#include <Python.h>

#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

#if defined(_WIN32)
#define OSTPU_EXPORT extern "C" __declspec(dllexport)
#else
#define OSTPU_EXPORT extern "C" __attribute__((visibility("default")))
#endif

namespace {

std::once_flag g_init_once;
PyObject* g_capi = nullptr;  // onnxstream_tpu.api.capi module

void ensure_python() {
    std::call_once(g_init_once, [] {
        if (!Py_IsInitialized()) {
            Py_InitializeEx(0);
        }
        PyGILState_STATE gil = PyGILState_Ensure();
        g_capi = PyImport_ImportModule("onnxstream_tpu.api.capi");
        if (!g_capi) {
            PyErr_Print();
        }
        PyGILState_Release(gil);
    });
}

char* dup_cstr(const std::string& s) {
    char* out = (char*)::malloc(s.size() + 1);
    std::memcpy(out, s.c_str(), s.size() + 1);
    return out;
}

// call capi.<fn>(args...) and return the result (new ref), or nullptr
PyObject* call(const char* fn, PyObject* args) {
    if (!g_capi) return nullptr;
    PyObject* f = PyObject_GetAttrString(g_capi, fn);
    if (!f) { PyErr_Print(); Py_XDECREF(args); return nullptr; }
    PyObject* r = PyObject_CallObject(f, args);
    Py_DECREF(f);
    Py_XDECREF(args);
    if (!r) PyErr_Print();
    return r;
}

struct ReturnLayout {  // identical to the reference's model_get_tensor layout
    size_t dims_num;
    size_t* dims;
    size_t data_num;
    float* data;
};

}  // namespace

typedef void ModelContext;  // opaque: the integer handle

OSTPU_EXPORT ModelContext* model_new() {
    ensure_python();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* r = call("model_new", PyTuple_New(0));
    long h = r ? PyLong_AsLong(r) : 0;
    Py_XDECREF(r);
    PyGILState_Release(gil);
    return (ModelContext*)(intptr_t)h;
}

OSTPU_EXPORT ModelContext* model_new_2(int threads_count, char* wp_name) {
    ensure_python();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* r = call("model_new_2", Py_BuildValue("(is)", threads_count, wp_name ? wp_name : "dict"));
    long h = r ? PyLong_AsLong(r) : 0;
    Py_XDECREF(r);
    PyGILState_Release(gil);
    return (ModelContext*)(intptr_t)h;
}

OSTPU_EXPORT void model_delete(ModelContext* obj) {
    PyGILState_STATE gil = PyGILState_Ensure();
    Py_XDECREF(call("model_delete", Py_BuildValue("(l)", (long)(intptr_t)obj)));
    PyGILState_Release(gil);
}

OSTPU_EXPORT void model_read_string(ModelContext* obj, char* str) {
    PyGILState_STATE gil = PyGILState_Ensure();
    Py_XDECREF(call("model_read_string", Py_BuildValue("(ls)", (long)(intptr_t)obj, str)));
    PyGILState_Release(gil);
}

OSTPU_EXPORT char* model_read_file(ModelContext* obj, char* fn) {
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* r = call("model_read_file", Py_BuildValue("(ls)", (long)(intptr_t)obj, fn));
    char* err = nullptr;
    if (r && r != Py_None) err = dup_cstr(PyUnicode_AsUTF8(r));
    Py_XDECREF(r);
    PyGILState_Release(gil);
    return err;
}

OSTPU_EXPORT char* model_get_weights_names(ModelContext* obj) {
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* r = call("model_get_weights_names", Py_BuildValue("(l)", (long)(intptr_t)obj));
    char* out = r ? dup_cstr(PyUnicode_AsUTF8(r)) : nullptr;
    Py_XDECREF(r);
    PyGILState_Release(gil);
    return out;
}

// Client allocates-and-fills: we return a malloc'd staging buffer; the bytes
// are handed to Python on the next model_run (deferred copy like the
// reference's alloc-in-provider flow).
struct PendingWeight {
    std::string type, name;
    void* buf;
    unsigned size;
};
static std::vector<PendingWeight>* g_pending = nullptr;

OSTPU_EXPORT void* model_add_weights_file(ModelContext* obj, char* type, char* name, unsigned int size) {
    void* buf = ::malloc(size);
    PyGILState_STATE gil = PyGILState_Ensure();
    if (!g_pending) g_pending = new std::vector<PendingWeight>();
    g_pending->push_back({type ? type : "float32", name ? name : "", buf, size});
    PyGILState_Release(gil);
    (void)obj;
    return buf;
}

static void flush_pending(long h) {
    if (!g_pending) return;
    for (auto& p : *g_pending) {
        PyObject* mem = PyMemoryView_FromMemory((char*)p.buf, p.size, PyBUF_READ);
        Py_XDECREF(call("model_add_weights_file",
                        Py_BuildValue("(lssN)", h, p.type.c_str(), p.name.c_str(), mem)));
        ::free(p.buf);
    }
    g_pending->clear();
}

OSTPU_EXPORT void* model_add_tensor(ModelContext* obj, char* type, char* name,
                                    unsigned int dims_num, unsigned int* dims) {
    // allocate a buffer the caller fills; pushed on run (exports.cpp:169-203)
    size_t n = 1;
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* dlist = PyList_New(dims_num);
    for (unsigned i = 0; i < dims_num; i++) {
        n *= dims[i];
        PyList_SetItem(dlist, i, PyLong_FromUnsignedLong(dims[i]));
    }
    size_t itemsize = 4;
    std::string t = type ? type : "float32";
    if (t == "float16") itemsize = 2;
    else if (t == "int64") itemsize = 8;
    else if (t == "uint8") itemsize = 1;
    void* buf = ::malloc(n * itemsize);
    if (!g_pending) g_pending = new std::vector<PendingWeight>();
    // reuse the pending mechanism with a "tensor:" tag
    PyObject* mem = PyMemoryView_FromMemory((char*)buf, n * itemsize, PyBUF_READ);
    // store as deferred tensor push: (handle, type, name, dims, memoryview)
    PyObject* pending = PyObject_GetAttrString(g_capi, "_pending_tensors");
    if (!pending) {
        PyErr_Clear();
        pending = PyList_New(0);
        PyObject_SetAttrString(g_capi, "_pending_tensors", pending);
    }
    PyObject* entry = Py_BuildValue("(lssNN)", (long)(intptr_t)obj, t.c_str(), name, dlist, mem);
    PyList_Append(pending, entry);
    Py_DECREF(entry);
    Py_DECREF(pending);
    PyGILState_Release(gil);
    return buf;
}

static void flush_tensors(long h) {
    PyObject* pending = PyObject_GetAttrString(g_capi, "_pending_tensors");
    if (!pending) { PyErr_Clear(); return; }
    Py_ssize_t n = PyList_Size(pending);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject* e = PyList_GetItem(pending, i);  // borrowed
        long eh = PyLong_AsLong(PyTuple_GetItem(e, 0));
        if (eh != h) continue;
        Py_XDECREF(call("model_add_tensor",
                        Py_BuildValue("(lOOOO)", h, PyTuple_GetItem(e, 1), PyTuple_GetItem(e, 2),
                                      PyTuple_GetItem(e, 3), PyTuple_GetItem(e, 4))));
    }
    PyObject* empty = PyList_New(0);
    PyObject_SetAttrString(g_capi, "_pending_tensors", empty);
    Py_DECREF(empty);
    Py_DECREF(pending);
}

OSTPU_EXPORT void* model_get_tensor(ModelContext* obj, char* name) {
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* r = call("model_get_tensor", Py_BuildValue("(ls)", (long)(intptr_t)obj, name));
    if (!r || r == Py_None) {
        Py_XDECREF(r);
        PyGILState_Release(gil);
        return nullptr;
    }
    PyObject* dims = PyTuple_GetItem(r, 0);
    PyObject* data = PyTuple_GetItem(r, 1);
    Py_ssize_t nd = PyList_Size(dims);
    Py_buffer view;
    if (PyObject_GetBuffer(data, &view, PyBUF_SIMPLE) != 0) {
        PyErr_Print();
        Py_DECREF(r);
        PyGILState_Release(gil);
        return nullptr;
    }
    size_t nel = view.len / sizeof(float);
    // one malloc holding layout + dims + data (freed by model_free_buffer)
    size_t bytes = sizeof(ReturnLayout) + nd * sizeof(size_t) + view.len;
    ReturnLayout* ret = (ReturnLayout*)::malloc(bytes);
    ret->dims_num = (size_t)nd;
    ret->dims = (size_t*)((char*)ret + sizeof(ReturnLayout));
    ret->data_num = nel;
    ret->data = (float*)((char*)ret->dims + nd * sizeof(size_t));
    for (Py_ssize_t i = 0; i < nd; i++) ret->dims[i] = (size_t)PyLong_AsSize_t(PyList_GetItem(dims, i));
    std::memcpy(ret->data, view.buf, view.len);
    PyBuffer_Release(&view);
    Py_DECREF(r);
    PyGILState_Release(gil);
    return ret;
}

OSTPU_EXPORT char* model_get_all_tensor_names(ModelContext* obj) {
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* r = call("model_get_all_tensor_names", Py_BuildValue("(l)", (long)(intptr_t)obj));
    char* out = r ? dup_cstr(PyUnicode_AsUTF8(r)) : nullptr;
    Py_XDECREF(r);
    PyGILState_Release(gil);
    return out;
}

OSTPU_EXPORT void model_run(ModelContext* obj) {
    PyGILState_STATE gil = PyGILState_Ensure();
    long h = (long)(intptr_t)obj;
    flush_pending(h);
    flush_tensors(h);
    Py_XDECREF(call("model_run", Py_BuildValue("(l)", h)));
    PyGILState_Release(gil);
}

OSTPU_EXPORT char* model_run_2(ModelContext* obj) {
    PyGILState_STATE gil = PyGILState_Ensure();
    long h = (long)(intptr_t)obj;
    flush_pending(h);
    flush_tensors(h);
    PyObject* r = call("model_run_2", Py_BuildValue("(l)", h));
    char* err = nullptr;
    if (r && r != Py_None) err = dup_cstr(PyUnicode_AsUTF8(r));
    Py_XDECREF(r);
    PyGILState_Release(gil);
    return err;
}

OSTPU_EXPORT void model_clear_tensors(ModelContext* obj) {
    PyGILState_STATE gil = PyGILState_Ensure();
    Py_XDECREF(call("model_clear_tensors", Py_BuildValue("(l)", (long)(intptr_t)obj)));
    PyGILState_Release(gil);
}

OSTPU_EXPORT void model_set_option(ModelContext* obj, char* name, unsigned int value) {
    PyGILState_STATE gil = PyGILState_Ensure();
    Py_XDECREF(call("model_set_option", Py_BuildValue("(lsI)", (long)(intptr_t)obj, name, value)));
    PyGILState_Release(gil);
}

OSTPU_EXPORT void model_add_extra_output(ModelContext* obj, char* name) {
    PyGILState_STATE gil = PyGILState_Ensure();
    Py_XDECREF(call("model_add_extra_output", Py_BuildValue("(ls)", (long)(intptr_t)obj, name)));
    PyGILState_Release(gil);
}

OSTPU_EXPORT void model_free_buffer(void* ptr) { ::free(ptr); }
