/* Standalone C client of the libonnxstream_tpu C ABI (VERDICT r4 #6).
 *
 * Exercises every exported function of csrc/exports.cpp — the same
 * 15-function surface as the reference src/exports.cpp:42-311 — through a
 * REAL C compiler and linker, not ctypes: model_new, model_new_2,
 * model_read_string, model_read_file (error path), model_get_weights_names,
 * model_add_weights_file, model_add_tensor, model_get_tensor,
 * model_get_all_tensor_names, model_run, model_run_2, model_clear_tensors,
 * model_set_option, model_add_extra_output, model_free_buffer, model_delete.
 *
 * Model: z = x * w + b (the same two-op graph as tests/test_api.py), with
 * the intermediate y requested as an extra output. Exit 0 on success; any
 * assertion failure prints the reason and exits 1.
 *
 * Compiled and run by tests/test_capi_c_client.py:
 *   gcc capi_smoke.c -L<repo>/csrc -lonnxstream_tpu -Wl,-rpath,<repo>/csrc
 * with PYTHONPATH=<repo>:<venv site-packages> and JAX_PLATFORMS=cpu so the
 * embedded CPython finds the package and stays off the tunneled chip.
 */
#include <stddef.h>
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* --- the ABI (mirrors csrc/exports.cpp; C-compilable header-free form) --- */
typedef void ModelContext;
extern ModelContext* model_new(void);
extern ModelContext* model_new_2(int threads_count, char* wp_name);
extern void model_delete(ModelContext* obj);
extern void model_read_string(ModelContext* obj, char* str);
extern char* model_read_file(ModelContext* obj, char* fn);
extern char* model_get_weights_names(ModelContext* obj);
extern void* model_add_weights_file(ModelContext* obj, char* type, char* name,
                                    unsigned int size);
extern void* model_add_tensor(ModelContext* obj, char* type, char* name,
                              unsigned int dims_num, unsigned int* dims);
extern void* model_get_tensor(ModelContext* obj, char* name);
extern char* model_get_all_tensor_names(ModelContext* obj);
extern void model_run(ModelContext* obj);
extern char* model_run_2(ModelContext* obj);
extern void model_clear_tensors(ModelContext* obj);
extern void model_set_option(ModelContext* obj, char* name, unsigned int value);
extern void model_add_extra_output(ModelContext* obj, char* name);
extern void model_free_buffer(void* ptr);

/* model_get_tensor return layout (exports.cpp ReturnLayout — identical to
 * the reference's model_get_tensor contract) */
typedef struct {
    size_t dims_num;
    size_t* dims;
    size_t data_num;
    float* data;
} TensorResult;

#define CHECK(cond, msg)                                        \
    do {                                                        \
        if (!(cond)) {                                          \
            fprintf(stderr, "FAIL: %s (%s:%d)\n", msg,          \
                    __FILE__, __LINE__);                        \
            exit(1);                                            \
        }                                                       \
    } while (0)

static char MODEL_TXT[] =
    "m:Mul*input:x(2,3);w.bin(float32:2,3)*output:y(2,3)\n"
    "a:Add*input:y(2,3);b.bin(float32:3)*output:z(2,3)\n";

static void* thread_worker(void* arg) {
    (void)arg;
    ModelContext* m = model_new_2(0, "dict");
    if (!m) return NULL;
    float* w = (float*)model_add_weights_file(m, "float32", "w.bin", 6 * 4);
    for (int i = 0; i < 6; i++) w[i] = 1.0f;
    float* b = (float*)model_add_weights_file(m, "float32", "b.bin", 3 * 4);
    for (int i = 0; i < 3; i++) b[i] = 0.5f;
    model_read_string(m, MODEL_TXT);
    unsigned int dims[2] = {2, 3};
    float* x = (float*)model_add_tensor(m, "float32", "x", 2, dims);
    for (int i = 0; i < 6; i++) x[i] = 4.0f;
    model_run(m);
    TensorResult* z = (TensorResult*)model_get_tensor(m, "z");
    if (!z || z->data_num != 6) return NULL;
    for (int i = 0; i < 6; i++) {
        if (z->data[i] < 4.5f - 1e-5f || z->data[i] > 4.5f + 1e-5f) return NULL;
    }
    model_free_buffer(z);
    model_delete(m);
    return (void*)1;
}

int main(void) {
    /* model_new + model_delete: trivial lifecycle */
    ModelContext* m0 = model_new();
    CHECK(m0 != NULL, "model_new returned NULL");
    model_delete(m0);

    ModelContext* m = model_new_2(0, "dict");
    CHECK(m != NULL, "model_new_2 returned NULL");

    /* model_read_file error path: non-NULL error string for a missing file */
    char* err = model_read_file(m, "/nonexistent/model.txt");
    CHECK(err != NULL && strlen(err) > 0, "model_read_file should error");
    model_free_buffer(err);

    /* client-allocates-and-fills weight staging (the WASM flow) */
    float* w = (float*)model_add_weights_file(m, "float32", "w.bin", 6 * 4);
    CHECK(w != NULL, "model_add_weights_file returned NULL");
    for (int i = 0; i < 6; i++) w[i] = (float)i; /* 0..5 */
    float* b = (float*)model_add_weights_file(m, "float32", "b.bin", 3 * 4);
    for (int i = 0; i < 3; i++) b[i] = (float)(i + 1); /* 1,2,3 */

    model_read_string(m, MODEL_TXT);

    char* names = model_get_weights_names(m);
    CHECK(names != NULL, "model_get_weights_names returned NULL");
    CHECK(strcmp(names, "float32:w.bin|float32:b.bin") == 0,
          "weights manifest mismatch");
    model_free_buffer(names);

    model_set_option(m, "use_ops_cache", 1);
    model_add_extra_output(m, "y"); /* intermediate y becomes an output */

    unsigned int dims[2] = {2, 3};
    float* x = (float*)model_add_tensor(m, "float32", "x", 2, dims);
    CHECK(x != NULL, "model_add_tensor returned NULL");
    for (int i = 0; i < 6; i++) x[i] = 2.0f;

    model_run(m);

    /* z = x*w + b, row-major: z[i,j] = 2*w[i,j] + b[j] */
    TensorResult* z = (TensorResult*)model_get_tensor(m, "z");
    CHECK(z != NULL, "model_get_tensor(z) returned NULL");
    CHECK(z->dims_num == 2 && z->dims[0] == 2 && z->dims[1] == 3,
          "z dims mismatch");
    CHECK(z->data_num == 6, "z element count mismatch");
    for (int i = 0; i < 2; i++) {
        for (int j = 0; j < 3; j++) {
            float want = 2.0f * (float)(i * 3 + j) + (float)(j + 1);
            float got = z->data[i * 3 + j];
            if (got < want - 1e-5f || got > want + 1e-5f) {
                fprintf(stderr, "FAIL: z[%d,%d]=%f want %f\n", i, j, got, want);
                exit(1);
            }
        }
    }
    model_free_buffer(z);

    /* extra output y = x*w */
    TensorResult* y = (TensorResult*)model_get_tensor(m, "y");
    CHECK(y != NULL, "model_get_tensor(y) returned NULL (extra output)");
    CHECK(y->data_num == 6, "y element count mismatch");
    for (int i = 0; i < 6; i++) {
        float want = 2.0f * (float)i;
        if (y->data[i] < want - 1e-5f || y->data[i] > want + 1e-5f) {
            fprintf(stderr, "FAIL: y[%d]=%f want %f\n", i, y->data[i], want);
            exit(1);
        }
    }
    model_free_buffer(y);

    char* all = model_get_all_tensor_names(m);
    CHECK(all != NULL, "model_get_all_tensor_names returned NULL");
    CHECK(strstr(all, "z") != NULL && strstr(all, "y") != NULL,
          "output names missing from tensor list");
    model_free_buffer(all);

    /* clear + re-run via the error-string variant */
    model_clear_tensors(m);
    float* x2 = (float*)model_add_tensor(m, "float32", "x", 2, dims);
    for (int i = 0; i < 6; i++) x2[i] = 3.0f;
    char* run_err = model_run_2(m);
    CHECK(run_err == NULL, "model_run_2 reported an error on a valid run");
    TensorResult* z2 = (TensorResult*)model_get_tensor(m, "z");
    CHECK(z2 != NULL, "model_get_tensor(z) after clear+rerun returned NULL");
    CHECK(z2->data[4] == 3.0f * 4.0f + 2.0f, "rerun value mismatch");
    model_free_buffer(z2);

    model_delete(m);

    /* cross-thread use: the ABI header promises any-thread callability.
     * Py_InitializeEx leaves the FIRST thread holding the GIL; without the
     * runtime's PyEval_SaveThread() release, this worker would deadlock in
     * PyGILState_Ensure forever (the C# finalizer-thread scenario). */
    pthread_t th;
    int trc = pthread_create(&th, NULL, thread_worker, NULL);
    CHECK(trc == 0, "pthread_create failed");
    void* tres = NULL;
    pthread_join(th, &tres);
    CHECK(tres == (void*)1, "worker thread model run failed");

    printf("CAPI_C_SMOKE_OK\n");
    return 0;
}
