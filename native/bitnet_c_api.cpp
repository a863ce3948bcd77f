// C ABI for bitnet_tpu — native surface for C/C++ hosts.
//
// Mirrors the reference's bitnet-ffi C API
// (crates/bitnet-ffi/src/c_api.rs:39-576: bitnet_version, bitnet_init,
// bitnet_model_load/free, bitnet_inference[_with_config], error
// retrieval).  The engine itself is the JAX/XLA runtime, so this layer
// embeds CPython: a standalone C program gets a full TPU inference stack
// through four calls; when the host process *is* Python (ctypes tests),
// the existing interpreter is reused via PyGILState.
//
// Thread model: every entry point acquires the GIL; handles are opaque
// indices into a process-global model table.
//
// Build: native/Makefile target libbitnet_c.so (links libpython).

#include <Python.h>

#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>

#define BN_EXPORT extern "C" __attribute__((visibility("default")))

static std::mutex g_mu;
static std::map<int, PyObject*> g_models;  // handle -> InferenceEngine
static int g_next_handle = 1;
static thread_local std::string g_last_error;
static bool g_we_initialized = false;

static void set_error(const char* what) {
  g_last_error = what ? what : "unknown error";
}

static void set_error_from_python() {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  if (value) {
    PyObject* s = PyObject_Str(value);
    if (s) {
      set_error(PyUnicode_AsUTF8(s));
      Py_DECREF(s);
    }
  } else {
    set_error("python error (no message)");
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

struct Gil {
  PyGILState_STATE st;
  Gil() : st(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(st); }
};

BN_EXPORT const char* bitnet_version() { return "bitnet-tpu-0.1.0"; }

BN_EXPORT const char* bitnet_last_error() { return g_last_error.c_str(); }

// Initialize the runtime. repo_path: directory containing bitnet_tpu/
// (NULL = already importable). Returns 0 on success.
BN_EXPORT int bitnet_init(const char* repo_path) {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_we_initialized = true;
  }
  Gil gil;
  if (repo_path && *repo_path) {
    PyObject* sys_path = PySys_GetObject("path");  // borrowed
    PyObject* p = PyUnicode_FromString(repo_path);
    if (!sys_path || !p || PyList_Insert(sys_path, 0, p) < 0) {
      Py_XDECREF(p);
      set_error_from_python();
      return -1;
    }
    Py_DECREF(p);
  }
  PyObject* mod = PyImport_ImportModule("bitnet_tpu");
  if (!mod) {
    set_error_from_python();
    return -1;
  }
  Py_DECREF(mod);
  return 0;
}

// Load a GGUF model; returns handle > 0, or < 0 on error.
// max_seq_len <= 0 picks the engine default.
BN_EXPORT int bitnet_model_load(const char* gguf_path, int max_seq_len) {
  Gil gil;
  PyObject* mod = PyImport_ImportModule("bitnet_tpu.engine");
  if (!mod) { set_error_from_python(); return -1; }
  PyObject* cls = PyObject_GetAttrString(mod, "InferenceEngine");
  Py_DECREF(mod);
  if (!cls) { set_error_from_python(); return -1; }
  PyObject* kwargs = PyDict_New();
  if (max_seq_len > 0) {
    PyObject* cfgmod = PyImport_ImportModule("bitnet_tpu.config");
    PyObject* ccls = cfgmod ? PyObject_GetAttrString(cfgmod, "EngineConfig")
                            : nullptr;
    Py_XDECREF(cfgmod);
    if (ccls) {
      PyObject* ckw = Py_BuildValue("{s:i}", "max_seq_len", max_seq_len);
      PyObject* empty = PyTuple_New(0);
      PyObject* cfg = PyObject_Call(ccls, empty, ckw);
      Py_DECREF(empty);
      Py_DECREF(ckw);
      Py_DECREF(ccls);
      if (cfg) {
        PyDict_SetItemString(kwargs, "engine_cfg", cfg);
        Py_DECREF(cfg);
      }
    }
  }
  PyObject* meth = PyObject_GetAttrString(cls, "from_gguf");
  Py_DECREF(cls);
  if (!meth) { Py_DECREF(kwargs); set_error_from_python(); return -1; }
  PyObject* args = Py_BuildValue("(s)", gguf_path);
  PyObject* eng = PyObject_Call(meth, args, kwargs);
  Py_DECREF(meth);
  Py_DECREF(args);
  Py_DECREF(kwargs);
  if (!eng) { set_error_from_python(); return -1; }
  std::lock_guard<std::mutex> lk(g_mu);
  const int h = g_next_handle++;
  g_models[h] = eng;
  return h;
}

BN_EXPORT int bitnet_model_free(int handle) {
  PyObject* eng = nullptr;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_models.find(handle);
    if (it == g_models.end()) { set_error("bad handle"); return -1; }
    eng = it->second;
    g_models.erase(it);
  }
  Gil gil;
  Py_DECREF(eng);
  return 0;
}

// Shared generation core: look up the engine, build a GenerationConfig
// from prepared kwargs (ownership taken), run generate(), copy text out.
static int bn_generate(int handle, const char* prompt, PyObject* gkw,
                       int seed, char* out, int out_len) {
  PyObject* eng;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_models.find(handle);
    if (it == g_models.end()) {
      set_error("bad handle");
      Gil gil;
      Py_XDECREF(gkw);
      return -1;
    }
    eng = it->second;
  }
  Gil gil;
  if (!gkw) { set_error_from_python(); return -1; }
  PyObject* cfgmod = PyImport_ImportModule("bitnet_tpu.config");
  if (!cfgmod) { Py_DECREF(gkw); set_error_from_python(); return -1; }
  PyObject* gcls = PyObject_GetAttrString(cfgmod, "GenerationConfig");
  Py_DECREF(cfgmod);
  if (!gcls) { Py_DECREF(gkw); set_error_from_python(); return -1; }
  if (seed >= 0) {
    PyObject* s = PyLong_FromLong(seed);
    PyDict_SetItemString(gkw, "seed", s);
    Py_DECREF(s);
  }
  PyObject* empty = PyTuple_New(0);
  PyObject* gcfg = PyObject_Call(gcls, empty, gkw);
  Py_DECREF(empty);
  Py_DECREF(gkw);
  Py_DECREF(gcls);
  if (!gcfg) { set_error_from_python(); return -1; }
  PyObject* res =
      PyObject_CallMethod(eng, "generate", "sO", prompt, gcfg);
  Py_DECREF(gcfg);
  if (!res) { set_error_from_python(); return -1; }
  PyObject* text = PyObject_GetAttrString(res, "text");
  PyObject* ids = PyObject_GetAttrString(res, "token_ids");
  int n = -1;
  if (text && ids) {
    const char* t = PyUnicode_AsUTF8(text);
    if (t && out && out_len > 0) {
      std::snprintf(out, (size_t)out_len, "%s", t);
    }
    n = (int)PyList_Size(ids);
  } else {
    set_error_from_python();
  }
  Py_XDECREF(text);
  Py_XDECREF(ids);
  Py_DECREF(res);
  return n;
}

// Greedy/sampled generation. Writes UTF-8 into out (<= out_len-1 bytes,
// NUL terminated). Returns number of generated tokens, or < 0 on error.
BN_EXPORT int bitnet_inference_with_config(int handle, const char* prompt,
                                           char* out, int out_len,
                                           int max_new_tokens,
                                           float temperature, int top_k,
                                           float top_p, int seed,
                                           int greedy) {
  Gil gil;
  PyObject* gkw = Py_BuildValue(
      "{s:i,s:f,s:i,s:f,s:O}", "max_new_tokens",
      max_new_tokens > 0 ? max_new_tokens : 64, "temperature", temperature,
      "top_k", top_k, "top_p", top_p, "greedy",
      greedy ? Py_True : Py_False);
  return bn_generate(handle, prompt, gkw, seed, out, out_len);
}

BN_EXPORT int bitnet_inference(int handle, const char* prompt, char* out,
                               int out_len) {
  return bitnet_inference_with_config(handle, prompt, out, out_len, 64,
                                      0.0f, 0, 1.0f, 0, 1);
}

// Grammar-constrained generation (no llama.cpp C-API equivalent is
// exposed by the reference's FFI crate; GBNF dialect per grammar/gbnf.py).
// `grammar` is GBNF source text; returns token count or -1 (see
// bitnet_last_error, e.g. malformed grammar).
BN_EXPORT int bitnet_inference_grammar(int handle, const char* prompt,
                                       const char* grammar, char* out,
                                       int out_len, int max_new_tokens,
                                       float temperature, int seed,
                                       int greedy) {
  Gil gil;
  PyObject* gkw = Py_BuildValue(
      "{s:i,s:f,s:s,s:O}", "max_new_tokens",
      max_new_tokens > 0 ? max_new_tokens : 64, "temperature", temperature,
      "grammar", grammar ? grammar : "", "greedy",
      greedy ? Py_True : Py_False);
  return bn_generate(handle, prompt, gkw, seed, out, out_len);
}

BN_EXPORT int bitnet_cleanup() {
  {
    Gil gil;
    std::lock_guard<std::mutex> lk(g_mu);
    for (auto& kv : g_models) Py_DECREF(kv.second);
    g_models.clear();
  }
  // never finalize an interpreter we did not create
  if (g_we_initialized && Py_IsInitialized()) {
    Py_FinalizeEx();
    g_we_initialized = false;
  }
  return 0;
}
