// In-process C++ API over the embedded CPython interpreter. See dpapi.hpp.
//
// reference: src/api/cpp/src/deeppowers.cpp:12-47 (api::Model::Impl owns the
// device + model and exposes generate); here the "device" is the JAX
// runtime, owned by the embedded interpreter, and the C++ layer is a thin
// GIL-disciplined broker. No Python C API types leak into the public
// header.

#include "dpapi.hpp"

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cstring>
#include <mutex>
#include <sstream>

namespace dp {
namespace {

std::atomic<bool> g_owns_interpreter{false};
PyThreadState* g_main_state = nullptr;
PyObject* g_helpers = nullptr;  // module dict holding _dp_* helpers
std::mutex g_init_mutex;

// Helpers compiled once at initialize(). Kept in Python so the C++ layer
// never touches pytrees/configs structurally.
const char* kHelperSource = R"PY(
def _dp_setup(package_root, platform):
    import sys
    if package_root:
        sys.path.insert(0, package_root)
    if platform:
        # jax.config, not the env var: out-of-tree TPU plugins ignore
        # JAX_PLATFORMS from the environment on some runtimes
        import jax
        jax.config.update('jax_platforms', platform)

def _dp_load(path, quantize):
    import deeppowers_tpu as dpt
    m = dpt.Model.from_pretrained(path)
    if quantize:
        # full quantization bookkeeping lives in ONE place (api.py
        # apply_quantization: w8a8/w4a8 act_bits, mixed overrides, unknown
        # precision strings raise instead of silently misquantizing)
        gs = 0 if quantize in ("int8", "w8a8") else 128
        m.apply_quantization(quantize, group_size=gs)
    return m

def _dp_cfg(max_tokens, temperature, top_k, top_p, do_sample, seed, stop):
    from deeppowers_tpu.config import GenerationConfig
    kw = dict(max_tokens=max_tokens, temperature=temperature, top_k=top_k,
              top_p=top_p, do_sample=do_sample, stop_tokens=tuple(stop))
    if seed >= 0:
        kw["seed"] = int(seed)
    return GenerationConfig(**kw)
)PY";

class GIL {
 public:
  GIL() : state_(PyGILState_Ensure()) {}
  ~GIL() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

[[noreturn]] void throw_py_error(const char* where) {
  std::string msg = std::string(where) + ": ";
  PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  if (value != nullptr) {
    PyObject* s = PyObject_Str(value);
    if (s != nullptr) {
      msg += PyUnicode_AsUTF8(s);
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  throw Error(msg);
}

std::string to_string(PyObject* obj, const char* where) {
  if (obj == nullptr) throw_py_error(where);
  if (!PyUnicode_Check(obj)) {
    Py_DECREF(obj);
    throw Error(std::string(where) + ": expected str result");
  }
  Py_ssize_t n = 0;
  const char* data = PyUnicode_AsUTF8AndSize(obj, &n);
  if (data == nullptr) {  // e.g. lone surrogates: not UTF-8 encodable
    Py_DECREF(obj);
    throw_py_error(where);
  }
  std::string out(data, static_cast<size_t>(n));
  Py_DECREF(obj);
  return out;
}

// PyUnicode_FromString on arbitrary bytes can fail (invalid UTF-8); a NULL
// slipped into a list both corrupts the call and leaves an exception set.
PyObject* make_str_list(const std::vector<std::string>& items,
                        const char* where) {
  PyObject* list = PyList_New(static_cast<Py_ssize_t>(items.size()));
  if (list == nullptr) throw_py_error(where);
  for (size_t i = 0; i < items.size(); ++i) {
    PyObject* s = PyUnicode_FromString(items[i].c_str());
    if (s == nullptr) {
      Py_DECREF(list);
      throw_py_error(where);
    }
    PyList_SetItem(list, static_cast<Py_ssize_t>(i), s);
  }
  return list;
}

PyObject* helper(const char* fn) {
  PyObject* f = PyDict_GetItemString(g_helpers, fn);  // borrowed
  if (f == nullptr) throw Error(std::string("missing helper ") + fn);
  return f;
}

PyObject* build_cfg(const GenerationConfig& cfg) {
  PyObject* stop = make_str_list(cfg.stop, "GenerationConfig stop");
  PyObject* out = PyObject_CallFunction(
      helper("_dp_cfg"), "ifidOlO", cfg.max_tokens,
      static_cast<double>(cfg.temperature), cfg.top_k,
      static_cast<double>(cfg.top_p), cfg.do_sample ? Py_True : Py_False,
      cfg.seed, stop);
  Py_DECREF(stop);
  if (out == nullptr) throw_py_error("GenerationConfig");
  return out;
}

// Owned-reference guard: Py_DECREF on scope exit even when a helper throws
// (manual cleanup leaked the streaming callback when build_cfg failed).
struct Ref {
  PyObject* p;
  explicit Ref(PyObject* obj) : p(obj) {}
  ~Ref() { Py_XDECREF(p); }
  Ref(const Ref&) = delete;
  Ref& operator=(const Ref&) = delete;
};

// ---- streaming trampoline: a PyCFunction whose self is a capsule over the
// C++ std::function (plus an exception slot so C++ callbacks can't unwind
// through the interpreter frame) ----
struct StreamCtx {
  const std::function<bool(const std::string&)>* fn;
  std::exception_ptr error;
};

PyObject* stream_trampoline(PyObject* self, PyObject* args) {
  const char* text = nullptr;
  Py_ssize_t len = 0;
  // "s#" (not "s"): deltas may legally contain NUL bytes — a byte-level
  // tokenizer can decode token 0 to "\x00"
  if (!PyArg_ParseTuple(args, "s#", &text, &len)) return nullptr;
  auto* ctx = static_cast<StreamCtx*>(PyCapsule_GetPointer(self, "dp.cb"));
  if (ctx == nullptr) return nullptr;
  bool cont = true;
  try {
    cont = (*ctx->fn)(std::string(text, static_cast<size_t>(len)));
  } catch (...) {
    ctx->error = std::current_exception();
    cont = false;
  }
  return PyBool_FromLong(cont ? 1 : 0);
}

PyMethodDef g_stream_def = {"_dp_stream_cb", stream_trampoline, METH_VARARGS,
                            nullptr};

}  // namespace

void initialize(const RuntimeOptions& opts) {
  std::lock_guard<std::mutex> lock(g_init_mutex);
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_owns_interpreter = true;
  }
  {
    // At this point this thread holds the GIL (fresh init) or must take it.
    PyGILState_STATE st = PyGILState_Ensure();
    if (g_helpers == nullptr) {
      PyObject* mod = PyImport_AddModule("__dp_embed__");  // borrowed
      PyObject* dict = PyModule_GetDict(mod);              // borrowed
      PyDict_SetItemString(dict, "__builtins__", PyEval_GetBuiltins());
      PyObject* res =
          PyRun_String(kHelperSource, Py_file_input, dict, dict);
      if (res == nullptr) {
        PyGILState_Release(st);
        throw_py_error("helper compilation");
      }
      Py_DECREF(res);
      g_helpers = dict;
      Py_INCREF(g_helpers);
    }
    // paths/platform ride as str ARGUMENTS (never interpolated into
    // source: a quote or trailing backslash in a legitimate directory
    // name must not become a syntax error)
    PyObject* r = PyObject_CallFunction(
        helper("_dp_setup"), "ss", opts.package_root.c_str(),
        opts.platform.c_str());
    if (r == nullptr) {
      PyGILState_Release(st);
      throw_py_error("runtime setup (sys.path / jax platform)");
    }
    Py_DECREF(r);
    PyGILState_Release(st);
  }
  // If we created the interpreter, release the GIL so any thread can call
  // in through PyGILState_Ensure.
  if (g_owns_interpreter && g_main_state == nullptr) {
    g_main_state = PyEval_SaveThread();
  }
}

void finalize() {
  std::lock_guard<std::mutex> lock(g_init_mutex);
  if (!g_owns_interpreter) return;
  if (g_main_state != nullptr) {
    PyEval_RestoreThread(g_main_state);
    g_main_state = nullptr;
  }
  Py_XDECREF(g_helpers);
  g_helpers = nullptr;
  Py_Finalize();
  g_owns_interpreter = false;
}

Model::Model(void* py_model) : py_(py_model) {}

Model::Model(Model&& other) noexcept : py_(other.py_) { other.py_ = nullptr; }

Model& Model::operator=(Model&& other) noexcept {
  if (this != &other) {
    if (py_ != nullptr) {
      GIL gil;
      Py_DECREF(static_cast<PyObject*>(py_));
    }
    py_ = other.py_;
    other.py_ = nullptr;
  }
  return *this;
}

Model::~Model() {
  if (py_ != nullptr && Py_IsInitialized()) {
    GIL gil;
    Py_DECREF(static_cast<PyObject*>(py_));
  }
}

Model Model::from_pretrained(const std::string& path_or_preset,
                             const std::string& quantize) {
  GIL gil;
  if (g_helpers == nullptr) throw Error("dp::initialize() not called");
  PyObject* m = PyObject_CallFunction(helper("_dp_load"), "ss",
                                      path_or_preset.c_str(),
                                      quantize.c_str());
  if (m == nullptr) throw_py_error("from_pretrained");
  return Model(m);
}

std::string Model::generate(const std::string& prompt,
                            const GenerationConfig& cfg) const {
  GIL gil;
  PyObject* pycfg = build_cfg(cfg);
  PyObject* out = PyObject_CallMethod(static_cast<PyObject*>(py_),
                                      "generate", "sO", prompt.c_str(),
                                      pycfg);
  Py_DECREF(pycfg);
  return to_string(out, "generate");
}

std::vector<std::string> Model::generate_batch(
    const std::vector<std::string>& prompts,
    const GenerationConfig& cfg) const {
  GIL gil;
  Ref plist(make_str_list(prompts, "generate_batch prompts"));
  Ref pycfg(build_cfg(cfg));
  Ref out(PyObject_CallMethod(static_cast<PyObject*>(py_),
                              "generate_batch", "OO", plist.p, pycfg.p));
  if (out.p == nullptr) throw_py_error("generate_batch");
  std::vector<std::string> results;
  if (PyList_Check(out.p)) {
    Py_ssize_t n = PyList_Size(out.p);
    results.reserve(static_cast<size_t>(n));
    for (Py_ssize_t i = 0; i < n; ++i) {
      PyObject* item = PyList_GetItem(out.p, i);  // borrowed
      Py_INCREF(item);
      results.push_back(to_string(item, "generate_batch item"));
    }
  }
  return results;
}

std::string Model::generate_stream(
    const std::string& prompt, const GenerationConfig& cfg,
    const std::function<bool(const std::string&)>& on_text) const {
  GIL gil;
  StreamCtx ctx{&on_text, nullptr};
  PyObject* capsule = PyCapsule_New(&ctx, "dp.cb", nullptr);
  if (capsule == nullptr) throw_py_error("generate_stream capsule");
  Ref cb(PyCFunction_New(&g_stream_def, capsule));
  Py_DECREF(capsule);  // cb holds the reference now
  if (cb.p == nullptr) throw_py_error("generate_stream callback");
  Ref pycfg(build_cfg(cfg));
  PyObject* out = PyObject_CallMethod(static_cast<PyObject*>(py_),
                                      "generate_stream", "sOO",
                                      prompt.c_str(), cb.p, pycfg.p);
  if (ctx.error) {
    Py_XDECREF(out);
    PyErr_Clear();
    std::rethrow_exception(ctx.error);
  }
  return to_string(out, "generate_stream");
}

std::string Model::name() const {
  GIL gil;
  PyObject* n = PyObject_GetAttrString(static_cast<PyObject*>(py_), "name");
  return to_string(n, "name");
}

}  // namespace dp

// ---------------------------------------------------------------------------
// Demo / smoke binary (built with -DDPAPI_MAIN). Loads a preset, runs the
// three generation surfaces, prints DPAPI_OK on success — driven by
// tests/test_native_api.py on the CPU backend.
// ---------------------------------------------------------------------------
#ifdef DPAPI_MAIN
#include <cstdio>
#include <cstdlib>

int main(int argc, char** argv) {
  const char* preset = argc > 1 ? argv[1] : "tiny-llama";
  const char* quantize = argc > 2 ? argv[2] : "";
  const char* platform = std::getenv("DP_PLATFORM");
  const char* root = std::getenv("DP_PACKAGE_ROOT");
  dp::RuntimeOptions opts;
  if (platform != nullptr) opts.platform = platform;
  if (root != nullptr) opts.package_root = root;
  try {
    dp::initialize(opts);
    auto model = dp::Model::from_pretrained(preset, quantize);
    dp::GenerationConfig cfg;
    cfg.max_tokens = 8;
    cfg.temperature = 0.0f;
    cfg.do_sample = false;

    std::string text = model.generate("the cat sat", cfg);
    std::printf("generate: %zu chars\n", text.size());

    auto batch = model.generate_batch({"alpha", "beta"}, cfg);
    std::printf("generate_batch: %zu results\n", batch.size());
    if (batch.size() != 2) return 2;

    size_t deltas = 0;
    std::string streamed = model.generate_stream(
        "gamma", cfg, [&](const std::string& piece) {
          deltas += piece.empty() ? 0 : 1;
          return true;
        });
    std::printf("generate_stream: %zu deltas, %zu chars\n", deltas,
                streamed.size());
    if (deltas == 0 || streamed.empty()) return 3;

    std::printf("model=%s\n", model.name().c_str());
    std::printf("DPAPI_OK\n");
  } catch (const std::exception& e) {
    std::fprintf(stderr, "dpapi error: %s\n", e.what());
    return 1;
  }
  dp::finalize();
  return 0;
}
#endif
