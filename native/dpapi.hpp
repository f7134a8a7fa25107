// deeppowers-tpu in-process C++ API.
//
// Mirrors the reference's in-process C++ surface (reference:
// src/api/cpp/include/deeppowers.hpp:17-76 — GenerationConfig with
// max_tokens/temperature/top_k/top_p, api::Model::{generate,
// generate_batch, generate_stream}) but drives the TPU-native JAX engine by
// embedding CPython: the hot path (compiled XLA executables, Pallas
// kernels, on-device sampling) is identical to the Python API's — the
// interpreter only brokers strings in and out, which is noise next to a
// forward pass.
//
// Thread-safety: every call acquires the GIL (PyGILState_Ensure), so a
// Model may be shared across C++ threads; calls serialize on the GIL the
// same way the reference's api::Model serialized on its per-model mutex
// (reference: deeppowers.cpp:26-47).
//
// Usage:
//   dp::initialize({.platform = "cpu"});          // or "" = default (TPU)
//   auto m = dp::Model::from_pretrained("tiny-llama");
//   std::string out = m.generate("hello", {.max_tokens = 16});
//   dp::finalize();
#pragma once

#include <functional>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace dp {

struct RuntimeOptions {
  // "cpu" forces the XLA:CPU backend (tests); "" keeps the default
  // platform resolution (TPU when present). Applied via jax.config — the
  // env var is unreliable with out-of-tree TPU plugins.
  std::string platform;
  // Repo/package root to prepend to sys.path; "" = rely on the interpreter's
  // installed packages.
  std::string package_root;
};

// Start the embedded interpreter (idempotent; safe if the process already
// hosts Python — then only the sys.path/platform setup runs).
void initialize(const RuntimeOptions& opts = {});
// Tear down the interpreter IF this library started it. No-op otherwise.
void finalize();

struct GenerationConfig {
  int max_tokens = 100;     // reference deeppowers.hpp:19 (default 100)
  float temperature = 0.7f; // reference deeppowers.hpp:20
  int top_k = 50;
  float top_p = 0.9f;
  bool do_sample = true;
  long seed = -1;           // <0: nondeterministic per-request stream
  std::vector<std::string> stop;
};

struct Error : std::runtime_error {
  using std::runtime_error::runtime_error;
};

class Model {
 public:
  // path_or_preset: HF checkpoint dir, our checkpoint dir, or a preset name
  // ("gpt2", "tiny-llama", ...). quantize: "" | "int8" | "int4" (int4 is
  // group-128, the serving default).
  static Model from_pretrained(const std::string& path_or_preset,
                               const std::string& quantize = "");

  std::string generate(const std::string& prompt,
                       const GenerationConfig& cfg = {}) const;
  std::vector<std::string> generate_batch(
      const std::vector<std::string>& prompts,
      const GenerationConfig& cfg = {}) const;
  // on_text receives each decoded text delta; return false to cancel.
  // Returns the full text.
  std::string generate_stream(
      const std::string& prompt, const GenerationConfig& cfg,
      const std::function<bool(const std::string&)>& on_text) const;

  std::string name() const;

  Model(Model&&) noexcept;
  Model& operator=(Model&&) noexcept;
  Model(const Model&) = delete;
  Model& operator=(const Model&) = delete;
  ~Model();

 private:
  explicit Model(void* py_model);
  void* py_;  // owned PyObject* (deeppowers_tpu.Model)
};

}  // namespace dp
