// In-process C++ generation example (reference:
// examples/cpp/text_generation.cpp — same flow, no server round-trip).
//
// Build:
//   make -C ../native api
//   g++ -std=c++17 -I../native cpp_inprocess.cpp \
//       -L../native/build -ldpapi $(python3-config --ldflags --embed) \
//       -Wl,-rpath,$(pwd)/../native/build -o cpp_inprocess
//
// Run (from the repo root so the package resolves):
//   DP_PACKAGE_ROOT=$(pwd) ./examples/cpp_inprocess tinyllama-1.1b int8

#include <cstdio>
#include <cstdlib>
#include <string>

#include "dpapi.hpp"

int main(int argc, char** argv) {
  const std::string model_name = argc > 1 ? argv[1] : "tiny-llama";
  const std::string quantize = argc > 2 ? argv[2] : "";

  dp::RuntimeOptions opts;
  if (const char* root = std::getenv("DP_PACKAGE_ROOT")) {
    opts.package_root = root;
  }
  if (const char* platform = std::getenv("DP_PLATFORM")) {
    opts.platform = platform;  // "cpu" for CI boxes without a TPU
  }

  try {
    dp::initialize(opts);
    auto model = dp::Model::from_pretrained(model_name, quantize);

    dp::GenerationConfig cfg;
    cfg.max_tokens = 48;
    cfg.temperature = 0.7f;
    cfg.top_p = 0.9f;

    // one-shot
    std::printf("== generate ==\n%s\n",
                model.generate("The TPU's MXU is", cfg).c_str());

    // batched: one scheduler pass, continuous batching underneath
    auto outs = model.generate_batch(
        {"int8 weights help because", "KV caches are paged so that"}, cfg);
    std::printf("== batch ==\n");
    for (const auto& o : outs) std::printf("- %s\n", o.c_str());

    // streaming: deltas arrive as the engine decodes
    std::printf("== stream ==\n");
    model.generate_stream("Streaming tokens look like", cfg,
                          [](const std::string& piece) {
                            fwrite(piece.data(), 1, piece.size(), stdout);
                            fflush(stdout);
                            return true;
                          });
    std::printf("\n");
  } catch (const dp::Error& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
  dp::finalize();
  return 0;
}
