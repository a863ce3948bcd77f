// bitnet-eval-shim: dump per-position logits from a bitnet.cpp/llama.cpp
// build — the external-reference half of the crossval gate.
//
// llama.cpp ships no CLI that emits raw per-position logits; the reference
// repo drives the C API through its own shim
// (/root/reference/crates/bitnet-sys/csrc/bitnet_c_shim.cc, eval_bitnet at
// crossval/src/cpp_bindings.rs:438).  This is our equivalent, written
// against the llama.h C API (llama_decode + llama_get_logits with
// logits-for-all-positions enabled).
//
// Build (inside the external build dir, pointed to by BITNET_CPP_DIR):
//   g++ -O2 -std=c++17 -I<llama.cpp>/include -I<llama.cpp>/ggml/include \
//       bitnet_eval_shim.cpp -o bitnet-eval-shim \
//       -L$BITNET_CPP_DIR -lllama -Wl,-rpath,$BITNET_CPP_DIR
//
// CLI contract (bitnet_tpu/verify/crossval.py eval_cpp_logits):
//   bitnet-eval-shim -m MODEL.gguf --tokens 1,2,3 --out logits.bin
// writes T * n_vocab float32 little-endian to --out.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "llama.h"

static void die(const char* msg) {
  std::fprintf(stderr, "bitnet-eval-shim: %s\n", msg);
  std::exit(1);
}

int main(int argc, char** argv) {
  std::string model_path, tokens_csv, out_path;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) die("missing arg value");
      return argv[++i];
    };
    if (a == "-m" || a == "--model") model_path = next();
    else if (a == "--tokens") tokens_csv = next();
    else if (a == "--out" || a == "-o") out_path = next();
    else die("unknown argument");
  }
  if (model_path.empty() || tokens_csv.empty() || out_path.empty())
    die("usage: bitnet-eval-shim -m M.gguf --tokens 1,2,3 --out L.bin");

  std::vector<llama_token> toks;
  for (const char* s = tokens_csv.c_str(); *s;) {
    char* end;
    long v = std::strtol(s, &end, 10);
    if (end == s) die("bad --tokens");
    toks.push_back((llama_token)v);
    s = (*end == ',') ? end + 1 : end;
  }
  if (toks.empty()) die("no tokens");

  llama_backend_init();
  llama_model_params mp = llama_model_default_params();
  llama_model* model = llama_model_load_from_file(model_path.c_str(), mp);
  if (!model) die("model load failed");

  llama_context_params cp = llama_context_default_params();
  cp.n_ctx = (uint32_t)(toks.size() + 8);
  cp.n_batch = (uint32_t)toks.size();
  llama_context* ctx = llama_init_from_model(model, cp);
  if (!ctx) die("context init failed");

  llama_batch batch = llama_batch_init((int32_t)toks.size(), 0, 1);
  for (size_t i = 0; i < toks.size(); ++i) {
    batch.token[i] = toks[i];
    batch.pos[i] = (llama_pos)i;
    batch.n_seq_id[i] = 1;
    batch.seq_id[i][0] = 0;
    batch.logits[i] = 1;  // logits at EVERY position (per-token crossval)
  }
  batch.n_tokens = (int32_t)toks.size();
  if (llama_decode(ctx, batch) != 0) die("decode failed");

  const llama_vocab* vocab = llama_model_get_vocab(model);
  const int n_vocab = llama_vocab_n_tokens(vocab);
  FILE* f = std::fopen(out_path.c_str(), "wb");
  if (!f) die("cannot open --out");
  for (size_t i = 0; i < toks.size(); ++i) {
    const float* lg = llama_get_logits_ith(ctx, (int32_t)i);
    if (!lg) die("null logits");
    std::fwrite(lg, sizeof(float), (size_t)n_vocab, f);
  }
  std::fclose(f);

  llama_batch_free(batch);
  llama_free(ctx);
  llama_model_free(model);
  llama_backend_free();
  std::fprintf(stderr, "bitnet-eval-shim: %zu x %d logits -> %s\n",
               toks.size(), n_vocab, out_path.c_str());
  return 0;
}
