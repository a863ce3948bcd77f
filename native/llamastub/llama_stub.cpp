// llamastub: a minimal llama.cpp-API-compatible library backed by the
// in-repo independent C++ golden (native/bitnet_golden.cpp).
//
// Purpose: in this zero-egress environment no real llama.cpp/bitnet.cpp
// checkout exists, so the external-crossval leg (BITNET_CPP_DIR +
// native/cpp_shim/bitnet_eval_shim.cpp, mirroring the reference's
// crossval/src/cpp_bindings.rs:438 eval_bitnet) was compile-stub-tested
// only.  This library makes the WHOLE leg executable: the shim binary
// links against libllama.so exactly as it would against a real build,
// loads the GGUF through this C API, and emits real per-position logits.
// Swap in an actual llama.cpp build dir and nothing else changes.
//
// Build: make -C native llamastub   (produces build/llamastub/libllama.so
// + build/llamastub/bitnet-eval-shim; point BITNET_CPP_DIR at it).

#define BITNET_GOLDEN_NO_MAIN
#include "../bitnet_golden.cpp"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstring>
#include <new>

#include "llama.h"

struct llama_model {
    Gguf gguf;
    Model model;
    void* map_addr = nullptr;
    size_t map_size = 0;
};

struct llama_vocab {
    int32_t n_tokens;
};

struct llama_context {
    const llama_model* model;
    std::vector<float> logits;   // [n_decoded, V] row-major
    int32_t n_decoded = 0;
};

extern "C" {

void llama_backend_init(void) {}
void llama_backend_free(void) {}

llama_model_params llama_model_default_params(void) {
    return llama_model_params{0, 1};
}

llama_context_params llama_context_default_params(void) {
    return llama_context_params{4096, 512};
}

llama_model* llama_model_load_from_file(const char* path,
                                        llama_model_params) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
    void* buf = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE,
                     fd, 0);
    close(fd);
    if (buf == MAP_FAILED) return nullptr;
    auto* m = new (std::nothrow) llama_model();
    if (!m) { munmap(buf, (size_t)st.st_size); return nullptr; }
    m->map_addr = buf;
    m->map_size = (size_t)st.st_size;
    // Gguf::parse/load_model die() on malformed input — acceptable for
    // a crossval harness (the caller sees a nonzero exit)
    m->gguf.parse(reinterpret_cast<const uint8_t*>(buf), m->map_size);
    m->model = load_model(m->gguf);
    return m;
}

void llama_model_free(llama_model* model) {
    if (!model) return;
    if (model->map_addr) munmap(model->map_addr, model->map_size);
    delete model;
}

llama_context* llama_init_from_model(llama_model* model,
                                     llama_context_params) {
    if (!model) return nullptr;
    auto* ctx = new (std::nothrow) llama_context();
    if (ctx) ctx->model = model;
    return ctx;
}

void llama_free(llama_context* ctx) { delete ctx; }

const llama_vocab* llama_model_get_vocab(const llama_model* model) {
    // vocab handle == model (n_tokens read through the model)
    static thread_local llama_vocab v;
    v.n_tokens = model ? model->model.V : 0;
    return &v;
}

int32_t llama_vocab_n_tokens(const llama_vocab* vocab) {
    return vocab ? vocab->n_tokens : 0;
}

llama_batch llama_batch_init(int32_t n_tokens, int32_t /*embd*/,
                             int32_t n_seq_max) {
    llama_batch b{};
    b.token = new llama_token[n_tokens]();
    b.pos = new llama_pos[n_tokens]();
    b.n_seq_id = new int32_t[n_tokens]();
    b.seq_id = new llama_seq_id*[n_tokens];
    for (int32_t i = 0; i < n_tokens; ++i)
        b.seq_id[i] = new llama_seq_id[n_seq_max]();
    b.logits = new int8_t[n_tokens]();
    b.n_tokens = 0;
    return b;
}

void llama_batch_free(llama_batch batch) {
    // n_tokens may have been overwritten by the caller; seq_id rows were
    // allocated for the INIT n_tokens — freeing what's reachable is the
    // same contract llama.cpp documents (free after use, sizes match)
    delete[] batch.token;
    delete[] batch.pos;
    delete[] batch.n_seq_id;
    if (batch.seq_id) {
        for (int32_t i = 0; i < batch.n_tokens; ++i)
            delete[] batch.seq_id[i];
        delete[] batch.seq_id;
    }
    delete[] batch.logits;
}

int32_t llama_decode(llama_context* ctx, llama_batch batch) {
    if (!ctx || !ctx->model || batch.n_tokens <= 0) return 1;
    std::vector<int> toks(batch.n_tokens);
    for (int32_t i = 0; i < batch.n_tokens; ++i) {
        int t = (int)batch.token[i];
        if (t < 0 || t >= ctx->model->model.V) return 1;
        toks[(size_t)batch.pos[i]] = t;
    }
    // the golden forward computes logits at EVERY position, which is
    // exactly the batch.logits[i]=1 contract the shim requests
    ctx->logits = forward(ctx->model->model, toks);
    ctx->n_decoded = batch.n_tokens;
    return 0;
}

float* llama_get_logits(llama_context* ctx) {
    return ctx && !ctx->logits.empty() ? ctx->logits.data() : nullptr;
}

float* llama_get_logits_ith(llama_context* ctx, int32_t i) {
    if (!ctx || i < 0 || i >= ctx->n_decoded) return nullptr;
    return ctx->logits.data() + (size_t)i * ctx->model->model.V;
}

}  // extern "C"
