/* Standalone C integration smoke test for the bitnet_tpu C ABI.
 *
 * Parity with the reference's tests/c_integration_test.c
 * (crates/bitnet-ffi/tests/): load a GGUF model from plain C, run greedy
 * inference, print the text.  Usage: c_smoke <repo_path> <gguf_path>
 */
#include <stdio.h>

extern const char* bitnet_version(void);
extern const char* bitnet_last_error(void);
extern int bitnet_init(const char* repo_path);
extern int bitnet_model_load(const char* gguf_path, int max_seq_len);
extern int bitnet_inference(int handle, const char* prompt, char* out,
                            int out_len);
extern int bitnet_inference_grammar(int handle, const char* prompt,
                                    const char* grammar, char* out,
                                    int out_len, int max_new_tokens,
                                    float temperature, int seed,
                                    int greedy);
extern int bitnet_model_free(int handle);
extern int bitnet_cleanup(void);

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <repo_path> <gguf_path>\n", argv[0]);
    return 2;
  }
  printf("version: %s\n", bitnet_version());
  if (bitnet_init(argv[1]) != 0) {
    fprintf(stderr, "init failed: %s\n", bitnet_last_error());
    return 1;
  }
  int h = bitnet_model_load(argv[2], 128);
  if (h <= 0) {
    fprintf(stderr, "load failed: %s\n", bitnet_last_error());
    return 1;
  }
  char out[4096];
  int n = bitnet_inference(h, "hello", out, sizeof out);
  if (n < 0) {
    fprintf(stderr, "inference failed: %s\n", bitnet_last_error());
    return 1;
  }
  printf("generated %d tokens: %s\n", n, out);
  /* grammar-constrained: output must be exactly "yes" or "no" */
  n = bitnet_inference_grammar(h, "hello",
                               "root ::= \"yes\" | \"no\"", out,
                               sizeof out, 8, 0.0f, 0, 1);
  if (n < 0) {
    fprintf(stderr, "grammar inference failed: %s\n", bitnet_last_error());
    return 1;
  }
  printf("grammar output: %s\n", out);
  if (!((out[0] == 'y' && out[1] == 'e' && out[2] == 's' && !out[3]) ||
        (out[0] == 'n' && out[1] == 'o' && !out[2]))) {
    fprintf(stderr, "grammar output violates grammar: '%s'\n", out);
    return 1;
  }
  /* malformed grammar must fail cleanly, not crash */
  if (bitnet_inference_grammar(h, "x", "root ::", out, sizeof out, 4,
                               0.0f, 0, 1) >= 0) {
    fprintf(stderr, "malformed grammar unexpectedly succeeded\n");
    return 1;
  }
  printf("malformed grammar rejected: %s\n", bitnet_last_error());
  bitnet_model_free(h);
  bitnet_cleanup();
  printf("C_SMOKE_OK\n");
  return 0;
}
