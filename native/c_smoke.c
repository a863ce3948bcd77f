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
  bitnet_model_free(h);
  bitnet_cleanup();
  printf("C_SMOKE_OK\n");
  return 0;
}
