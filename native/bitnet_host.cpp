// Host-side ternary codec hot loops (C ABI, loaded via ctypes).
//
// TPU-native equivalent of the reference's native host codec layer
// (bitnet-sys csrc/bitnet_c_shim.cc, bitnet-ggml-ffi csrc/ggml-quants.c,
// and the scalar cores of bitnet-quantization/src/{i2s_qk256.rs,i2s.rs}):
// the GGUF loader and the SafeTensors->GGUF converter spend their time in
// byte-twiddling loops that numpy handles with multiple temporaries; these
// single-pass C++ loops cut model-load repacking time and peak host RSS.
//
// Layouts (must match bitnet_tpu/quant/* and ops/linear.py exactly):
// - QK256 payload: 256 codes / 64 bytes, code j of byte i at bits
//   [2*(j%4)+1 : 2*(j%4)], i = j/4 within the block; LUT {-2,-1,1,2}
//   (reference i2s_qk256.rs:139-144).
// - BitNet32 payload: 32 codes / 10 bytes = 8 packed + f16 scale
//   (reference i2s.rs:27-50).
// - TPU tile interleave ("repack"): for K-tile t (KT=256 logical rows)
//   and in-tile row r = j*(KT/4) + i, code(t*KT + r, n) sits at bits
//   [2j+1:2j] of packed[t*(KT/4) + i, n]  (ops/linear.py).
//
// Build: native/Makefile (g++ -O3 -march=native -shared -fPIC).

#include <cstdint>
#include <cstring>

#define BN_EXPORT extern "C" __attribute__((visibility("default")))

static const int KT = 256;  // K-tile rows (ops/linear.py KT_PACK)

BN_EXPORT int bn_abi_version() { return 2; }

// ---------------------------------------------------------------------------
// QK256: payload <-> codes <-> floats
// ---------------------------------------------------------------------------

// Extract 2-bit codes from a QK256 row payload.
// payload: rows * stride_bytes; stride_bytes = ceil(cols/256)*64.
// out_codes: [rows, cols] row-major uint8 in {0,1,2,3}.
BN_EXPORT void bn_qk256_extract_codes(const uint8_t* payload, int64_t rows,
                                      int64_t cols, uint8_t* out_codes) {
  const int64_t blocks_per_row = (cols + 255) / 256;
  const int64_t stride = blocks_per_row * 64;
  for (int64_t r = 0; r < rows; ++r) {
    const uint8_t* rp = payload + r * stride;
    uint8_t* oc = out_codes + r * cols;
    for (int64_t c = 0; c < cols; ++c) {
      const int64_t b = c >> 8;           // block index
      const int64_t j = c & 255;          // code index within block
      const uint8_t byte = rp[b * 64 + (j >> 2)];
      oc[c] = (byte >> (2 * (j & 3))) & 3;
    }
  }
}

// Dequantize a QK256 payload straight to f32 (LUT {-2,-1,1,2} * scale).
BN_EXPORT void bn_qk256_dequant_f32(const uint8_t* payload, int64_t rows,
                                    int64_t cols, float scale, float* out) {
  static const float LUT[4] = {-2.f, -1.f, 1.f, 2.f};
  const int64_t blocks_per_row = (cols + 255) / 256;
  const int64_t stride = blocks_per_row * 64;
  for (int64_t r = 0; r < rows; ++r) {
    const uint8_t* rp = payload + r * stride;
    float* o = out + r * cols;
    for (int64_t c = 0; c < cols; ++c) {
      const int64_t b = c >> 8;
      const int64_t j = c & 255;
      const uint8_t byte = rp[b * 64 + (j >> 2)];
      o[c] = LUT[(byte >> (2 * (j & 3))) & 3] * scale;
    }
  }
}

// Quantize f32 rows to a QK256 payload.  Matches
// bitnet_tpu/quant/qk256.py quantize_qk256 exactly: d = 1.0, GGML
// thresholds on x (quant/ternary.py ternary_quantize_codes):
//   x < -1.5 -> 0, x < 0 -> 1, x < 1.5 -> 2, else -> 3
// Row padding elements are x = 0.0 -> code 2 (+1), matching numpy.
BN_EXPORT void bn_qk256_quantize(const float* w, int64_t rows, int64_t cols,
                                 uint8_t* payload) {
  const int64_t blocks_per_row = (cols + 255) / 256;
  const int64_t stride = blocks_per_row * 64;
  const int64_t padded_cols = blocks_per_row * 256;
  for (int64_t r = 0; r < rows; ++r) {
    const float* wr = w + r * cols;
    uint8_t* rp = payload + r * stride;
    std::memset(rp, 0, stride);
    for (int64_t c = 0; c < padded_cols; ++c) {
      const float x = c < cols ? wr[c] : 0.0f;
      uint8_t code;
      if (x < -1.5f) code = 0;
      else if (x < 0.0f) code = 1;
      else if (x < 1.5f) code = 2;
      else code = 3;
      rp[(c >> 8) * 64 + ((c & 255) >> 2)] |=
          (uint8_t)(code << (2 * (c & 3)));
    }
  }
}

// ---------------------------------------------------------------------------
// TPU tile-local interleave repack (the model-load hotspot)
// ---------------------------------------------------------------------------

// codes_kn: [K, N] row-major uint8 in {0..3}; out: [Kp/4, N] with
// Kp = ceil(K/KT)*KT; padding rows are code 0.
BN_EXPORT void bn_repack_codes_tpu(const uint8_t* codes_kn, int64_t K,
                                   int64_t N, uint8_t* out) {
  const int64_t ntiles = (K + KT - 1) / KT;
  const int64_t q = KT / 4;  // 64 byte-rows per tile
  std::memset(out, 0, ntiles * q * N);
  for (int64_t t = 0; t < ntiles; ++t) {
    for (int j = 0; j < 4; ++j) {
      const int shift = 2 * j;
      for (int64_t i = 0; i < q; ++i) {
        const int64_t krow = t * KT + (int64_t)j * q + i;
        if (krow >= K) continue;
        const uint8_t* src = codes_kn + krow * N;
        uint8_t* dst = out + (t * q + i) * N;
        for (int64_t n = 0; n < N; ++n) dst[n] |= (uint8_t)(src[n] << shift);
      }
    }
  }
}

// Fused: QK256 payload laid out [N, K] (GGUF row-major = output-major)
// -> transposed codes [K, N] -> TPU interleave, one pass, no [K,N]
// temporary.  payload rows are the N dimension (out features).
BN_EXPORT void bn_qk256_payload_to_tpu(const uint8_t* payload, int64_t n_rows,
                                       int64_t k_cols, uint8_t* out,
                                       int64_t out_cols) {
  // out: [Kp/4, out_cols] (out_cols >= n_rows, lane padding), zeroed here
  const int64_t ntiles = (k_cols + KT - 1) / KT;
  const int64_t q = KT / 4;
  const int64_t blocks_per_row = (k_cols + 255) / 256;
  const int64_t stride = blocks_per_row * 64;
  std::memset(out, 0, ntiles * q * out_cols);
  for (int64_t n = 0; n < n_rows; ++n) {
    const uint8_t* rp = payload + n * stride;
    for (int64_t c = 0; c < k_cols; ++c) {
      const uint8_t byte = rp[(c >> 8) * 64 + ((c & 255) >> 2)];
      const uint8_t code = (byte >> (2 * (c & 3))) & 3;
      const int64_t t = c / KT;
      const int64_t r = c % KT;
      const int64_t j = r / q;
      const int64_t i = r % q;
      out[(t * q + i) * out_cols + n] |= (uint8_t)(code << (2 * j));
    }
  }
}

// Word-layout variants: emit the DEVICE storage [Kp/16, N] int32 words
// directly (word s packs byte rows 4s..4s+3 little-endian, see
// ops/linear.py fold_packed_words) so the numpy fold stage — the 2B-model
// load hotspot, ~100 s of strided astype/or passes — collapses into the
// single repack pass.
BN_EXPORT void bn_repack_codes_tpu_words(const uint8_t* codes_kn, int64_t K,
                                         int64_t N, uint32_t* out) {
  const int64_t ntiles = (K + KT - 1) / KT;
  const int64_t q = KT / 4;        // 64 byte-rows per tile
  const int64_t w = KT / 16;       // 16 word-rows per tile
  std::memset(out, 0, (size_t)(ntiles * w * N) * 4);
  for (int64_t t = 0; t < ntiles; ++t) {
    for (int j = 0; j < 4; ++j) {
      for (int64_t i = 0; i < q; ++i) {
        const int64_t krow = t * KT + (int64_t)j * q + i;
        if (krow >= K) continue;
        // byte row t*q + i -> word row t*w + i/4, byte slot i%4
        const int shift = 2 * j + 8 * (int)(i & 3);
        const uint8_t* src = codes_kn + krow * N;
        uint32_t* dst = out + (t * w + (i >> 2)) * N;
        for (int64_t n = 0; n < N; ++n)
          dst[n] |= ((uint32_t)src[n]) << shift;
      }
    }
  }
}

// Transposed-input variant: codes arrive [N, K] row-major (GGUF's
// output-major order) and the transpose happens inside the pass — the
// numpy `.T.copy()` a 2B bitnet32/TL load otherwise pays (~10 s strided
// copy on one core) disappears.  Four K-consecutive codes (k0 % 4 == 0)
// share plane j and word row, at byte slots 0..3: one 4-byte load
// & 0x03030303 builds the word contribution directly.
BN_EXPORT void bn_repack_codes_tpu_words_t(const uint8_t* codes_nk,
                                           int64_t K, int64_t N,
                                           uint32_t* out) {
  const int64_t ntiles = (K + KT - 1) / KT;
  const int64_t w = KT / 16;
  std::memset(out, 0, (size_t)(ntiles * w * N) * 4);
  const int64_t k4 = K & ~(int64_t)3;
  for (int64_t n = 0; n < N; ++n) {
    const uint8_t* row = codes_nk + n * K;
    for (int64_t k0 = 0; k0 < k4; k0 += 4) {
      uint32_t quad;
      std::memcpy(&quad, row + k0, 4);
      const int64_t t = k0 / KT, r = k0 % KT;
      const int64_t j = r / 64, i = r % 64;
      out[(t * w + (i >> 2)) * N + n] |= (quad & 0x03030303u) << (2 * j);
    }
    for (int64_t k = k4; k < K; ++k) {          // K % 4 tail
      const int64_t t = k / KT, r = k % KT;
      const int64_t j = r / 64, i = r % 64;
      out[(t * w + (i >> 2)) * N + n] |=
          ((uint32_t)(row[k] & 3)) << (2 * j + 8 * (i & 3));
    }
  }
}

// Fused QK256 payload ([N, K] output-major, GGUF storage) -> transposed
// -> TPU interleave -> int32 words, one pass, no [K, N] codes temporary.
//
// A payload byte holds 4 consecutive codes c0..c0+3 (c0 % 4 == 0); they
// share one bit plane (j = (c0%256)/64) and land in ONE output word at
// byte slots 0..3 — so a 256-entry "spread" LUT turns the per-code loop
// (~6 ops/code) into ~3 ops/BYTE: out_word |= SPREAD[byte] << 2j.
static uint32_t bn_spread_lut(uint8_t b) {
  return (uint32_t)(b & 3) | ((uint32_t)((b >> 2) & 3) << 8) |
         ((uint32_t)((b >> 4) & 3) << 16) | ((uint32_t)((b >> 6) & 3) << 24);
}

BN_EXPORT void bn_qk256_payload_to_tpu_words(const uint8_t* payload,
                                             int64_t n_rows, int64_t k_cols,
                                             uint32_t* out,
                                             int64_t out_cols) {
  static uint32_t SPREAD[256];
  static bool init = false;
  if (!init) {
    for (int b = 0; b < 256; ++b) SPREAD[b] = bn_spread_lut((uint8_t)b);
    init = true;
  }
  const int64_t ntiles = (k_cols + KT - 1) / KT;  // 1 tile == 1 QK256 block
  const int64_t w = KT / 16;
  const int64_t full_tiles = k_cols / KT;
  const int64_t stride = ntiles * 64;
  std::memset(out, 0, (size_t)(ntiles * w * out_cols) * 4);
  for (int64_t n = 0; n < n_rows; ++n) {
    const uint8_t* rp = payload + n * stride;
    for (int64_t t = 0; t < full_tiles; ++t) {
      const uint8_t* bp = rp + t * 64;
      uint32_t* op = out + t * w * out_cols + n;
      // byte bi covers codes 4bi..4bi+3: plane j = bi/16, word row bi%16
      for (int bi = 0; bi < 64; ++bi)
        op[(bi & 15) * out_cols] |= SPREAD[bp[bi]] << (2 * (bi >> 4));
    }
    // tail block (k_cols % 256 != 0): per-code, masking pad codes so
    // padded K rows keep code 0 exactly like the codes route
    for (int64_t c = full_tiles * KT; c < k_cols; ++c) {
      const uint8_t byte = rp[(c >> 8) * 64 + ((c & 255) >> 2)];
      const uint32_t code = (byte >> (2 * (c & 3))) & 3;
      const int64_t r = c % KT;
      const int64_t j = r / 64;    // bit plane
      const int64_t i = r % 64;    // byte row within tile
      out[((c / KT) * w + (i >> 2)) * out_cols + n] |=
          code << (2 * j + 8 * (i & 3));
    }
  }
}

// ---------------------------------------------------------------------------
// BitNet32 (I2_S 32/10B): payload -> codes + f16 scales
// ---------------------------------------------------------------------------
static inline float f16_to_f32(uint16_t h) {
  const uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(man & 0x400)) { man <<= 1; --exp; }
      man &= 0x3FF;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

// payload: nblocks * 10 bytes (8 packed LSB-first + f16 scale).
// out_codes: [nblocks*32] uint8; out_scales: [nblocks] f32.
BN_EXPORT void bn_bitnet32_extract(const uint8_t* payload, int64_t nblocks,
                                   uint8_t* out_codes, float* out_scales) {
  for (int64_t b = 0; b < nblocks; ++b) {
    const uint8_t* bp = payload + b * 10;
    uint8_t* oc = out_codes + b * 32;
    for (int i = 0; i < 8; ++i) {
      const uint8_t byte = bp[i];
      oc[i * 4 + 0] = byte & 3;
      oc[i * 4 + 1] = (byte >> 2) & 3;
      oc[i * 4 + 2] = (byte >> 4) & 3;
      oc[i * 4 + 3] = (byte >> 6) & 3;
    }
    uint16_t h;
    std::memcpy(&h, bp + 8, 2);
    out_scales[b] = f16_to_f32(h);
  }
}
