// Native data-loading runtime: char tokenizer + random-crop batch sampler.
//
// TPU-framework analog of the reference's native layer mechanics: the
// reference ships a C++ .so loaded via ctypes at import
// (/root/reference/flash_attention_ipu/__init__.py:4-23); its demo feeds
// training with torch.frombuffer random crops (demo/train.py:175-188) and a
// char tokenizer built from meta.pkl (demo/train.py:80-106).  Here those
// host-side runtime pieces are native C++ (the TPU compute path stays
// JAX/Pallas): vocabulary construction, corpus encoding, and an O(1)-alloc
// batch sampler with a SplitMix64/xorshift PRNG for reproducible crops.
//
// C ABI only — consumed through ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>

extern "C" {

// Build a sorted byte-vocabulary from `text`.  vocab_out must hold 256
// entries.  Returns vocab size.
int fat_build_vocab(const uint8_t* text, uint64_t n, uint8_t* vocab_out) {
  bool seen[256] = {false};
  for (uint64_t i = 0; i < n; ++i) seen[text[i]] = true;
  int vs = 0;
  for (int c = 0; c < 256; ++c) {
    if (seen[c]) vocab_out[vs++] = static_cast<uint8_t>(c);
  }
  return vs;
}

// Encode text as token ids under the given vocab (sorted bytes).  Unknown
// bytes map to 0.  out must hold n uint16 entries.
void fat_encode(const uint8_t* text, uint64_t n, const uint8_t* vocab,
                int vocab_size, uint16_t* out) {
  uint16_t lut[256];
  std::memset(lut, 0, sizeof(lut));
  for (int i = 0; i < vocab_size; ++i) lut[vocab[i]] = static_cast<uint16_t>(i);
  for (uint64_t i = 0; i < n; ++i) out[i] = lut[text[i]];
}

// Decode token ids back to bytes.
void fat_decode(const uint16_t* ids, uint64_t n, const uint8_t* vocab,
                int vocab_size, uint8_t* out) {
  for (uint64_t i = 0; i < n; ++i) {
    uint16_t t = ids[i];
    out[i] = t < vocab_size ? vocab[t] : vocab[0];
  }
}

namespace {
// SplitMix64: tiny, high-quality, seedable PRNG for reproducible crops.
inline uint64_t splitmix64(uint64_t* state) {
  uint64_t z = (*state += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}
}  // namespace

// Sample `batch` random crops of length block+1 from data[0..n): x gets
// tokens [s, s+block), y gets [s+1, s+block+1) — the next-token targets
// (reference get_batch, demo/train.py:175-188).  Deterministic in `seed`.
void fat_sample_batch(const uint16_t* data, uint64_t n, uint64_t seed,
                      int batch, int block, uint16_t* x_out, uint16_t* y_out) {
  // Need at least block+1 tokens for one (x, y) crop; the Python wrapper
  // validates and raises, this guard only prevents UB on misuse (an
  // unsigned underflow here would index ~2^64 and segfault).
  if (n < static_cast<uint64_t>(block) + 1) return;
  uint64_t state = seed ^ 0xdeadbeefcafef00dULL;
  const uint64_t max_start = n - static_cast<uint64_t>(block) - 1;
  for (int b = 0; b < batch; ++b) {
    uint64_t s = splitmix64(&state) % (max_start + 1);
    std::memcpy(x_out + static_cast<uint64_t>(b) * block, data + s,
                sizeof(uint16_t) * block);
    std::memcpy(y_out + static_cast<uint64_t>(b) * block, data + s + 1,
                sizeof(uint16_t) * block);
  }
}

// Version probe so the Python side can sanity-check the ABI.
int fat_dataloader_abi_version() { return 1; }

}  // extern "C"
