// biom3_tpu native host library: batched protein tokenization.
//
// The reference's data path tokenizes proteins in Python per item
// (Stage1_source/preprocess.py:63-105 via fair-esm's batch_converter;
// Stage3_source/preprocess.py:58-125 via per-char dict lookups) — at
// 1k-prompt-sweep scale that Python loop becomes the input bottleneck
// (SURVEY.md hard-part #5).  This library does the same transformations as
// tight C++ loops over contiguous buffers, exposed through a C ABI consumed
// via ctypes (biom3_tpu/native.py), with the pure-Python tokenizers as the
// behavioral reference and fallback.
//
// Vocabulary tables mirror biom3_tpu/tokenizers exactly:
//   * ESM2 alphabet (33 tokens): <cls>=0 <pad>=1 <eos>=2 <unk>=3, residues
//     from index 4, '-'=30, <mask>=32.
//   * Stage-3 training vocab (28 tokens): <START>=0, A..Y, <END>=21, '-'=22,
//     X U Z B O = 23..27; +1 shift applied by the caller.

#include <cstdint>
#include <cstring>

namespace {

// ESM2: index of each residue character in the alphabet (A..Z subset); -1 →
// <unk>.  Order from fair-esm's proteinseq_toks (see esm_alphabet.py).
int esm_lut[256];
int stage3_lut[256];

struct LutInit {
  LutInit() {
    for (int i = 0; i < 256; ++i) { esm_lut[i] = 3; stage3_lut[i] = -1; }
    const char* esm_order = "LAGVSERTIDPKQNFYMHWCXBUZO.-";
    for (int i = 0; esm_order[i]; ++i)
      esm_lut[(unsigned char)esm_order[i]] = 4 + i;
    const char* s3_order = "ACDEFGHIKLMNPQRSTVWY";  // train ids 1..20
    for (int i = 0; s3_order[i]; ++i)
      stage3_lut[(unsigned char)s3_order[i]] = 1 + i;
    stage3_lut[(unsigned char)'-'] = 22;
    const char* rare = "XUZBO";  // train ids 23..27
    for (int i = 0; rare[i]; ++i)
      stage3_lut[(unsigned char)rare[i]] = 23 + i;
  }
} lut_init;

}  // namespace

extern "C" {

// Tokenize n_seqs protein strings (concatenated in `data`, seq i spanning
// [offsets[i], offsets[i+1])) into ESM tokens: <cls> seq <eos>, right-padded
// with <pad>=1 to `width` columns.  Returns 0 on success, -(i+1) if sequence
// i does not fit.
int32_t esm_batch_encode(const char* data, const int64_t* offsets,
                         int32_t n_seqs, int32_t width, int32_t* out) {
  for (int32_t i = 0; i < n_seqs; ++i) {
    const int64_t start = offsets[i], end = offsets[i + 1];
    const int64_t len = end - start;
    if (len + 2 > width) return -(i + 1);
    int32_t* row = out + (int64_t)i * width;
    row[0] = 0;  // <cls>
    for (int64_t j = 0; j < len; ++j)
      row[1 + j] = esm_lut[(unsigned char)data[start + j]];
    row[1 + len] = 2;  // <eos>
    for (int64_t j = len + 2; j < width; ++j) row[j] = 1;  // <pad>
    (void)lut_init;
  }
  return 0;
}

// Stage-3 training-vocab encode: '<START>' seq '<END>', '-'-padded to
// `width`; gap characters in the input are skipped (the reference strips
// them before wrapping).  Returns 0, -(i+1) if sequence i does not fit, or
// +(i+1) if it contains a character outside the vocabulary.
int32_t stage3_batch_encode(const char* data, const int64_t* offsets,
                            int32_t n_seqs, int32_t width, int32_t* out) {
  for (int32_t i = 0; i < n_seqs; ++i) {
    const int64_t start = offsets[i], end = offsets[i + 1];
    int32_t* row = out + (int64_t)i * width;
    int64_t w = 0;
    row[w++] = 0;  // <START>
    for (int64_t j = start; j < end; ++j) {
      const unsigned char c = (unsigned char)data[j];
      if (c == '-') continue;  // strip gaps
      const int id = stage3_lut[c];
      if (id < 0) return i + 1;
      if (w >= width - 1) return -(i + 1);
      row[w++] = id;
    }
    if (w >= width) return -(i + 1);
    row[w++] = 21;  // <END>
    for (; w < width; ++w) row[w] = 22;  // '-' pad
  }
  return 0;
}

// Decode shifted (decode-table) ids back to residue characters: one char
// per position, with <START>→'[', <END>→']', <PAD>→'.', absorbing→'*'
// (compact single-char form; the full multi-char decode lives in Python).
void stage3_compact_decode(const int32_t* ids, int32_t n, char* out) {
  static const char table[29 + 1] = "*[ACDEFGHIKLMNPQRSTVWY].XUZBO";
  for (int32_t i = 0; i < n; ++i) {
    const int32_t id = ids[i];
    out[i] = (id >= 0 && id < 29) ? table[id] : '?';
  }
}

int32_t biom3_native_abi_version(void) { return 1; }

}  // extern "C"
