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
#include <string>
#include <unordered_map>
#include <vector>

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

}  // extern "C"

// ---------------------------------------------------------------------------
// BERT wordpiece tokenizer — ASCII fast path.
//
// The reference tokenizes captions with HF AutoTokenizer over the
// PubMedBERT-uncased vocab (Stage1_source/preprocess.py:45-61).  The pure-
// Python twin (tokenizers/wordpiece.py) is the behavioral reference; this
// C++ path handles ASCII-only captions (the Python wrapper routes any text
// with non-ASCII codepoints back to Python, where the unicode-aware passes
// live) with the identical algorithm: specials split → clean/whitespace →
// lowercase → punctuation split → greedy longest-match wordpiece.
// ---------------------------------------------------------------------------

namespace {

struct WordPiece {
  // pieces without "##" / with "##" stripped, mapped to vocab ids
  std::unordered_map<std::string, int32_t> head, cont;
  size_t max_head = 0, max_cont = 0;
  int32_t pad = -1, unk = -1, cls = -1, sep = -1, mask = -1;
  bool do_lower_case = true;
  // the five special literals, in the Python twin's fixed split order
  std::vector<std::pair<std::string, int32_t>> specials;
};

inline bool ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}
inline bool ascii_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}
inline bool ascii_control(unsigned char c) {
  // ASCII Cc minus \t\n\r (which _clean maps to space) plus DEL
  return (c < 32 && c != '\t' && c != '\n' && c != '\r') || c == 127;
}

// greedy longest-match over one cleaned word; appends piece ids
void wordpiece_word(const WordPiece& wp, const char* w, size_t n,
                    std::vector<int32_t>& out) {
  if (n > 100) {  // HF max_input_chars_per_word
    out.push_back(wp.unk);
    return;
  }
  const size_t mark = out.size();
  size_t start = 0;
  std::string sub;
  while (start < n) {
    const auto& table = start == 0 ? wp.head : wp.cont;
    const size_t cap = start == 0 ? wp.max_head : wp.max_cont;
    size_t end = n;
    if (end - start > cap) end = start + cap;
    int32_t id = -1;
    for (; end > start; --end) {
      sub.assign(w + start, end - start);
      auto it = table.find(sub);
      if (it != table.end()) { id = it->second; break; }
    }
    if (id < 0) {  // no match → whole word becomes [UNK]
      out.resize(mark);
      out.push_back(wp.unk);
      return;
    }
    out.push_back(id);
    start = end;
  }
}

// basic+wordpiece over one non-special segment (ASCII bytes)
void encode_segment(const WordPiece& wp, const char* s, size_t n,
                    std::vector<int32_t>& out) {
  std::vector<char> word;
  auto flush = [&]() {
    if (!word.empty()) {
      wordpiece_word(wp, word.data(), word.size(), out);
      word.clear();
    }
  };
  for (size_t i = 0; i < n; ++i) {
    unsigned char c = (unsigned char)s[i];
    if (ascii_control(c)) continue;              // _clean drops it
    if (ascii_space(c)) { flush(); continue; }   // token boundary
    if (ascii_punct(c)) {                        // punct = its own token
      flush();
      char p = (char)c;
      wordpiece_word(wp, &p, 1, out);
      continue;
    }
    if (wp.do_lower_case && c >= 'A' && c <= 'Z') c += 32;
    word.push_back((char)c);
  }
  flush();
}

}  // namespace

extern "C" {

// Build a tokenizer from a packed vocab (token i spans
// [offsets[i], offsets[i+1]) in `vocab_data`; id = i).  Non-ASCII vocab
// entries are skipped (they cannot match ASCII text).  Returns nullptr if
// any of the five special tokens is missing.
void* wordpiece_create(const char* vocab_data, const int64_t* offsets,
                       int32_t n_tokens, int32_t do_lower_case) {
  auto* wp = new WordPiece;
  wp->do_lower_case = do_lower_case != 0;
  for (int32_t i = 0; i < n_tokens; ++i) {
    std::string tok(vocab_data + offsets[i],
                    (size_t)(offsets[i + 1] - offsets[i]));
    if (tok == "[PAD]") { wp->pad = i; continue; }
    if (tok == "[UNK]") { wp->unk = i; continue; }
    if (tok == "[CLS]") { wp->cls = i; continue; }
    if (tok == "[SEP]") { wp->sep = i; continue; }
    if (tok == "[MASK]") { wp->mask = i; continue; }
    bool ascii = true;
    for (unsigned char c : tok) ascii &= c < 128;
    if (!ascii) continue;
    if (tok.size() > 2 && tok[0] == '#' && tok[1] == '#') {
      std::string body = tok.substr(2);
      wp->cont.emplace(body, i);
      if (body.size() > wp->max_cont) wp->max_cont = body.size();
    } else if (!tok.empty()) {
      wp->head.emplace(tok, i);
      if (tok.size() > wp->max_head) wp->max_head = tok.size();
    }
  }
  if (wp->pad < 0 || wp->unk < 0 || wp->cls < 0 || wp->sep < 0 ||
      wp->mask < 0) {
    delete wp;
    return nullptr;
  }
  wp->specials = {{"[PAD]", wp->pad}, {"[UNK]", wp->unk},
                  {"[CLS]", wp->cls}, {"[SEP]", wp->sep},
                  {"[MASK]", wp->mask}};
  return wp;
}

void wordpiece_destroy(void* handle) {
  delete static_cast<WordPiece*>(handle);
}

// Encode n_texts ASCII captions (text i spans [offsets[i], offsets[i+1]))
// as [CLS] pieces[:max_length-2] [SEP], [PAD]-padded to max_length, with
// the attention mask alongside.  Returns 0 on success.
int32_t wordpiece_batch_encode(void* handle, const char* data,
                               const int64_t* offsets, int32_t n_texts,
                               int32_t max_length, int32_t* out_ids,
                               int32_t* out_mask) {
  const auto& wp = *static_cast<WordPiece*>(handle);
  std::vector<int32_t> ids;
  for (int32_t i = 0; i < n_texts; ++i) {
    const char* s = data + offsets[i];
    const size_t n = (size_t)(offsets[i + 1] - offsets[i]);
    ids.clear();
    // split out special-token literals anywhere in the text (the Python
    // twin's _split_specials; the five literals never overlap, so one
    // left-to-right scan over all specials at once is equivalent)
    size_t pos = 0, seg_start = 0;
    while (pos < n) {
      bool hit = false;
      for (const auto& sp : wp.specials) {
        const std::string& lit = sp.first;
        if (lit.size() <= n - pos &&
            std::memcmp(s + pos, lit.data(), lit.size()) == 0) {
          encode_segment(wp, s + seg_start, pos - seg_start, ids);
          ids.push_back(sp.second);
          pos += lit.size();
          seg_start = pos;
          hit = true;
          break;
        }
      }
      if (!hit) ++pos;
    }
    encode_segment(wp, s + seg_start, n - seg_start, ids);

    const int32_t body = (int32_t)ids.size() < max_length - 2
                             ? (int32_t)ids.size() : max_length - 2;
    int32_t* row = out_ids + (int64_t)i * max_length;
    int32_t* mrow = out_mask + (int64_t)i * max_length;
    int32_t w = 0;
    row[w++] = wp.cls;
    for (int32_t j = 0; j < body; ++j) row[w++] = ids[j];
    row[w++] = wp.sep;
    for (int32_t j = 0; j < w; ++j) mrow[j] = 1;
    for (int32_t j = w; j < max_length; ++j) { row[j] = wp.pad; mrow[j] = 0; }
  }
  return 0;
}

int32_t biom3_native_abi_version(void) { return 2; }

}  // extern "C"
