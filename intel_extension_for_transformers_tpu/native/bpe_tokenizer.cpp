// Native byte-level BPE tokenizer (GPT-2 family) — C++ runtime component.
//
// Role in the framework: tokenization is host-side serving work that sits on
// the request path of every router; this implementation runs it off the
// Python interpreter (no GIL, no per-token Python objects) the same way the
// reference keeps its serving-path text processing in native code (its
// neural-speed runtime tokenizes in C++ via its own vocab loaders, e.g.
// reference: ITREX's neural-speed graph runtimes). Python glue lives in
// native/__init__.py: it parses HF tokenizer.json, undoes the GPT-2
// byte→unicode alphabet so the C++ side works on RAW BYTES, and gates
// non-ASCII pre-tokenization to the HF path (the \p{L}/\p{N} classes of the
// GPT-2 split regex need full Unicode tables; ASCII covers the hot serving
// case and is parity-tested byte-for-byte against the `tokenizers` oracle).
//
// Design:
// - vocab: raw-byte token string → id (hash map) + id → bytes (vector).
// - merges: "left\x1ERight" → rank (hash map).
// - encode: GPT-2 pre-tokenize (ASCII approximation of the published
//   regex: contractions, optional-space+letters, optional-space+digits,
//   optional-space+punct-run, whitespace with the (?!\S) lookahead) then
//   classic lowest-rank-pair BPE per piece, with a per-piece result cache.
// - decode: concatenate id→bytes.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <mutex>
#include <shared_mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct BPE {
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> id_to_tok;
  std::unordered_map<std::string, int32_t> merge_rank;
  // The per-piece result cache is shared across concurrent encode() calls
  // (ctypes releases the GIL and the server is a ThreadingHTTPServer), so
  // all access goes through cache_mu: shared lock for lookups, exclusive
  // for inserts. vocab/merge_rank are load-then-read-only — loading happens
  // single-threaded in __init__ before the handle is published.
  std::shared_mutex cache_mu;
  std::unordered_map<std::string, std::vector<int32_t>> cache;
};

inline bool is_letter(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
inline bool is_digit(unsigned char c) { return c >= '0' && c <= '9'; }
inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}
// "other" class of the GPT-2 regex: not whitespace, not letter, not digit.
inline bool is_other(unsigned char c) {
  return !is_space(c) && !is_letter(c) && !is_digit(c);
}

// GPT-2 pre-tokenizer, ASCII approximation. Appends piece boundaries.
void pretokenize(const std::string& s, std::vector<std::string>& out) {
  size_t i = 0, n = s.size();
  while (i < n) {
    // 1. contractions: 's 't 're 've 'm 'll 'd  (lowercase, per the regex)
    if (s[i] == '\'' && i + 1 < n) {
      char c1 = s[i + 1];
      if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') {
        out.push_back(s.substr(i, 2));
        i += 2;
        continue;
      }
      if (i + 2 < n) {
        std::string two = s.substr(i + 1, 2);
        if (two == "re" || two == "ve" || two == "ll") {
          out.push_back(s.substr(i, 3));
          i += 3;
          continue;
        }
      }
    }
    unsigned char c = s[i];
    unsigned char cn = i + 1 < n ? s[i + 1] : 0;
    // 2.  ?\p{L}+
    if (is_letter(c) || (c == ' ' && is_letter(cn))) {
      size_t j = i + (c == ' ' ? 1 : 0);
      while (j < n && is_letter(s[j])) j++;
      out.push_back(s.substr(i, j - i));
      i = j;
      continue;
    }
    // 3.  ?\p{N}+
    if (is_digit(c) || (c == ' ' && is_digit(cn))) {
      size_t j = i + (c == ' ' ? 1 : 0);
      while (j < n && is_digit(s[j])) j++;
      out.push_back(s.substr(i, j - i));
      i = j;
      continue;
    }
    // 4.  ?[^\s\p{L}\p{N}]+
    if (is_other(c) || (c == ' ' && is_other(cn))) {
      size_t j = i + (c == ' ' ? 1 : 0);
      while (j < n && is_other(s[j])) j++;
      out.push_back(s.substr(i, j - i));
      i = j;
      continue;
    }
    // 5. \s+(?!\S) then \s+ : a run ending the string is one piece; a run
    // before a non-space leaves its LAST char for the next alternative
    // (rules 2-4 absorb a leading space; other single whitespace falls back
    // to \s+ on the next loop iteration)
    size_t j = i;
    while (j < n && is_space(s[j])) j++;
    size_t end = (j < n && j - i > 1) ? j - 1 : j;
    out.push_back(s.substr(i, end - i));
    i = end;
  }
}

void bpe_word(BPE* t, const std::string& piece, std::vector<int32_t>& out) {
  {
    std::shared_lock<std::shared_mutex> lk(t->cache_mu);
    auto it = t->cache.find(piece);
    if (it != t->cache.end()) {
      out.insert(out.end(), it->second.begin(), it->second.end());
      return;
    }
  }
  std::vector<std::string> parts;
  parts.reserve(piece.size());
  for (char ch : piece) parts.emplace_back(1, ch);
  while (parts.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); i++) {
      std::string key = parts[i] + '\x1e' + parts[i + 1];
      auto mit = t->merge_rank.find(key);
      if (mit != t->merge_rank.end() && mit->second < best_rank) {
        best_rank = mit->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    parts[best_i] += parts[best_i + 1];
    parts.erase(parts.begin() + best_i + 1);
  }
  std::vector<int32_t> ids;
  ids.reserve(parts.size());
  for (auto& p : parts) {
    auto vit = t->vocab.find(p);
    if (vit != t->vocab.end()) ids.push_back(vit->second);
    // unknown byte sequences are dropped (caller guarantees byte coverage
    // by loading the full byte-level alphabet)
  }
  {
    std::unique_lock<std::shared_mutex> lk(t->cache_mu);
    if (t->cache.size() < (1u << 20)) t->cache.emplace(piece, ids);
  }
  out.insert(out.end(), ids.begin(), ids.end());
}

}  // namespace

extern "C" {

void* bpe_new() { return new BPE(); }

void bpe_free(void* h) { delete static_cast<BPE*>(h); }

void bpe_add_token(void* h, const char* bytes, int len, int32_t id) {
  BPE* t = static_cast<BPE*>(h);
  std::string tok(bytes, len);
  t->vocab[tok] = id;
  if (id >= 0) {
    if (t->id_to_tok.size() <= static_cast<size_t>(id))
      t->id_to_tok.resize(id + 1);
    t->id_to_tok[id] = tok;
  }
}

void bpe_add_merge(void* h, const char* left, int llen, const char* right,
                   int rlen, int32_t rank) {
  BPE* t = static_cast<BPE*>(h);
  std::string key = std::string(left, llen) + '\x1e' + std::string(right, rlen);
  t->merge_rank[key] = rank;
}

// → number of ids written (≤ max_out)
int bpe_encode(void* h, const char* text, int len, int32_t* out,
               int max_out) {
  BPE* t = static_cast<BPE*>(h);
  std::vector<std::string> pieces;
  pretokenize(std::string(text, len), pieces);
  std::vector<int32_t> ids;
  ids.reserve(len);
  for (auto& p : pieces) bpe_word(t, p, ids);
  int n = static_cast<int>(ids.size());
  if (n > max_out) n = max_out;
  std::memcpy(out, ids.data(), n * sizeof(int32_t));
  return n;
}

// → malloc'd byte buffer (caller frees with bpe_buf_free); out_len set
char* bpe_decode(void* h, const int32_t* ids, int n, int* out_len) {
  BPE* t = static_cast<BPE*>(h);
  std::string s;
  for (int i = 0; i < n; i++) {
    int32_t id = ids[i];
    if (id >= 0 && static_cast<size_t>(id) < t->id_to_tok.size())
      s += t->id_to_tok[id];
  }
  char* buf = static_cast<char*>(std::malloc(s.size() + 1));
  std::memcpy(buf, s.data(), s.size());
  buf[s.size()] = '\0';
  *out_len = static_cast<int>(s.size());
  return buf;
}

void bpe_buf_free(char* p) { std::free(p); }

}  // extern "C"
