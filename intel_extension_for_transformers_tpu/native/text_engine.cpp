// Native host-side text engine for the RAG data path.
//
// The TPU-native analogue of the reference's C++ host runtime pieces that
// still make sense next to XLA (reference: the Neural Engine executor's
// host-side role, transformers/runtime/executor/, and the document
// processing feeding retrieval, retrieval/parser/parser.py): document
// chunking and BM25 lexical scoring run on the HOST while the TPU holds the
// dense path — at 1M-docs/min index-build rates the Python splitter/BM25
// become the bottleneck, so both are provided natively with exact semantic
// parity to their Python fallbacks (retrieval/splitter.py, retrieval/bm25.py).
//
// C ABI (ctypes-friendly):
//   te_split_text(text, chunk_size, overlap) -> malloc'd '\x1e'-joined chunks
//   te_free(ptr)
//   te_bm25_new(k1, b) -> handle
//   te_bm25_add(handle, doc_utf8)
//   te_bm25_query(handle, query, k, out_ids, out_scores) -> n_results
//   te_bm25_size(handle) -> n_docs
//   te_bm25_free(handle)
//
// Build: g++ -O3 -shared -fPIC -std=c++17 (native/__init__.py auto-builds).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- splitter

namespace {

struct SplitCfg {
  int chunk_size;
  int overlap;
};

const char* kSeparators[] = {"\n\n", "\n", ". ", " ", ""};
constexpr int kNumSeps = 5;

// python str.strip() over ASCII whitespace
std::string strip(const std::string& s) {
  size_t a = 0, b = s.size();
  while (a < b && std::isspace(static_cast<unsigned char>(s[a]))) a++;
  while (b > a && std::isspace(static_cast<unsigned char>(s[b - 1]))) b--;
  return s.substr(a, b - a);
}

void merge_atoms(const std::vector<std::string>& atoms, const SplitCfg& cfg,
                 std::vector<std::string>* out) {
  std::string cur;
  for (const auto& a : atoms) {
    if (!cur.empty() &&
        cur.size() + a.size() > static_cast<size_t>(cfg.chunk_size)) {
      out->push_back(cur);
      if (cfg.overlap > 0) {
        size_t start = cur.size() > static_cast<size_t>(cfg.overlap)
                           ? cur.size() - cfg.overlap
                           : 0;
        cur = cur.substr(start) + a;
      } else {
        cur = a;
      }
    } else {
      cur += a;
    }
  }
  if (!cur.empty()) out->push_back(cur);
}

void split_rec(const std::string& text, int sep_start, const SplitCfg& cfg,
               std::vector<std::string>* out) {
  if (text.size() <= static_cast<size_t>(cfg.chunk_size)) {
    out->push_back(text);
    return;
  }
  // first separator present ("" always matches)
  int idx = kNumSeps - 1;
  for (int i = sep_start; i < kNumSeps; i++) {
    const char* s = kSeparators[i];
    if (s[0] == '\0' || text.find(s) != std::string::npos) {
      idx = i;
      break;
    }
  }
  const std::string sep = kSeparators[idx];
  if (sep.empty()) {
    // character-level fallback with overlap stride
    int stride = std::max(cfg.chunk_size - cfg.overlap, 1);
    for (size_t i = 0; i < text.size(); i += stride)
      out->push_back(text.substr(i, cfg.chunk_size));
    return;
  }
  // split keeping the separator attached to the left part
  std::vector<std::string> parts;
  size_t pos = 0;
  while (true) {
    size_t hit = text.find(sep, pos);
    if (hit == std::string::npos) {
      parts.push_back(text.substr(pos));
      break;
    }
    parts.push_back(text.substr(pos, hit - pos) + sep);
    pos = hit + sep.size();
  }
  const bool has_rest = idx + 1 < kNumSeps;
  std::vector<std::string> small;
  for (const auto& p : parts) {
    if (p.size() <= static_cast<size_t>(cfg.chunk_size)) {
      small.push_back(p);
    } else {
      if (!small.empty()) {
        merge_atoms(small, cfg, out);
        small.clear();
      }
      if (has_rest)
        split_rec(p, idx + 1, cfg, out);
      else
        out->push_back(p);
    }
  }
  if (!small.empty()) merge_atoms(small, cfg, out);
}

}  // namespace

// Returns a malloc'd buffer: non-empty stripped chunks joined by '\x1e'.
// Caller frees with te_free.
char* te_split_text(const char* text, int chunk_size, int overlap) {
  SplitCfg cfg{chunk_size, overlap};
  std::vector<std::string> raw;
  split_rec(std::string(text), 0, cfg, &raw);
  std::string joined;
  for (const auto& c : raw) {
    std::string s = strip(c);
    if (s.empty()) continue;
    if (!joined.empty()) joined.push_back('\x1e');
    joined += s;
  }
  char* buf = static_cast<char*>(std::malloc(joined.size() + 1));
  std::memcpy(buf, joined.c_str(), joined.size() + 1);
  return buf;
}

void te_free(char* p) { std::free(p); }

// ------------------------------------------------------------------- BM25

namespace {

struct Posting {
  int32_t doc;
  int32_t tf;
};

struct BM25Index {
  double k1, b;
  std::unordered_map<std::string, std::vector<Posting>> postings;
  std::vector<int32_t> doc_len;
  double total_len = 0.0;

  void tokenize(const char* text, std::vector<std::string>* out) const {
    std::string tok;
    for (const char* p = text; *p; p++) {
      unsigned char c = *p;
      if (std::isalnum(c)) {
        tok.push_back(std::tolower(c));
      } else if (!tok.empty()) {
        out->push_back(tok);
        tok.clear();
      }
    }
    if (!tok.empty()) out->push_back(tok);
  }
};

}  // namespace

void* te_bm25_new(double k1, double b) { return new BM25Index{k1, b}; }

void te_bm25_add(void* handle, const char* doc) {
  auto* ix = static_cast<BM25Index*>(handle);
  std::vector<std::string> toks;
  ix->tokenize(doc, &toks);
  int32_t id = static_cast<int32_t>(ix->doc_len.size());
  std::unordered_map<std::string, int32_t> tf;
  for (const auto& t : toks) tf[t]++;
  for (const auto& [t, f] : tf) ix->postings[t].push_back({id, f});
  ix->doc_len.push_back(static_cast<int32_t>(toks.size()));
  ix->total_len += toks.size();
}

int te_bm25_size(void* handle) {
  return static_cast<int>(static_cast<BM25Index*>(handle)->doc_len.size());
}

// Scores the query over the inverted index; writes top-k (ids, scores)
// descending. Returns number written.
int te_bm25_query(void* handle, const char* query, int k, int32_t* out_ids,
                  float* out_scores) {
  auto* ix = static_cast<BM25Index*>(handle);
  const int n = static_cast<int>(ix->doc_len.size());
  if (n == 0 || k <= 0) return 0;
  const double avgdl = std::max(ix->total_len / n, 1e-9);

  std::vector<std::string> toks;
  ix->tokenize(query, &toks);
  std::vector<float> scores(n, 0.0f);
  for (const auto& t : toks) {
    auto it = ix->postings.find(t);
    const int df = it == ix->postings.end()
                       ? 0
                       : static_cast<int>(it->second.size());
    const double idf = std::log((n - df + 0.5) / (df + 0.5) + 1.0);
    if (idf <= 0 || df == 0) continue;
    for (const auto& post : it->second) {
      const double dl = ix->doc_len[post.doc];
      const double denom =
          post.tf + ix->k1 * (1 - ix->b + ix->b * dl / avgdl);
      scores[post.doc] += static_cast<float>(idf * post.tf * (ix->k1 + 1) / denom);
    }
  }
  const int kk = std::min(k, n);
  std::vector<int32_t> idx(n);
  for (int i = 0; i < n; i++) idx[i] = i;
  std::partial_sort(idx.begin(), idx.begin() + kk, idx.end(),
                    [&](int32_t a, int32_t b2) {
                      if (scores[a] != scores[b2]) return scores[a] > scores[b2];
                      return a < b2;  // deterministic tie-break
                    });
  for (int i = 0; i < kk; i++) {
    out_ids[i] = idx[i];
    out_scores[i] = scores[idx[i]];
  }
  return kk;
}

void te_bm25_free(void* handle) { delete static_cast<BM25Index*>(handle); }

}  // extern "C"
