// Native word tokenizer for host-side text preprocessing.
//
// The reference delegates tokenization to HuggingFace's (Rust/C++-backed)
// tokenizers (reference: models/octo/octo.py:402-409); this is the
// framework's native equivalent for the vocabulary-file word tokenizer
// (reference: tokenizers/text/text_tokenizer.py:26-46): C++ hash-map
// lookup, batch encoding in one call, zero Python per-token overhead.
//
// C ABI (used via ctypes):
//   void* tok_create(const char* vocab_blob)   // newline-separated words
//   int   tok_vocab_size(void* h)
//   void  tok_encode_batch(void* h, const char** texts, int n,
//                          int32_t* out, int max_len)
//   void  tok_destroy(void* h)

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <set>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t kPad = 0;
constexpr int32_t kUnk = 1;

struct Tokenizer {
  std::unordered_map<std::string, int32_t> word2idx;
};

std::string lower(const std::string& s) {
  std::string out(s);
  std::transform(out.begin(), out.end(), out.begin(),
                 [](unsigned char c) { return std::tolower(c); });
  return out;
}

}  // namespace

extern "C" {

void* tok_create(const char* vocab_blob) {
  auto* t = new Tokenizer();
  std::set<std::string> words;  // sorted + deduped, matching WordTokenizer
  std::istringstream in(vocab_blob);
  std::string line;
  while (std::getline(in, line)) {
    // strip surrounding whitespace
    size_t b = line.find_first_not_of(" \t\r\n");
    if (b == std::string::npos) continue;
    size_t e = line.find_last_not_of(" \t\r\n");
    words.insert(line.substr(b, e - b + 1));
  }
  int32_t idx = 2;  // 0 = pad, 1 = unk
  for (const auto& w : words) t->word2idx.emplace(w, idx++);
  return t;
}

int tok_vocab_size(void* h) {
  return static_cast<int>(static_cast<Tokenizer*>(h)->word2idx.size()) + 2;
}

void tok_encode_batch(void* h, const char** texts, int n, int32_t* out,
                      int max_len) {
  auto* t = static_cast<Tokenizer*>(h);
  for (int i = 0; i < n; ++i) {
    int32_t* row = out + static_cast<size_t>(i) * max_len;
    std::fill(row, row + max_len, kPad);
    std::istringstream in(lower(texts[i]));
    std::string word;
    int j = 0;
    while (j < max_len && (in >> word)) {
      auto it = t->word2idx.find(word);
      row[j++] = (it == t->word2idx.end()) ? kUnk : it->second;
    }
  }
}

void tok_destroy(void* h) { delete static_cast<Tokenizer*>(h); }

}  // extern "C"
