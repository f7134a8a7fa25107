// deeppowers-tpu native tokenizer library.
//
// C++17 implementations of the reference's tokenizer stack behind a C ABI
// consumed via ctypes (reference: src/core/tokenizer/ — BPE merge-rule
// encoder bpe.cpp, WordPiece longest-match wordpiece.cpp, VocabManager
// vocab_manager.cpp, threaded batch encode tokenizer.hpp:63-71). Byte-level
// base alphabet (ids 4..259 = bytes 0..255, 0..3 = pad/eos/bos/unk) matching
// the Python BPETokenizer in deeppowers_tpu/serving/tokenizer.py — the two
// implementations share the saved-merges JSON format, so a tokenizer trained
// in Python serves from C++.
//
// Build: g++ -std=c++17 -O2 -shared -fPIC -o libdptok.so tokenizer.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kByteOffset = 4;  // ids 0..3 are pad/eos/bos/unk
constexpr int kBaseVocab = 260;

struct PairHash {
    size_t operator()(const std::pair<int, int>& p) const {
        return (static_cast<size_t>(p.first) << 32) ^
               static_cast<size_t>(p.second);
    }
};

// ---------------------------------------------------------------------------
// Byte-level BPE (reference: bpe.cpp merge-rule encoding)
// ---------------------------------------------------------------------------
class BpeTokenizer {
  public:
    // merges[i] = (a, b) merged into id kBaseVocab + i.
    explicit BpeTokenizer(std::vector<std::pair<int, int>> merges)
        : merges_(std::move(merges)) {
        bytes_.resize(kBaseVocab + merges_.size());
        for (int b = 0; b < 256; ++b)
            bytes_[kByteOffset + b] = std::string(1, static_cast<char>(b));
        for (size_t i = 0; i < merges_.size(); ++i) {
            const auto& m = merges_[i];
            rank_[{m.first, m.second}] = static_cast<int>(i);
            merged_id_[{m.first, m.second}] = kBaseVocab + static_cast<int>(i);
            bytes_[kBaseVocab + i] = tok_bytes(m.first) + tok_bytes(m.second);
        }
    }

    int vocab_size() const {
        return kBaseVocab + static_cast<int>(merges_.size());
    }

    const std::vector<std::pair<int, int>>& merges() const { return merges_; }

    std::vector<int32_t> encode(const std::string& text) const {
        std::vector<int32_t> seq;
        seq.reserve(text.size());
        for (unsigned char c : text) seq.push_back(kByteOffset + c);
        // Iteratively apply the lowest-rank merge present (reference BPE
        // loop; same semantics as the Python encoder).
        while (seq.size() > 1) {
            int best_rank = INT32_MAX;
            std::pair<int, int> best{-1, -1};
            for (size_t i = 0; i + 1 < seq.size(); ++i) {
                auto it = rank_.find({seq[i], seq[i + 1]});
                if (it != rank_.end() && it->second < best_rank) {
                    best_rank = it->second;
                    best = {seq[i], seq[i + 1]};
                }
            }
            if (best.first < 0) break;
            const int new_id = merged_id_.at(best);
            std::vector<int32_t> out;
            out.reserve(seq.size());
            for (size_t i = 0; i < seq.size();) {
                if (i + 1 < seq.size() && seq[i] == best.first &&
                    seq[i + 1] == best.second) {
                    out.push_back(new_id);
                    i += 2;
                } else {
                    out.push_back(seq[i]);
                    ++i;
                }
            }
            seq.swap(out);
        }
        return seq;
    }

    std::string decode(const int32_t* ids, int n) const {
        std::string out;
        for (int i = 0; i < n; ++i) {
            int id = ids[i];
            if (id >= 0 && id < static_cast<int>(bytes_.size()))
                out += bytes_[id];
        }
        return out;
    }

  private:
    const std::string& tok_bytes(int id) const { return bytes_[id]; }

    std::vector<std::pair<int, int>> merges_;
    std::unordered_map<std::pair<int, int>, int, PairHash> rank_;
    std::unordered_map<std::pair<int, int>, int, PairHash> merged_id_;
    std::vector<std::string> bytes_;
};

// ---------------------------------------------------------------------------
// WordPiece (reference: wordpiece.cpp — "##" continuation, longest match)
// ---------------------------------------------------------------------------
class WordPieceTokenizer {
  public:
    WordPieceTokenizer(std::vector<std::string> vocab, int unk_id)
        : vocab_(std::move(vocab)), unk_id_(unk_id) {
        for (size_t i = 0; i < vocab_.size(); ++i)
            ids_[vocab_[i]] = static_cast<int>(i);
    }

    int vocab_size() const { return static_cast<int>(vocab_.size()); }

    const std::vector<std::string>& vocab() const { return vocab_; }

    std::vector<int32_t> encode(const std::string& text) const {
        std::vector<int32_t> out;
        std::istringstream ss(text);
        std::string word;
        while (ss >> word) encode_word(word, &out);
        return out;
    }

    std::string decode(const int32_t* ids, int n) const {
        std::string out;
        for (int i = 0; i < n; ++i) {
            if (ids[i] < 0 || ids[i] >= static_cast<int>(vocab_.size()))
                continue;
            const std::string& tok = vocab_[ids[i]];
            if (tok.rfind("##", 0) == 0) {
                out += tok.substr(2);
            } else {
                if (!out.empty()) out += ' ';
                out += tok;
            }
        }
        return out;
    }

  private:
    void encode_word(const std::string& word, std::vector<int32_t>* out) const {
        size_t start = 0;
        std::vector<int32_t> pieces;
        while (start < word.size()) {
            size_t end = word.size();
            int found = -1;
            while (end > start) {  // longest match first
                std::string piece = word.substr(start, end - start);
                if (start > 0) piece = "##" + piece;
                auto it = ids_.find(piece);
                if (it != ids_.end()) {
                    found = it->second;
                    break;
                }
                --end;
            }
            if (found < 0) {  // unknown word -> single UNK
                out->push_back(unk_id_);
                return;
            }
            pieces.push_back(found);
            start = end;
        }
        out->insert(out->end(), pieces.begin(), pieces.end());
    }

    std::vector<std::string> vocab_;
    std::unordered_map<std::string, int> ids_;
    int unk_id_;
};

// ---------------------------------------------------------------------------
// Minimal parser for our saved-merges JSON: {"type": "bpe", "merges":
// [[a, b], ...]} (format shared with the Python BPETokenizer).
// ---------------------------------------------------------------------------
bool parse_merges(const std::string& payload,
                  std::vector<std::pair<int, int>>* merges) {
    auto pos = payload.find("\"merges\"");
    if (pos == std::string::npos) return false;
    pos = payload.find('[', pos);
    if (pos == std::string::npos) return false;
    size_t i = pos + 1;
    while (i < payload.size()) {
        while (i < payload.size() &&
               (payload[i] == ' ' || payload[i] == ',' || payload[i] == '\n'))
            ++i;
        if (i >= payload.size() || payload[i] == ']') break;
        if (payload[i] != '[') return false;
        ++i;
        char* endp = nullptr;
        long a = std::strtol(payload.c_str() + i, &endp, 10);
        i = endp - payload.c_str();
        while (i < payload.size() && (payload[i] == ',' || payload[i] == ' '))
            ++i;
        long b = std::strtol(payload.c_str() + i, &endp, 10);
        i = endp - payload.c_str();
        while (i < payload.size() && payload[i] != ']') ++i;
        ++i;  // skip ']'
        merges->emplace_back(static_cast<int>(a), static_cast<int>(b));
    }
    return true;
}

struct Handle {
    std::unique_ptr<BpeTokenizer> bpe;
    std::unique_ptr<WordPieceTokenizer> wordpiece;
    std::string last_error;
};


// ---------------------------------------------------------------------------
// Training (reference: tokenizer.hpp:41-47 train/save/load; bpe.cpp training
// loop; wordpiece.cpp vocab building) — the round-1 C++ lib only encoded.
// ---------------------------------------------------------------------------

std::vector<std::pair<int, int>> train_bpe_merges(
    const std::vector<std::string>& corpus, int target_merges, int min_freq) {
    // Byte-level sequences; iterative most-frequent-pair merging — same
    // semantics as the Python BPETokenizer.train, so both sides produce
    // interchangeable merge tables.
    std::vector<std::vector<int32_t>> seqs;
    seqs.reserve(corpus.size());
    for (const auto& text : corpus) {
        std::vector<int32_t> s;
        s.reserve(text.size());
        for (unsigned char c : text) s.push_back(kByteOffset + c);
        seqs.push_back(std::move(s));
    }
    std::vector<std::pair<int, int>> merges;
    for (int step = 0; step < target_merges; ++step) {
        std::unordered_map<std::pair<int, int>, int, PairHash> counts;
        for (const auto& s : seqs)
            for (size_t i = 0; i + 1 < s.size(); ++i)
                ++counts[{s[i], s[i + 1]}];
        std::pair<int, int> best{-1, -1};
        int best_n = 0;
        for (const auto& kv : counts) {
            if (kv.second > best_n ||
                (kv.second == best_n && kv.first < best)) {
                best = kv.first;
                best_n = kv.second;
            }
        }
        if (best_n < min_freq || best.first < 0) break;
        const int new_id = kBaseVocab + static_cast<int>(merges.size());
        merges.push_back(best);
        for (auto& s : seqs) {
            std::vector<int32_t> out;
            out.reserve(s.size());
            for (size_t i = 0; i < s.size();) {
                if (i + 1 < s.size() && s[i] == best.first &&
                    s[i + 1] == best.second) {
                    out.push_back(new_id);
                    i += 2;
                } else {
                    out.push_back(s[i]);
                    ++i;
                }
            }
            s.swap(out);
        }
    }
    return merges;
}

std::vector<std::string> train_wordpiece_vocab(
    const std::vector<std::string>& corpus, int vocab_size) {
    // WordPiece likelihood training: words split into char pieces
    // (## continuation); repeatedly merge the pair maximizing
    // freq(ab) / (freq(a) * freq(b)).
    std::unordered_map<std::string, int> word_counts;
    for (const auto& text : corpus) {
        std::istringstream ss(text);
        std::string w;
        while (ss >> w) ++word_counts[w];
    }
    struct Word { std::vector<std::string> pieces; int count; };
    std::vector<Word> words;
    std::vector<std::string> vocab = {"[PAD]", "[UNK]", "[CLS]", "[SEP]",
                                      "[MASK]"};
    std::unordered_map<std::string, int> seen;
    for (const auto& v : vocab) seen[v] = 1;
    auto add_piece = [&](const std::string& p) {
        if (!seen.count(p)) {
            seen[p] = 1;
            vocab.push_back(p);
        }
    };
    for (const auto& kv : word_counts) {
        Word w;
        w.count = kv.second;
        const std::string& word = kv.first;
        for (size_t i = 0; i < word.size(); ++i) {
            std::string p(1, word[i]);
            if (i > 0) p = "##" + p;
            add_piece(p);
            w.pieces.push_back(std::move(p));
        }
        words.push_back(std::move(w));
    }
    while (static_cast<int>(vocab.size()) < vocab_size) {
        std::unordered_map<std::string, long> piece_freq;
        std::unordered_map<std::string, long> pair_freq;
        std::unordered_map<std::string, std::pair<std::string, std::string>>
            pair_parts;
        for (const auto& w : words) {
            for (const auto& p : w.pieces) piece_freq[p] += w.count;
            for (size_t i = 0; i + 1 < w.pieces.size(); ++i) {
                std::string key = w.pieces[i] + "\x01" + w.pieces[i + 1];
                pair_freq[key] += w.count;
                pair_parts[key] = {w.pieces[i], w.pieces[i + 1]};
            }
        }
        std::string best_key;
        double best_score = 0.0;
        for (const auto& kv : pair_freq) {
            const auto& parts = pair_parts[kv.first];
            double denom = static_cast<double>(piece_freq[parts.first]) *
                           static_cast<double>(piece_freq[parts.second]);
            double score = denom > 0 ? kv.second / denom : 0.0;
            if (score > best_score ||
                (score == best_score && kv.first < best_key)) {
                best_score = score;
                best_key = kv.first;
            }
        }
        if (best_key.empty()) break;
        const auto parts = pair_parts[best_key];
        std::string tail = parts.second.rfind("##", 0) == 0
                               ? parts.second.substr(2)
                               : parts.second;
        std::string merged = parts.first + tail;
        add_piece(merged);
        for (auto& w : words) {
            std::vector<std::string> out;
            out.reserve(w.pieces.size());
            for (size_t i = 0; i < w.pieces.size();) {
                if (i + 1 < w.pieces.size() && w.pieces[i] == parts.first &&
                    w.pieces[i + 1] == parts.second) {
                    out.push_back(merged);
                    i += 2;
                } else {
                    out.push_back(w.pieces[i]);
                    ++i;
                }
            }
            w.pieces.swap(out);
        }
    }
    return vocab;
}

std::vector<int32_t> run_encode(Handle* h, const std::string& text) {
    if (h->bpe) return h->bpe->encode(text);
    return h->wordpiece->encode(text);
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------
extern "C" {

void* dptok_create_bpe_from_file(const char* path) {
    std::ifstream f(path);
    if (!f) return nullptr;
    std::stringstream buf;
    buf << f.rdbuf();
    std::vector<std::pair<int, int>> merges;
    if (!parse_merges(buf.str(), &merges)) return nullptr;
    auto* h = new Handle();
    h->bpe = std::make_unique<BpeTokenizer>(std::move(merges));
    return h;
}

// merges: flat [a0, b0, a1, b1, ...]
void* dptok_create_bpe(const int32_t* merges, int num_merges) {
    std::vector<std::pair<int, int>> m;
    m.reserve(num_merges);
    for (int i = 0; i < num_merges; ++i)
        m.emplace_back(merges[2 * i], merges[2 * i + 1]);
    auto* h = new Handle();
    h->bpe = std::make_unique<BpeTokenizer>(std::move(m));
    return h;
}

// vocab file: one token per line.
void* dptok_create_wordpiece_from_file(const char* path, int unk_id) {
    std::ifstream f(path);
    if (!f) return nullptr;
    std::vector<std::string> vocab;
    std::string line;
    while (std::getline(f, line)) {
        while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
            line.pop_back();
        vocab.push_back(line);
    }
    auto* h = new Handle();
    h->wordpiece = std::make_unique<WordPieceTokenizer>(std::move(vocab),
                                                        unk_id);
    return h;
}

void dptok_destroy(void* handle) { delete static_cast<Handle*>(handle); }

int dptok_vocab_size(void* handle) {
    auto* h = static_cast<Handle*>(handle);
    return h->bpe ? h->bpe->vocab_size() : h->wordpiece->vocab_size();
}

// Encode text into out (capacity given); returns token count (or the
// required capacity if larger — caller retries with a bigger buffer).
int dptok_encode(void* handle, const char* text, int32_t* out, int capacity) {
    auto* h = static_cast<Handle*>(handle);
    std::vector<int32_t> ids = run_encode(h, text);
    const int n = static_cast<int>(ids.size());
    if (n <= capacity) std::memcpy(out, ids.data(), n * sizeof(int32_t));
    return n;
}

// Decode ids into out buffer; returns byte length (or required capacity).
int dptok_decode(void* handle, const int32_t* ids, int n, char* out,
                 int capacity) {
    auto* h = static_cast<Handle*>(handle);
    std::string s = h->bpe ? h->bpe->decode(ids, n)
                           : h->wordpiece->decode(ids, n);
    const int len = static_cast<int>(s.size());
    if (len <= capacity) std::memcpy(out, s.data(), len);
    return len;
}

// Threaded batch encode (reference: encode_batch_parallel via ThreadPool,
// tokenizer.hpp:63-71). texts: n null-terminated strings; out: per-text
// buffers of stride `capacity`; counts: per-text token counts.
void dptok_encode_batch(void* handle, const char** texts, int n,
                        int32_t* out, int capacity, int32_t* counts,
                        int num_threads) {
    auto* h = static_cast<Handle*>(handle);
    if (num_threads <= 1 || n <= 1) {
        for (int i = 0; i < n; ++i)
            counts[i] = dptok_encode(handle, texts[i], out + i * capacity,
                                     capacity);
        return;
    }
    std::vector<std::thread> threads;
    std::atomic_int next{0};
    auto worker = [&]() {
        for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
            counts[i] = dptok_encode(h, texts[i], out + i * capacity,
                                     capacity);
    };
    const int t = std::min(num_threads, n);
    threads.reserve(t);
    for (int i = 0; i < t; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}


void* dptok_train_bpe(const char** texts, int n, int vocab_size,
                      int min_freq) {
    std::vector<std::string> corpus;
    corpus.reserve(n);
    for (int i = 0; i < n; ++i) corpus.emplace_back(texts[i]);
    auto merges = train_bpe_merges(
        corpus, vocab_size > kBaseVocab ? vocab_size - kBaseVocab : 0,
        min_freq);
    auto* h = new Handle();
    h->bpe = std::make_unique<BpeTokenizer>(std::move(merges));
    return h;
}

void* dptok_train_wordpiece(const char** texts, int n, int vocab_size,
                            int unk_id) {
    std::vector<std::string> corpus;
    corpus.reserve(n);
    for (int i = 0; i < n; ++i) corpus.emplace_back(texts[i]);
    auto vocab = train_wordpiece_vocab(corpus, vocab_size);
    auto* h = new Handle();
    h->wordpiece =
        std::make_unique<WordPieceTokenizer>(std::move(vocab), unk_id);
    return h;
}

// Persist a trained tokenizer: BPE -> the shared merges JSON
// (loadable by dptok_create_bpe_from_file AND the Python BPETokenizer);
// WordPiece -> vocab.txt, one token per line (BERT convention,
// loadable by dptok_create_wordpiece_from_file). Returns 0 on success.
int dptok_save(void* handle, const char* path) {
    auto* h = static_cast<Handle*>(handle);
    std::ofstream f(path);
    if (!f) return -1;
    if (h->bpe) {
        f << "{\"type\": \"bpe\", \"merges\": [";
        const auto& merges = h->bpe->merges();
        for (size_t i = 0; i < merges.size(); ++i) {
            if (i) f << ", ";
            f << "[" << merges[i].first << ", " << merges[i].second << "]";
        }
        f << "]}";
        return f.good() ? 0 : -1;
    }
    if (h->wordpiece) {
        for (const auto& tok : h->wordpiece->vocab()) f << tok << "\n";
        return f.good() ? 0 : -1;
    }
    return -1;
}

}  // extern "C"

#ifdef DPTOK_SELFTEST
// Sanitizer self-test (make asan / make tsan): exercises BPE encode/decode
// and the threaded batch path — the surfaces where memory/thread bugs live.
#include <cassert>
#include <cstdio>

int main() {
    // merges over byte-level ids: (97,98)->256 "ab", (256,99)->257 "abc"
    const int32_t merges[] = {97, 98, 256, 99};
    void* h = dptok_create_bpe(merges, 2);
    assert(h);
    int32_t out[64];
    int n = dptok_encode(h, "abcabx", out, 64);
    assert(n > 0);
    char buf[256];
    int m = dptok_decode(h, out, n, buf, sizeof buf);
    assert(m > 0 && std::string(buf, m) == "abcabx");

    // threaded batch over 64 strings on 8 threads (TSan checks races)
    std::vector<std::string> owner(64, "the quick brown abc fox abab");
    std::vector<const char*> texts;
    for (auto& s : owner) texts.push_back(s.c_str());
    std::vector<int32_t> big(64 * 64);
    std::vector<int32_t> counts(64);
    dptok_encode_batch(h, texts.data(), 64, big.data(), 64, counts.data(), 8);
    for (int i = 0; i < 64; ++i) assert(counts[i] == counts[0]);
    dptok_destroy(h);
    std::printf("dptok selftest OK\n");
    return 0;
}
#endif
