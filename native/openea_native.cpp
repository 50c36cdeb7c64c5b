// Native data loader for openea_tpu.
//
// The reference is pure Python (SURVEY.md §2: zero native sources); its
// dataset loading — per-line str.split, python sets of string tuples,
// frequency counting over dicts — is host-bound and O(seconds..tens of
// seconds) at 100K scale.  This loader parses a 3-column TSV in one pass,
// interns URIs into dense ids, deduplicates triples, and counts entity
// frequencies, returning flat buffers that numpy can wrap zero-copy.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
//
// Build:  g++ -O2 -shared -fPIC -std=c++17 openea_native.cpp -o libopenea_native.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct TripleFile {
  // vocab: concatenated URI bytes + offsets (uris[i] =
  // blob[offsets[i]..offsets[i+1]))
  std::string blob;
  std::vector<int64_t> offsets{0};
  // deduplicated triples as interned ids over ONE shared vocab
  std::vector<int32_t> triples;  // [n, 3] row-major
  // per-vocab-id frequency over head+tail slots (entity frequency for the
  // reference's frequency-ordered id assignment, read.py:64-92)
  std::vector<int64_t> ent_freq;

  std::unordered_map<std::string, int32_t> intern_map;
  std::unordered_set<uint64_t> seen_small;          // for n_vocab < 2^21
  std::unordered_set<std::string> seen_big;

  int32_t intern(const char* s, size_t len) {
    auto it = intern_map.find(std::string(s, len));
    if (it != intern_map.end()) return it->second;
    int32_t id = static_cast<int32_t>(offsets.size()) - 1;
    intern_map.emplace(std::string(s, len), id);
    blob.append(s, len);
    offsets.push_back(static_cast<int64_t>(blob.size()));
    ent_freq.push_back(0);
    return id;
  }

  bool add_unique(int32_t h, int32_t r, int32_t t) {
    if (offsets.size() < (1u << 21)) {
      uint64_t key = (static_cast<uint64_t>(h) << 42) |
                     (static_cast<uint64_t>(r) << 21) |
                     static_cast<uint64_t>(t);
      if (!seen_small.insert(key).second) return false;
    } else {
      char buf[3 * sizeof(int32_t)];
      std::memcpy(buf, &h, 4);
      std::memcpy(buf + 4, &r, 4);
      std::memcpy(buf + 8, &t, 4);
      if (!seen_big.insert(std::string(buf, sizeof buf)).second) return false;
    }
    triples.push_back(h);
    triples.push_back(r);
    triples.push_back(t);
    ent_freq[h] += 1;
    ent_freq[t] += 1;
    return true;
  }
};

inline const char* trim(const char* b, const char* e, size_t* len) {
  while (b < e && (*b == ' ' || *b == '\r')) ++b;
  while (e > b && (e[-1] == ' ' || e[-1] == '\r')) --e;
  *len = static_cast<size_t>(e - b);
  return b;
}

}  // namespace

extern "C" {

// Returns a handle, or nullptr on IO error / malformed line.
void* openea_load_triples(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* tf = new TripleFile();
  std::string line;
  char buf[1 << 16];
  std::string pending;
  bool bad = false;
  auto process = [&](const char* b, const char* e) {
    if (b == e) return;                       // empty line
    const char* t1 = static_cast<const char*>(memchr(b, '\t', e - b));
    if (!t1) { bad = true; return; }
    const char* t2 = static_cast<const char*>(memchr(t1 + 1, '\t', e - t1 - 1));
    if (!t2) { bad = true; return; }
    size_t lh, lr, lt;
    const char* h = trim(b, t1, &lh);
    const char* r = trim(t1 + 1, t2, &lr);
    const char* t = trim(t2 + 1, e, &lt);
    tf->add_unique(tf->intern(h, lh), tf->intern(r, lr), tf->intern(t, lt));
  };
  size_t n;
  while ((n = std::fread(buf, 1, sizeof buf, f)) > 0 && !bad) {
    const char* cur = buf;
    const char* end = buf + n;
    while (cur < end) {
      const char* nl = static_cast<const char*>(memchr(cur, '\n', end - cur));
      if (!nl) { pending.append(cur, end - cur); break; }
      if (!pending.empty()) {
        pending.append(cur, nl - cur);
        process(pending.data(), pending.data() + pending.size());
        pending.clear();
      } else {
        process(cur, nl);
      }
      cur = nl + 1;
    }
  }
  std::fclose(f);
  if (!bad && !pending.empty())
    process(pending.data(), pending.data() + pending.size());
  if (bad) { delete tf; return nullptr; }
  return tf;
}

int64_t openea_num_triples(void* h) {
  return static_cast<TripleFile*>(h)->triples.size() / 3;
}
int64_t openea_num_uris(void* h) {
  return static_cast<int64_t>(static_cast<TripleFile*>(h)->offsets.size()) - 1;
}
int64_t openea_blob_size(void* h) {
  return static_cast<int64_t>(static_cast<TripleFile*>(h)->blob.size());
}
const int32_t* openea_triples_ptr(void* h) {
  return static_cast<TripleFile*>(h)->triples.data();
}
const int64_t* openea_offsets_ptr(void* h) {
  return static_cast<TripleFile*>(h)->offsets.data();
}
const char* openea_blob_ptr(void* h) {
  return static_cast<TripleFile*>(h)->blob.data();
}
const int64_t* openea_ent_freq_ptr(void* h) {
  return static_cast<TripleFile*>(h)->ent_freq.data();
}
void openea_free(void* h) { delete static_cast<TripleFile*>(h); }

// ---- 2-hop join emission + dedup (the AliNet mining hot loop) -------------
//
// The Python side (models/alinet.py generate_2hop_pairs) reduces the
// reference's pandas self-merge (alinet.py:250-287) to: for each left row
// i < nl emit the c[i] packed int64 join keys
//     a_key[i] | b_key[base[i] + j*stride],   0 <= j < c[i]
// then sort + dedup.  numpy needs ~10 full passes over the emitted array
// (segment-id expansion, gathers, arithmetic, sort); here emission is one
// fused pass and the sort runs on all cores.  Returns a malloc'd int64
// buffer (released with openea_buf_free); *out_n is the unique count.
int64_t* openea_mine2hop_unique(const int64_t* a_key, const int64_t* base,
                                const int64_t* c, int64_t nl,
                                const int64_t* b_key, int64_t stride,
                                int64_t* out_n) {
  int64_t total = 0;
  for (int64_t i = 0; i < nl; ++i) total += c[i];
  if (total <= 0) {
    *out_n = 0;
    return static_cast<int64_t*>(malloc(sizeof(int64_t)));
  }
  int nt = static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > 8) nt = 8;
  if (total < static_cast<int64_t>(nt) * 65536) nt = 1;
  // split rows into nt ranges of ~equal emitted size
  std::vector<int64_t> row0(nt + 1), out0(nt + 1);
  {
    int64_t acc = 0;
    int t = 0;
    for (int64_t i = 0; i < nl && t + 1 < nt; ++i) {
      acc += c[i];
      if (acc >= (t + 1) * (total / nt)) {
        ++t;
        row0[t] = i + 1;
        out0[t] = acc;
      }
    }
    while (t < nt) {
      ++t;
      row0[t] = nl;
      out0[t] = total;
    }
  }
  auto* buf = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * static_cast<size_t>(total)));
  auto* buf2 = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * static_cast<size_t>(total)));
  if (!buf || !buf2) {
    free(buf);
    free(buf2);
    *out_n = -1;
    return nullptr;
  }
  {
    std::vector<std::thread> th;
    for (int t = 0; t < nt; ++t)
      th.emplace_back([&, t]() {
        int64_t p = out0[t];
        for (int64_t i = row0[t]; i < row0[t + 1]; ++i) {
          const int64_t ci = c[i];
          if (ci == 0) continue;  // base[i] may be out of range when empty
          const int64_t a = a_key[i];
          const int64_t* bp = b_key + base[i];
          for (int64_t j = 0; j < ci; ++j) buf[p++] = a | bp[j * stride];
        }
        std::sort(buf + out0[t], buf + out0[t + 1]);
      });
    for (auto& x : th) x.join();
  }
  // pairwise parallel merges of the sorted runs
  std::vector<int64_t> bnd(out0.begin(), out0.end());
  int runs = nt;
  while (runs > 1) {
    std::vector<std::thread> th;
    std::vector<int64_t> nb{0};
    for (int rp = 0; rp < runs; rp += 2) {
      const int64_t lo = bnd[rp], mid = bnd[rp + 1],
                    hi = (rp + 1 < runs) ? bnd[rp + 2] : mid;
      th.emplace_back([buf, buf2, lo, mid, hi]() {
        std::merge(buf + lo, buf + mid, buf + mid, buf + hi, buf2 + lo);
      });
      nb.push_back(hi);
    }
    for (auto& x : th) x.join();
    std::swap(buf, buf2);
    bnd = nb;
    runs = static_cast<int>(bnd.size()) - 1;
  }
  *out_n = std::unique(buf, buf + total) - buf;
  free(buf2);
  return buf;
}

// ---- stable counting argsort (int32 keys in [0, n_keys)) ------------------
//
// numpy's argsort over 80M random int32 keys costs ~20 s (index writes are
// the bill); with a bounded key domain a parallel stable counting sort is
// two passes: per-block histograms, a global (block, key) prefix, and a
// per-block index scatter — stability holds because block-major order is
// original order.  Fills the caller-allocated int64 out[n].
int32_t openea_counting_argsort(const int32_t* keys, int64_t n,
                                int64_t n_keys, int64_t* out) {
  if (n <= 0 || n_keys <= 0) return 0;
  int nt = static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > 8) nt = 8;
  if (n < static_cast<int64_t>(nt) * 262144) nt = 1;
  std::vector<std::vector<int64_t>> hist(nt);
  std::vector<int64_t> b0(nt + 1);
  std::vector<int> bad(nt, 0);
  for (int t = 0; t <= nt; ++t) b0[t] = n * t / nt;
  {
    std::vector<std::thread> th;
    for (int t = 0; t < nt; ++t)
      th.emplace_back([&, t]() {
        auto& h = hist[t];
        h.assign(static_cast<size_t>(n_keys), 0);
        for (int64_t i = b0[t]; i < b0[t + 1]; ++i) {
          const int64_t k = keys[i];
          if (k < 0 || k >= n_keys) bad[t] = 1;
          else ++h[k];
        }
      });
    for (auto& x : th) x.join();
  }
  for (int t = 0; t < nt; ++t)
    if (bad[t]) return -1;
  // (key, block)-major exclusive prefix -> per-block write starts
  int64_t acc = 0;
  for (int64_t k = 0; k < n_keys; ++k)
    for (int t = 0; t < nt; ++t) {
      const int64_t c = hist[t][k];
      hist[t][k] = acc;
      acc += c;
    }
  {
    std::vector<std::thread> th;
    for (int t = 0; t < nt; ++t)
      th.emplace_back([&, t]() {
        auto& pos = hist[t];
        for (int64_t i = b0[t]; i < b0[t + 1]; ++i)
          out[pos[keys[i]]++] = i;
      });
    for (auto& x : th) x.join();
  }
  return 0;
}

// ---- parallel sort + unique over int64 keys -------------------------------
//
// np.unique over the 80M packed edge keys of the 100K 2-hop adjacency is
// a single-threaded ~20 s sort; this reuses the mine2hop merge pattern:
// per-thread std::sort, pairwise parallel merges, one unique pass.
// Returns a malloc'd buffer (openea_buf_free); *out_n = unique count.
int64_t* openea_sort_unique_i64(const int64_t* keys, int64_t n,
                                int64_t* out_n) {
  if (n <= 0) {
    *out_n = 0;
    return static_cast<int64_t*>(malloc(sizeof(int64_t)));
  }
  int nt = static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > 8) nt = 8;
  if (n < static_cast<int64_t>(nt) * 65536) nt = 1;
  auto* buf = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * static_cast<size_t>(n)));
  auto* buf2 = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * static_cast<size_t>(n)));
  if (!buf || !buf2) {
    free(buf);
    free(buf2);
    *out_n = -1;
    return nullptr;
  }
  std::vector<int64_t> b0(nt + 1);
  for (int t = 0; t <= nt; ++t) b0[t] = n * t / nt;
  {
    std::vector<std::thread> th;
    for (int t = 0; t < nt; ++t)
      th.emplace_back([&, t]() {
        std::memcpy(buf + b0[t], keys + b0[t],
                    sizeof(int64_t) * static_cast<size_t>(b0[t + 1] - b0[t]));
        std::sort(buf + b0[t], buf + b0[t + 1]);
      });
    for (auto& x : th) x.join();
  }
  std::vector<int64_t> bnd(b0.begin(), b0.end());
  int runs = nt;
  while (runs > 1) {
    std::vector<std::thread> th;
    std::vector<int64_t> nb{0};
    for (int rp = 0; rp < runs; rp += 2) {
      const int64_t lo = bnd[rp], mid = bnd[rp + 1],
                    hi = (rp + 1 < runs) ? bnd[rp + 2] : mid;
      th.emplace_back([buf, buf2, lo, mid, hi]() {
        std::merge(buf + lo, buf + mid, buf + mid, buf + hi, buf2 + lo);
      });
      nb.push_back(hi);
    }
    for (auto& x : th) x.join();
    std::swap(buf, buf2);
    bnd = nb;
    runs = static_cast<int>(bnd.size()) - 1;
  }
  *out_n = std::unique(buf, buf + n) - buf;
  free(buf2);
  return buf;
}

void openea_buf_free(void* p) { free(p); }

// ---- batch Levenshtein-ratio matrix ---------------------------------------
//
// python-Levenshtein's ratio(a, b) equals (|a|+|b| - D2)/(|a|+|b|) with D2
// the edit distance under substitution cost 2, i.e. 2*LCS(a,b)/(|a|+|b|).
// IMUSE's unsupervised bootstrap scores every (value1, value2) pair of
// entities sharing an aligned attribute (reference imuse.py:42-100, an
// 8-way python pool); at 100K that is ~10^8 ratios and python-level
// looping costs hours where this threaded C++ LCS fills the full
// [m1, m2] matrix in seconds.  Strings arrive as one concatenated byte
// blob + offsets per side; out must hold m1*m2 floats.
namespace lcs_impl {

// plain row DP (any length)
inline int lcs_dp(const char* a, int la, const char* b, int lb,
                  std::vector<int32_t>& dp) {
  dp.assign(static_cast<size_t>(lb) + 1, 0);
  for (int x = 0; x < la; ++x) {
    int32_t diag = 0;
    const char ca = a[x];
    for (int y = 0; y < lb; ++y) {
      const int32_t up = dp[y + 1];
      dp[y + 1] = (ca == b[y]) ? diag + 1 : std::max(up, dp[y]);
      diag = up;
    }
  }
  return dp[lb];
}

// Allison-Dix bit-parallel LCS for |a| <= 64: row bits clear as matches
// accumulate; LCS = popcount of cleared bits.  ~5x the DP at the 6-12
// char value strings IMUSE scores (validated bit-exact vs the DP by
// tests/test_attr_family.py + the python-Levenshtein parity test).
inline int lcs_bits(const uint64_t* pm, int la, const char* b, int lb) {
  // la <= 63 only: with la == 64 the (r + u) carry out of bit 63 would
  // be lost where the algorithm needs it to propagate
  const uint64_t ones = (1ULL << la) - 1ULL;
  uint64_t r = ones;
  for (int y = 0; y < lb; ++y) {
    const uint64_t m = pm[static_cast<unsigned char>(b[y])];
    const uint64_t u = r & m;
    r = (r + u) | (r - u);
    r &= ones;
  }
  return la - __builtin_popcountll(r);
}

}  // namespace lcs_impl

void openea_lev_ratio_matrix(const char* blob1, const int64_t* off1,
                             int64_t m1, const char* blob2,
                             const int64_t* off2, int64_t m2, float* out) {
  int nt = static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > 8) nt = 8;
  if (m1 * m2 < 1 << 16) nt = 1;
  std::vector<std::thread> th;
  for (int t = 0; t < nt; ++t) {
    th.emplace_back([&, t]() {
      std::vector<int32_t> dp;
      uint64_t pm[256];
      for (int64_t i = m1 * t / nt; i < m1 * (t + 1) / nt; ++i) {
        const char* a = blob1 + off1[i];
        const int la = static_cast<int>(off1[i + 1] - off1[i]);
        const bool bits = la > 0 && la <= 63;
        if (bits) {
          std::memset(pm, 0, sizeof(pm));
          for (int x = 0; x < la; ++x)
            pm[static_cast<unsigned char>(a[x])] |= 1ULL << x;
        }
        for (int64_t j = 0; j < m2; ++j) {
          const char* b = blob2 + off2[j];
          const int lb = static_cast<int>(off2[j + 1] - off2[j]);
          if (la == 0 && lb == 0) {
            out[i * m2 + j] = 1.0f;   // Levenshtein.ratio('','') == 1.0
            continue;
          }
          const int lcs = bits ? lcs_impl::lcs_bits(pm, la, b, lb)
                               : lcs_impl::lcs_dp(a, la, b, lb, dp);
          out[i * m2 + j] = 2.0f * static_cast<float>(lcs) /
                            static_cast<float>(la + lb);
        }
      }
    });
  }
  for (auto& x : th) x.join();
}

// ---- IMUSE score accumulation ---------------------------------------------
//
// S[rowpos[i], colpos[j]] += M[rowval[i], colval[j]]; C[..] += 1 — the
// per-attribute block accumulation of _align_entities_vectorized.  The
// numpy np.ix_ formulation re-gathers and re-scatters multi-GB temps
// through this VM's ~1 GB/s single-thread memory path; threading rows
// here makes the whole accumulation memory-bound across cores.
void openea_imuse_accumulate(const float* M, int64_t m2u,
                             const int64_t* rowpos, const int64_t* rowval,
                             int64_t n_rows, const int64_t* colpos,
                             const int64_t* colval, int64_t n_cols,
                             float* S, int16_t* C, int64_t n2a) {
  int nt = static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > 8) nt = 8;
  if (n_rows * n_cols < 1 << 18) nt = 1;
  std::vector<std::thread> th;
  for (int t = 0; t < nt; ++t) {
    th.emplace_back([&, t]() {
      for (int64_t i = n_rows * t / nt; i < n_rows * (t + 1) / nt; ++i) {
        const float* mi = M + rowval[i] * m2u;
        float* si = S + rowpos[i] * n2a;
        int16_t* ci = C + rowpos[i] * n2a;
        for (int64_t j = 0; j < n_cols; ++j) {
          si[colpos[j]] += mi[colval[j]];
          ci[colpos[j]] += 1;
        }
      }
    });
  }
  for (auto& x : th) x.join();
}

// mean-of-counts + row argmax in one threaded pass: best_j[i], best_sim[i]
// = argmax_j / max_j of S[i,j]/C[i,j] over j with C[i,j] > 0 (-1 when a
// row has no candidates).  Ties keep the lowest j.  Replaces ~170 GB of
// numpy divide/mask/argmax passes over the IMUSE block slabs.
void openea_imuse_best(const float* S, const int16_t* C, int64_t n_rows,
                       int64_t n2a, int64_t* best_j, float* best_sim) {
  int nt = static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > 8) nt = 8;
  if (n_rows * n2a < 1 << 18) nt = 1;
  std::vector<std::thread> th;
  for (int t = 0; t < nt; ++t) {
    th.emplace_back([&, t]() {
      for (int64_t i = n_rows * t / nt; i < n_rows * (t + 1) / nt; ++i) {
        const float* si = S + i * n2a;
        const int16_t* ci = C + i * n2a;
        float best = -1.0f;
        int64_t bj = -1;
        for (int64_t j = 0; j < n2a; ++j) {
          if (ci[j] > 0) {
            const float v = si[j] / static_cast<float>(ci[j]);
            if (v > best) {
              best = v;
              bj = j;
            }
          }
        }
        best_j[i] = bj;
        best_sim[i] = best;
      }
    });
  }
  for (auto& x : th) x.join();
}

}  // extern "C"
