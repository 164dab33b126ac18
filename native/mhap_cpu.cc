// Multithreaded CPU implementation of the MHAP overlap pipeline.
//
// Purpose (two-fold):
//  1. The honest performance baseline for bench.py: the reference is a
//     multithreaded Java program (impl/AbstractMatchSearch.java:121-199
//     work-stealing over Runtime.availableProcessors() threads); no JVM
//     exists in this image, so this binary is the closest stand-in -- the
//     same algorithm, same data structures (per-position hash tables,
//     per-query vote maps, sequential merge-automaton scorer), compiled
//     native code, all host cores.
//  2. An independently written differential implementation: this file was
//     produced from the Java sources (file:line cites below), NOT from the
//     Python oracle, so agreement of {this binary} == {oracle} == {device
//     pipeline} on the same input is evidence each was derived correctly.
//
// Parity targets:
//   sketch/MinHashSketch.java:51-179      (weighted minhash, xorshift)
//   sketch/BottomOverlapSketch.java       (bottom-k sketch + 2-pass scorer)
//   impl/MinHashSearch.java:100-251       (LSH index, vote, suppression)
//   impl/SequenceSketchStreamer.java      (fwd/rev enqueue + skip rules)
//   impl/MatchResult.java                 (coordinate flips + formatting)
//
// Build: make -C native   (links murmur3.c)
// Usage: mhap_cpu -s reads.fa [--num-threads N] [flag overrides] > out.m4

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include "scorer.h"

extern "C" {
void mhap_kmer_hashes_128(const uint8_t *seq, int len, int k, uint32_t seed,
                          uint64_t *out_h1);
void mhap_kmer_hashes_32(const uint8_t *seq, int len, int k, uint32_t seed,
                         uint32_t *out);
}

namespace {

struct Params {
  int kmer_size = 16;
  int num_hashes = 512;
  int num_min_matches = 3;
  double threshold = 0.78;
  int ordered_kmer_size = 12;
  int ordered_sketch_size = 1536;
  double max_shift = 0.2;
  int min_store_length = 0;
  int min_olap_length = 116;
  double repeat_weight = 0.9;
  int num_threads = (int)std::thread::hardware_concurrency();
};

std::string reverse_complement(const std::string &s);

// tf-idf k-mer filter (sketch/FrequencyCounts.java:100-186,290-311).
// Only the weight path used by default runs is implemented (offset =
// repeat_weight, removeUnique=0, tf on, range=3.0, canonicalized
// k-mers); keys are the murmur3_128 h1 of the canonical k-mer string,
// the same hash the sketch stage uses for sequence k-mers.
struct FreqFilter {
  std::unordered_map<uint64_t, double> sidf;  // key -> scaledIdf (precomp)
  double range = 3.0;
  bool loaded = false;
};

uint64_t kmer_string_hash(const std::string &kmer) {
  std::string canon = kmer;
  std::string rc = reverse_complement(kmer);
  if (rc < canon) canon = rc;
  uint64_t h1;
  mhap_kmer_hashes_128((const uint8_t *)canon.data(), (int)canon.size(),
                       (int)canon.size(), 0, &h1);
  return h1;
}

void load_filter(const std::string &path, double cutoff, double offset,
                 FreqFilter *F) {
  std::ifstream f(path);
  if (!f) {
    std::cerr << "cannot open filter file " << path << "\n";
    exit(1);
  }
  std::string line;
  std::getline(f, line);  // header: bloomSize repeatCount (bloom unused)
  std::vector<std::pair<uint64_t, double>> rows;
  double max_value = -1.0;
  while (std::getline(f, line)) {
    std::istringstream iss(line);
    std::string kmer;
    double frac;
    if (!(iss >> kmer >> frac)) continue;
    if (frac >= cutoff) {
      rows.emplace_back(kmer_string_hash(kmer), frac);
      max_value = std::max(max_value, frac);
    }
  }
  F->loaded = true;
  if (rows.empty()) return;  // no k-mer above cutoff: all weights = tf
  // idfFreq(f) = log(maxValue/f - offset); scaledIdf maps [minIdf,
  // maxIdf] onto [1, range] (FrequencyCounts.java:290-311)
  double min_value = cutoff;
  double min_idf = std::log(max_value / max_value - offset);
  double max_idf = std::log(max_value / min_value - offset);
  double scale = (max_idf - min_idf) / (F->range - 1.0);
  for (auto &kv : rows) {
    double idf = std::log(max_value / kv.second - offset);
    F->sidf[kv.first] = 1.0 + (idf - min_idf) / scale;
  }
}

// The oriented-read Sketch struct and the stage-2 scorer live in
// scorer.h (shared with the FFI differential-test entry).
using mhap::ScoreParams;
using mhap::Sketch;
using mhap::get_overlap_info;

// ---------------- sequence utilities ----------------

std::string reverse_complement(const std::string &s) {
  static uint8_t table[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; i++) table[i] = (uint8_t)i;
    const char *a = "ACMRWSVHNTGKYWSBDN";
    const char *b = "TGKYWSBDNACMRWSVHN";
    for (int i = 0; a[i]; i++) table[(uint8_t)a[i]] = (uint8_t)b[i];
    init = true;
  }
  std::string out(s.rbegin(), s.rend());
  for (auto &c : out) c = (char)table[(uint8_t)c];
  return out;
}

// ---------------- sketch construction ----------------

// Weighted minhash (MinHashSketch.java:51-179): per-kmer occurrence counts
// in first-occurrence order, weight = count (tf mode, the default when no
// filter file is given) or 1 (legacy repeatWeight<0), then per unique kmer
// one continuous xorshift stream consumed `weight` steps per hash word with
// signed-64 strict-less min; stored value is the winning kmer's low/high
// 32 bits by word parity.
bool weighted_minhash(const uint64_t *hashes, int n, const Params &P,
                      const FreqFilter &F, std::vector<int32_t> *out) {
  std::unordered_map<uint64_t, int32_t> index;
  index.reserve((size_t)n * 2);
  std::vector<uint64_t> keys;
  std::vector<int32_t> counts;
  keys.reserve(n);
  counts.reserve(n);
  for (int i = 0; i < n; i++) {
    auto it = index.find(hashes[i]);
    if (it == index.end()) {
      index.emplace(hashes[i], (int32_t)keys.size());
      keys.push_back(hashes[i]);
      counts.push_back(1);
    } else {
      counts[it->second]++;
    }
  }
  if (keys.empty()) return false;

  const int H = P.num_hashes;
  out->assign(H, 0);
  std::vector<int64_t> best(H, INT64_MAX);
  int number_valid = 0;
  for (size_t u = 0; u < keys.size(); u++) {
    uint64_t key = keys[u];
    int weight = counts[u];
    if (P.repeat_weight < 0.0) {
      // legacy mode: popular k-mers dropped, everything else weight 1
      // (MinHashSketch.java:103-109)
      if (F.loaded && F.sidf.count(key)) continue;
      weight = 1;
    } else if (F.loaded && P.repeat_weight < 1.0) {
      // tf-idf: Java double product + Math.round == floor(x + 0.5),
      // clamped to >= 1 (MinHashSketch.java:110-123)
      auto it = F.sidf.find(key);
      double s = (it == F.sidf.end()) ? F.range : it->second;
      int64_t w = (int64_t)std::floor((double)weight * s + 0.5);
      weight = (int)std::max<int64_t>(1, w);
    }
    if (weight <= 0) continue;
    number_valid++;
    uint64_t x = key;
    for (int word = 0; word < H; word++) {
      int64_t *b = &best[word];
      for (int c = 0; c < weight; c++) {
        x ^= x << 21;
        x ^= x >> 35;
        x ^= x << 4;
        if ((int64_t)x < *b) {
          *b = (int64_t)x;
          (*out)[word] = (word % 2 == 0) ? (int32_t)(uint32_t)key
                                         : (int32_t)(uint32_t)(key >> 32);
        }
      }
    }
  }
  return number_valid > 0;
}

// Bottom-k (hash,pos) sketch (BottomOverlapSketch.java:525-559): stable
// sort by signed hash (fastutil radixSortIndirect is stable), keep bottom
// min(sketchSize, n).
void bottom_sketch(const uint32_t *hashes, int n, int sketch_size,
                   std::vector<int32_t> *oh, std::vector<int32_t> *op) {
  std::vector<int32_t> idx(n);
  for (int i = 0; i < n; i++) idx[i] = i;
  std::stable_sort(idx.begin(), idx.end(), [&](int32_t a, int32_t b) {
    return (int32_t)hashes[a] < (int32_t)hashes[b];
  });
  int m = std::min(sketch_size, n);
  oh->resize(m);
  op->resize(m);
  for (int i = 0; i < m; i++) {
    (*oh)[i] = (int32_t)hashes[idx[i]];
    (*op)[i] = idx[i];
  }
}

void build_sketch(const std::string &seq, const Params &P,
                  const FreqFilter &F, Sketch *sk) {
  int len = (int)seq.size();
  sk->length = len;
  int n1 = len - P.kmer_size + 1;
  int n2 = len - P.ordered_kmer_size + 1;
  if (n1 < 1 || n2 < 1) {
    sk->valid = false;
    return;
  }
  std::vector<uint64_t> h128(n1);
  mhap_kmer_hashes_128((const uint8_t *)seq.data(), len, P.kmer_size, 0,
                       h128.data());
  sk->valid = weighted_minhash(h128.data(), n1, P, F, &sk->minhash);
  if (!sk->valid) return;
  std::vector<uint32_t> h32(n2);
  mhap_kmer_hashes_32((const uint8_t *)seq.data(), len, P.ordered_kmer_size,
                      0, h32.data());
  bottom_sketch(h32.data(), n2, P.ordered_sketch_size, &sk->oh, &sk->op);
  sk->num_kmers = n2;
}

// ---------------- LSH index + match driving ----------------

struct Index {
  // one value->rows table per hash position (MinHashSearch.java:85-92)
  std::vector<std::unordered_map<int32_t, std::vector<int32_t>>> tables;
};

void build_index(const std::vector<Sketch> &store, const Params &P,
                 Index *idx) {
  idx->tables.resize(P.num_hashes);
  std::atomic<int> next_table{0};
  auto worker = [&]() {
    int t;
    while ((t = next_table.fetch_add(1)) < P.num_hashes) {
      auto &tab = idx->tables[t];
      for (int32_t r = 0; r < (int32_t)store.size(); r++)
        tab[store[r].minhash[t]].push_back(r);
    }
  };
  std::vector<std::thread> threads;
  for (int i = 0; i < P.num_threads; i++) threads.emplace_back(worker);
  for (auto &th : threads) th.join();
}

// Vote + suppression + scoring for one query row (MinHashSearch:149-251).
void find_matches(const std::vector<Sketch> &store, const Index &idx,
                  int32_t q, const Params &P, std::vector<std::string> *out) {
  const Sketch &qs = store[q];
  std::unordered_map<int32_t, int32_t> votes;
  votes.reserve(256);
  for (int t = 0; t < P.num_hashes; t++) {
    auto it = idx.tables[t].find(qs.minhash[t]);
    if (it == idx.tables[t].end()) continue;
    for (int32_t r : it->second) votes[r]++;
  }
  char buf[256];
  for (auto &kv : votes) {
    int32_t c = kv.first;
    const Sketch &cs = store[c];
    if (cs.hid == qs.hid) continue;
    if (kv.second < P.num_min_matches) continue;
    int msl = P.min_store_length;
    if (cs.length < msl && qs.length < msl) continue;
    if (cs.hid > qs.hid && cs.length >= msl && qs.length >= msl) continue;
    if (cs.length < msl && qs.length >= msl) continue;
    double score, raw;
    int a1, a2, b1, b2;
    ScoreParams sp{P.ordered_kmer_size, P.max_shift};
    if (!get_overlap_info(qs, cs, sp, &score, &raw, &a1, &a2, &b1, &b2))
      continue;
    if (score < P.threshold) continue;
    // MatchResult coordinate flips + formatting (MatchResult.java:54-113)
    int fa1 = qs.fwd ? a1 : qs.length - a2 - 1;
    int fa2 = qs.fwd ? a2 : qs.length - a1 - 1;
    int fb1 = cs.fwd ? b1 : cs.length - b2 - 1;
    int fb2 = cs.fwd ? b2 : cs.length - b1 - 1;
    double sc = std::min(score, 1.0);
    snprintf(buf, sizeof(buf), "%lld %lld %.6f %.6f %d %d %d %d %d %d %d %d",
             (long long)qs.hid, (long long)cs.hid, 1.0 - sc, raw,
             qs.fwd ? 0 : 1, fa1, fa2, qs.length, cs.fwd ? 0 : 1, fb1, fb2,
             cs.length);
    out->push_back(buf);
  }
}

// ---------------- FASTA + main ----------------

void read_fasta(const std::string &path, std::vector<std::string> *reads) {
  std::ifstream f(path);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    exit(1);
  }
  std::string line, cur;
  bool have = false;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty()) continue;
    if (line[0] == '>') {
      if (have) reads->push_back(cur);
      cur.clear();
      have = true;
    } else {
      for (char ch : line) cur.push_back((char)std::toupper((uint8_t)ch));
    }
  }
  if (have) reads->push_back(cur);
}

}  // namespace

int main(int argc, char **argv) {
  Params P;
  std::string fasta;
  std::string filter_path;
  double filter_cutoff = 1e-5;  // MHAP --filter-threshold default
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&](void) -> std::string {
      if (i + 1 >= argc) { std::cerr << "missing value for " << a << "\n"; exit(1); }
      return argv[++i];
    };
    if (a == "-s") fasta = next();
    else if (a == "-f") filter_path = next();
    else if (a == "--filter-threshold") filter_cutoff = std::stod(next());
    else if (a == "-k") P.kmer_size = std::stoi(next());
    else if (a == "--num-hashes") P.num_hashes = std::stoi(next());
    else if (a == "--num-min-matches") P.num_min_matches = std::stoi(next());
    else if (a == "--threshold") P.threshold = std::stod(next());
    else if (a == "--ordered-kmer-size") P.ordered_kmer_size = std::stoi(next());
    else if (a == "--ordered-sketch-size") P.ordered_sketch_size = std::stoi(next());
    else if (a == "--max-shift") P.max_shift = std::stod(next());
    else if (a == "--min-store-length") P.min_store_length = std::stoi(next());
    else if (a == "--min-olap-length") P.min_olap_length = std::stoi(next());
    else if (a == "--repeat-weight") P.repeat_weight = std::stod(next());
    else if (a == "--num-threads") P.num_threads = std::stoi(next());
    else { std::cerr << "unknown flag " << a << "\n"; return 1; }
  }
  if (fasta.empty()) {
    std::cerr << "usage: mhap_cpu -s reads.fa [flags] > out.m4\n";
    return 1;
  }
  if (P.num_threads < 1) P.num_threads = 1;

  FreqFilter F;
  if (!filter_path.empty())
    load_filter(filter_path, filter_cutoff, P.repeat_weight, &F);

  std::vector<std::string> reads;
  read_fasta(fasta, &reads);

  // enqueue fwd + rev entries with the streamer's skip rules
  // (SequenceSketchStreamer.java:123-177)
  struct Entry { int64_t hid; bool fwd; std::string seq; };
  std::vector<Entry> entries;
  for (size_t i = 0; i < reads.size(); i++) {
    int64_t hid = (int64_t)i + 1;
    if ((int)reads[i].size() < P.min_olap_length) continue;
    entries.push_back({hid, true, reads[i]});
    entries.push_back({hid, false, reverse_complement(reads[i])});
  }

  // phase 1: parallel sketching
  std::vector<Sketch> sk(entries.size());
  {
    std::atomic<size_t> next{0};
    auto worker = [&]() {
      size_t j;
      while ((j = next.fetch_add(1)) < entries.size()) {
        sk[j].hid = entries[j].hid;
        sk[j].fwd = entries[j].fwd;
        build_sketch(entries[j].seq, P, F, &sk[j]);
      }
    };
    std::vector<std::thread> threads;
    for (int i = 0; i < P.num_threads; i++) threads.emplace_back(worker);
    for (auto &th : threads) th.join();
  }
  // zero-ngram skip rules: fwd fails -> drop both; rev fails -> keep fwd
  std::vector<Sketch> store;
  store.reserve(sk.size());
  for (size_t j = 0; j < sk.size(); j++) {
    if (sk[j].fwd) {
      if (!sk[j].valid) {
        if (j + 1 < sk.size() && sk[j + 1].hid == sk[j].hid) j++;  // skip rev
        continue;
      }
      store.push_back(std::move(sk[j]));
    } else if (sk[j].valid) {
      store.push_back(std::move(sk[j]));
    }
  }

  // phase 2: index build
  Index idx;
  build_index(store, P, &idx);

  // phase 3: parallel query over forward rows (self-overlap semantics)
  std::vector<int32_t> fwd_rows;
  for (int32_t r = 0; r < (int32_t)store.size(); r++)
    if (store[r].fwd) fwd_rows.push_back(r);
  std::vector<std::vector<std::string>> per_query(fwd_rows.size());
  {
    std::atomic<size_t> next{0};
    auto worker = [&]() {
      size_t j;
      while ((j = next.fetch_add(1)) < fwd_rows.size())
        find_matches(store, idx, fwd_rows[j], P, &per_query[j]);
    };
    std::vector<std::thread> threads;
    for (int i = 0; i < P.num_threads; i++) threads.emplace_back(worker);
    for (auto &th : threads) th.join();
  }

  std::ostringstream out;
  size_t n_matches = 0;
  for (auto &lines : per_query)
    for (auto &l : lines) {
      out << l << "\n";
      n_matches++;
    }
  std::fwrite(out.str().data(), 1, out.str().size(), stdout);
  std::cerr << "Total matches found: " << n_matches << "\n";
  return 0;
}
