// Stage-2 scorer: sequential merge automaton, ported from
// sketch/BottomOverlapSketch.java (MatchData :64-298, recordMatchingKmers
// :397-516, getOverlapInfo :592-630, computeKBottomSketchJaccard :304-364).
// Shared between the standalone pipeline (mhap_cpu.cc) and the FFI entry
// (scorer_ffi.cc) used by the Python differential fuzz tests.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace mhap {

struct Sketch {
  int64_t hid = 0;
  bool fwd = true;
  int32_t length = 0;
  int32_t num_kmers = 0;               // seqLen - orderedK + 1
  std::vector<int32_t> minhash;        // [H]
  std::vector<int32_t> oh, op;         // ordered (hash, pos), sorted by hash
  bool valid = false;                  // false => zero n-grams
};

struct ScoreParams {
  int ordered_kmer_size = 12;
  double max_shift = 0.2;
};

// Java int wraparound (well-defined; signed overflow in C++ is UB)
static inline int w32(int64_t x) { return (int32_t)(uint32_t)(uint64_t)x; }

struct MatchData {
  int seq_len1, seq_len2;
  double max_shift_percent;
  std::vector<int32_t> pos1, pos2, shift;
  int median_shift = 0;
  int abs_max_shift = 0;
  bool need_recompute = true;

  MatchData(int l1, int l2, double msp)
      : seq_len1(l1), seq_len2(l2), max_shift_percent(msp) {}

  void reset() {
    pos1.clear();
    pos2.clear();
    shift.clear();
    need_recompute = true;
  }
  void record(int p1, int p2, int s) {
    pos1.push_back(p1);
    pos2.push_back(p2);
    shift.push_back(s);
    need_recompute = true;
  }
  void update() {
    if (!need_recompute) return;
    int count = (int)shift.size();
    if (count > 0) {
      // Utils.quickSelect(copy, count/2, count): k-th smallest, upper median
      std::vector<int32_t> tmp(shift);
      std::nth_element(tmp.begin(), tmp.begin() + count / 2, tmp.end());
      median_shift = tmp[count / 2];
      int left = std::max(0, w32(-(int64_t)median_shift));
      int right = std::min(seq_len1, w32((int64_t)seq_len2 - median_shift));
      int overlap_size = std::max(10, w32((int64_t)right - left));
      abs_max_shift = std::min(std::max(seq_len1, seq_len2),
                               (int)((double)overlap_size * max_shift_percent));
    } else {
      median_shift = 0;
      abs_max_shift = w32((int64_t)std::max(seq_len1, seq_len2) + 1);
    }
    need_recompute = false;
  }
  int v1l() { update(); return std::max(0, w32(-(int64_t)median_shift - abs_max_shift)); }
  int v1u() { update(); return std::min(seq_len1, w32((int64_t)seq_len2 - median_shift + abs_max_shift)); }
  int v2l() { update(); return std::max(0, w32((int64_t)median_shift - abs_max_shift)); }
  int v2u() { update(); return std::min(seq_len2, w32((int64_t)seq_len1 + median_shift + abs_max_shift)); }

  void optimize_shifts() {
    if (shift.empty()) return;
    update();
    int med = median_shift;
    int rc = -1;
    for (size_t i = 0; i < shift.size(); i++) {
      if (rc >= 0 && pos1[rc] == pos1[i]) {
        if (std::abs(shift[rc] - med) > std::abs(shift[i] - med)) {
          pos1[rc] = pos1[i];
          pos2[rc] = pos2[i];
          shift[rc] = shift[i];
        }
      } else {
        rc++;
        pos1[rc] = pos1[i];
        pos2[rc] = pos2[i];
        shift[rc] = shift[i];
      }
    }
    pos1.resize(rc + 1);
    pos2.resize(rc + 1);
    shift.resize(rc + 1);
    need_recompute = true;
  }

  // returns valid count, or 0 if < 3; fills a1..b2 via UMVU estimators
  int compute_edges(int *a1, int *a2, int *b1, int *b2) {
    update();
    int l1 = INT32_MAX, l2 = INT32_MAX, r1 = INT32_MIN, r2 = INT32_MIN;
    int valid = 0;
    for (size_t i = 0; i < shift.size(); i++) {
      if (std::abs(shift[i] - median_shift) > abs_max_shift) continue;
      l1 = std::min(l1, pos1[i]);
      l2 = std::min(l2, pos2[i]);
      r1 = std::max(r1, pos1[i]);
      r2 = std::max(r2, pos2[i]);
      valid++;
    }
    if (valid < 3) return 0;
    int n = valid;
    // Java: (int) Math.round((double)(n*lo - hi) / (n-1)); the subtraction
    // wraps in int32 before the double divide (BottomOverlapSketch:131-134)
    auto umvu = [n](int lo, int hi) {
      int32_t num = (int32_t)((int64_t)n * lo - hi);
      return (int)std::floor((double)num / (double)(n - 1) + 0.5);
    };
    *a1 = std::max(0, umvu(l1, r1));
    *a2 = std::min(seq_len1, umvu(r1, l1));
    *b1 = std::max(0, umvu(l2, r2));
    *b2 = std::min(seq_len2, umvu(r2, l2));
    return valid;
  }
};

void record_matching_kmers(MatchData &md, const Sketch &s1, const Sketch &s2) {
  md.update();
  int median = md.median_shift, abs_max = md.abs_max_shift;
  int v1l = md.v1l(), v1u = md.v1u(), v2l = md.v2l(), v2u = md.v2u();
  int n1 = (int)s1.oh.size(), n2 = (int)s2.oh.size();
  int i1 = 0, i2 = 0;
  md.reset();
  while (i1 < n1 && i2 < n2) {
    int hash1 = s1.oh[i1], pos1 = s1.op[i1];
    int hash2 = s2.oh[i2], pos2 = s2.op[i2];
    if (hash1 < hash2 || pos1 < v1l || pos1 >= v1u) {
      i1++;
    } else if (hash2 < hash1 || pos2 < v2l || pos2 >= v2u) {
      i2++;
    } else {
      int curr_shift = pos2 - pos1;
      int diff = curr_shift - median;
      if (diff > abs_max) {
        i1++;
      } else if (diff < -abs_max) {
        i2++;
      } else {
        md.record(pos1, pos2, curr_shift);
        // extend both cursors to the last consecutive same-hash entry with
        // a valid position ("symmetry for reverse compliment")
        int i1_last = i1;
        for (int t = i1 + 1;
             t < n1 && s1.oh[t] == hash1 && s1.op[t] >= v1l && s1.op[t] < v1u;
             t++)
          i1_last = t;
        int i2_last = i2;
        for (int t = i2 + 1;
             t < n2 && s2.oh[t] == hash2 && s2.op[t] >= v2l && s2.op[t] < v2u;
             t++)
          i2_last = t;
        if (i1 != i1_last || i2 != i2_last) {
          int p1n = s1.op[i1_last], p2n = s2.op[i2_last];
          md.record(p1n, p2n, p2n - p1n);
          i1 = i1_last + 1;
          i2 = i2_last + 1;
        } else {
          i1++;
          i2++;
        }
      }
    }
  }
}

double bottom_k_jaccard(const Sketch &s1, const Sketch &s2, int a1, int a2,
                        int b1, int b2) {
  std::vector<int32_t> f1, f2;
  for (size_t i = 0; i < s1.oh.size(); i++)
    if (s1.op[i] >= a1 && s1.op[i] <= a2) f1.push_back(s1.oh[i]);
  for (size_t j = 0; j < s2.oh.size(); j++)
    if (s2.op[j] >= b1 && s2.op[j] <= b2) f2.push_back(s2.oh[j]);
  int k = (int)std::min(f1.size(), f2.size());
  if (k == 0) return 0.0;
  int i = 0, j = 0, inter = 0, uni = 0;
  while (uni < k) {
    if (f1[i] < f2[j]) {
      i++;
    } else if (f1[i] > f2[j]) {
      j++;
    } else {
      inter++;
      i++;
      j++;
    }
    uni++;
  }
  return (double)inter / (double)k;
}

double jaccard_to_identity(double score, int kmer_size) {
  double d = -1.0 / (double)kmer_size * std::log(2.0 * score / (1.0 + score));
  return std::exp(-d);
}

// Full getOverlapInfo (:592-630).  Returns false => EMPTY.
bool get_overlap_info(const Sketch &s1, const Sketch &s2, const ScoreParams &P,
                      double *score, double *raw, int *a1, int *a2, int *b1,
                      int *b2) {
  MatchData md(s1.num_kmers, s2.num_kmers, P.max_shift);
  record_matching_kmers(md, s1, s2);
  if (md.shift.empty()) return false;
  record_matching_kmers(md, s1, s2);
  if (md.shift.empty()) return false;
  md.optimize_shifts();
  if (md.shift.empty()) return false;
  int valid = md.compute_edges(a1, a2, b1, b2);
  if (valid == 0) return false;
  double j = bottom_k_jaccard(s1, s2, *a1, *a2, *b1, *b2);
  *score = jaccard_to_identity(j, P.ordered_kmer_size);
  *raw = (double)valid;
  return true;
}


}  // namespace mhap
