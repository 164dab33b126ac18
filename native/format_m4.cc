// Bulk M4 overlap-line formatter (impl/MatchResult.java:98-113 layout).
//
// The repeat regime emits tens of millions of lines per run; Python
// %-formatting costs ~1.1us/line even zip-optimized, so the hot bench
// path hands the numeric columns to this snprintf loop (~0.1us/line).
// %.6f parity: both glibc printf and CPython's PyOS_double_to_string
// produce the correctly-rounded fixed-precision decimal of the exact
// binary value (round-half-even on exact ties), so the strings are
// byte-identical -- pinned by tests/test_format_native.py across
// adversarial 2^-k tie values.

#include <cstdio>
#include <cstdint>

extern "C" long long mhap_format_m4(
    const long long* qid, const long long* cid,
    const double* err, const double* raw,
    const int32_t* qrc, const long long* a1, const long long* a2,
    const long long* ql,
    const int32_t* crc, const long long* b1, const long long* b2,
    const long long* cl,
    long long n, char* out, long long cap) {
  // newline-separated lines; returns bytes written (excl. trailing
  // newline) or -1 on overflow
  long long pos = 0;
  for (long long i = 0; i < n; i++) {
    if (cap - pos < 192) return -1;
    int w = snprintf(
        out + pos, (size_t)(cap - pos),
        "%lld %lld %.6f %.6f %d %lld %lld %lld %d %lld %lld %lld\n",
        qid[i], cid[i], err[i], raw[i], (int)qrc[i], a1[i], a2[i], ql[i],
        (int)crc[i], b1[i], b2[i], cl[i]);
    if (w < 0) return -1;
    pos += w;
  }
  return pos > 0 ? pos - 1 : 0;  // drop the trailing newline
}
