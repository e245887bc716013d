// Single-thread CPU query engine over the rowbowt-tpu sorted tables.
//
// Two roles: (a) the honest CPU baseline for bench.py's vs_baseline ratio
// (equivalent work to the reference's rb_align count loop,
// /root/reference/src/rb_align.cpp:162-193, one read at a time), and (b) a
// host-side fallback engine for environments without an accelerator.

#include <algorithm>
#include <cstdint>

namespace {
using i64 = int64_t;

inline i64 run_of(const i64* rs, i64 R, i64 i) {
  return (i64)(std::upper_bound(rs, rs + R, i) - rs) - 1;
}

inline i64 rank(const i64* rs, i64 R, const i64* occ, const i64* F,
                const uint8_t* head, i64 n, i64 i, i64 c) {
  if (i >= n) return F[c + 1] - F[c];
  i64 r = run_of(rs, R, i);
  i64 v = occ[c * R + r];
  if (head[r] == (uint8_t)c) v += i - rs[r];
  return v;
}
}  // namespace

extern "C" {

// Batched count queries.  qcodes: int16 [nq, stride] right-aligned (pad=-1).
// Returns ranges in out_lo/out_hi with the (1,0) empty encoding.
void rbt_cpu_count(const i64* run_start, i64 R, const i64* occ_flat,
                   const i64* F, i64 A, const uint8_t* run_head, i64 n,
                   const int16_t* qcodes, const int32_t* qlens, i64 nq,
                   i64 stride, i64* out_lo, i64* out_hi) {
  for (i64 q = 0; q < nq; ++q) {
    i64 lo = 0, hi = n - 1;
    const int16_t* row = qcodes + q * stride;
    i64 m = qlens[q];
    for (i64 j = 0; j < m && lo <= hi; ++j) {
      i64 c = row[stride - 1 - j];
      if (c < 0 || c >= A) { lo = 1; hi = 0; break; }
      i64 before = rank(run_start, R, occ_flat, F, run_head, n, lo, c);
      i64 inside =
          rank(run_start, R, occ_flat, F, run_head, n, hi + 1, c) - before;
      if (inside <= 0) { lo = 1; hi = 0; break; }
      lo = F[c] + before;
      hi = lo + inside - 1;
    }
    out_lo[q] = lo;
    out_hi[q] = hi;
  }
}
}
