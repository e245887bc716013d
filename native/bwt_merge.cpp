// Incremental eBWT construction: insert one document into the BWT of a
// document collection by walking the document backward through the existing
// index (one rank query per character).  This replaces whole-text SA-IS for
// pangenome-scale construction — the role pfbwt-f's prefix-free parsing plays
// for the reference (/root/reference/README.md:37-44,
// /root/reference/scripts/vcf_to_rowbowt.sh): peak memory and time scale with
// one document, not the whole panel.
//
// Suffix order convention (construct/merge.py): suffixes stop at their
// document's end (shorter-is-smaller), ties between equal strings broken by
// document id.  BWT chars are the GLOBAL text predecessors, so a document-
// initial row carries the previous document's last char — a "phantom" for
// extension counting, corrected via the phantom row list.
//
// For each suffix D[j..) of the new document:
//   p[j] = #existing-suffixes < D[j..)
//        = F[c] + E[c] + rank_c(p[j+1]) - phantom_c(p[j+1]),  c = D[j]
// where F[c]   = #suffixes with first char < c (cumulative char counts),
//       E[c]   = #docs whose final 1-char suffix is exactly "c" (all earlier
//                docs tie-compare smaller),
//       rank_c = #c's in BWT[0..p) (real same-doc extensions + phantoms),
//       phantom_c = #doc-initial rows < p whose stored char is c.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {
using i64 = int64_t;
using u64 = uint64_t;

constexpr i64 BLK = 256;          // symbols per rank checkpoint
constexpr u64 NIB_LOW = 0x1111111111111111ULL;

inline u64 nibcount(u64 w, u64 pat) {
  u64 x = w ^ pat;
  u64 t = x | (x >> 1) | (x >> 2) | (x >> 3);
  return (u64)__builtin_popcountll(~t & NIB_LOW);
}

// Rank directory over a code sequence (codes < A <= 8): 4-bit packed words +
// per-block exclusive checkpoints.  Built once per inserted document, O(N).
struct RankDir {
  std::vector<u64> words;   // 16 codes per u64
  std::vector<i64> cnt;     // [A][nblk] exclusive
  i64 N, A, nblk;

  void build(const uint8_t* bwt, i64 n, i64 a) {
    N = n; A = a;
    nblk = (n + BLK - 1) / BLK + 1;
    words.assign((size_t)(nblk * (BLK / 16)), ~0ULL);  // pad nibble 15
    cnt.assign((size_t)(A * nblk), 0);
    std::vector<i64> run(A, 0);
    for (i64 b = 0; b * BLK < n || b == 0; ++b) {
      for (i64 c = 0; c < A; ++c) cnt[c * nblk + b] = run[c];
      i64 lo = b * BLK, hi = std::min(n, lo + BLK);
      for (i64 i = lo; i < hi; ++i) {
        uint8_t c = bwt[i];
        run[c]++;
        u64& w = words[(size_t)(i >> 4)];
        i64 sh = (i & 15) * 4;
        w = (w & ~(0xFULL << sh)) | ((u64)c << sh);
      }
      if (hi >= n) {
        for (i64 bb = b + 1; bb < nblk; ++bb)
          for (i64 c = 0; c < A; ++c) cnt[c * nblk + bb] = run[c];
        break;
      }
    }
  }

  // #codes == c in bwt[0, p)
  inline i64 rank(uint8_t c, i64 p) const {
    i64 b = p >> 8;
    i64 v = cnt[(size_t)(c * nblk + b)];
    u64 pat = (u64)c * NIB_LOW;
    i64 w0 = b << 4, wend = p >> 4;
    for (i64 w = w0; w < wend; ++w) v += (i64)nibcount(words[(size_t)w], pat);
    i64 k = p & 15;
    if (k) {
      u64 mask = (1ULL << (4 * k)) - 1;
      v += (i64)nibcount(words[(size_t)wend] | ~mask, pat & mask);
    }
    return v;
  }
};

}  // namespace

extern "C" {

// Insertion ranks for every suffix of `doc` against the existing collection
// BWT.  Arguments:
//   bwt[N]        existing eBWT codes (uint8 < A)
//   Fcum[A+1]     cumulative char counts of the existing collection
//   E[A]          #docs whose final suffix is the 1-char string c
//   ph_rows[n_ph] sorted row ids of doc-initial suffixes (phantom rows)
//   ph_chars[n_ph] stored (phantom) BWT char of each
//   doc[m]        the new document's codes (its LAST char ends the doc)
//   p_out[m]      OUT: p_out[j] = #existing suffixes < doc[j..)
// Returns 0 on success.
int rbt_ebwt_walk(const uint8_t* bwt, i64 N, i64 A, const i64* Fcum,
                  const i64* E, const i64* ph_rows, const uint8_t* ph_chars,
                  i64 n_ph, const uint8_t* doc, i64 m, i64* p_out) {
  if (m <= 0) return 0;
  RankDir rd;
  rd.build(bwt, N, A);
  // per-char sorted phantom row lists
  std::vector<std::vector<i64>> ph(A);
  for (i64 i = 0; i < n_ph; ++i) ph[ph_chars[i]].push_back(ph_rows[i]);
  for (auto& v : ph) std::sort(v.begin(), v.end());

  uint8_t c = doc[m - 1];
  i64 p = Fcum[c] + E[c];
  p_out[m - 1] = p;
  for (i64 j = m - 2; j >= 0; --j) {
    c = doc[j];
    i64 real = rd.rank(c, p);
    const auto& pv = ph[c];
    if (!pv.empty())
      real -= (i64)(std::upper_bound(pv.begin(), pv.end(), p - 1) - pv.begin());
    p = Fcum[c] + E[c] + real;
    p_out[j] = p;
  }
  return 0;
}

// Interleave `neu[m]` into `old[N]` at FINAL output positions ins[m]
// (strictly increasing): out[ins[r]] = neu[r], old elements keep order.
// memcpy between insertion points — the numpy boolean-mask formulation was
// the dominant cost of a chr-scale merge (~90s of 151s).
void rbt_interleave_u8(const uint8_t* old, i64 N, const i64* ins,
                       const uint8_t* neu, i64 m, uint8_t* out) {
  i64 src = 0, dst = 0;
  for (i64 r = 0; r < m; ++r) {
    i64 gap = ins[r] - dst;
    if (gap) { std::memcpy(out + dst, old + src, (size_t)gap); src += gap; dst += gap; }
    out[dst++] = neu[r];
  }
  if (N > src) std::memcpy(out + dst, old + src, (size_t)(N - src));
}

void rbt_interleave_i64(const i64* old, i64 N, const i64* ins, const i64* neu,
                        i64 m, i64* out) {
  i64 src = 0, dst = 0;
  for (i64 r = 0; r < m; ++r) {
    i64 gap = ins[r] - dst;
    if (gap) { std::memcpy(out + dst, old + src, (size_t)gap * 8); src += gap; dst += gap; }
    out[dst++] = neu[r];
  }
  if (N > src) std::memcpy(out + dst, old + src, (size_t)(N - src) * 8);
}

// uint32 variant: SA values for n < 2^32 (the u64 contract of
// toehold_sa.hpp:133-155 packs into 4 bytes below 4.3G — halves the merge's
// SA interleave traffic and the resident array at pangenome scale).
void rbt_interleave_u32(const uint32_t* old, i64 N, const i64* ins,
                        const uint32_t* neu, i64 m, uint32_t* out) {
  i64 src = 0, dst = 0;
  for (i64 r = 0; r < m; ++r) {
    i64 gap = ins[r] - dst;
    if (gap) { std::memcpy(out + dst, old + src, (size_t)gap * 4); src += gap; dst += gap; }
    out[dst++] = neu[r];
  }
  if (N > src) std::memcpy(out + dst, old + src, (size_t)(N - src) * 4);
}

// Single-thread CPU count over the two-level fused-block tables (the same
// arrays the n >= 2^31 device engine gathers; ops/rank.py rank_fblock2) —
// the honest equivalent-work CPU baseline for the "big" bench config.
void rbt_cpu_count_fb2(const int32_t* fb2, i64 nb_pad, i64 per_blk,
                       const i64* base, i64 n_sup, const i64* Fcum, i64 A,
                       i64 n, const int16_t* qcodes, const int32_t* qlens,
                       i64 nq, i64 stride, i64* out_lo, i64* out_hi) {
  auto rank = [&](i64 i, i64 c) -> i64 {
    if (i >= n) return Fcum[c + 1] - Fcum[c];
    i64 blk = i >> 7;
    const int32_t* row = fb2 + blk * 24;
    i64 v = row[c];
    u64 pat = (u64)c * NIB_LOW;
    const u64* w = (const u64*)(row + 8);
    i64 off = i & 127;             // symbols below off within the block
    i64 full = off >> 4;           // whole u64 words (16 symbols each)
    for (i64 t = 0; t < full; ++t) v += (i64)nibcount(w[t], pat);
    i64 k = off & 15;
    if (k) {
      u64 mask = (1ULL << (4 * k)) - 1;
      v += (i64)nibcount(w[full] | ~mask, pat & mask);
    }
    return v + base[(blk / per_blk) * 8 + c];
  };
  for (i64 q = 0; q < nq; ++q) {
    i64 lo = 0, hi = n - 1;
    const int16_t* row = qcodes + q * stride;
    i64 m = qlens[q];
    for (i64 j = 0; j < m && lo <= hi; ++j) {
      i64 c = row[stride - 1 - j];
      if (c < 0 || c >= A) { lo = 1; hi = 0; break; }
      i64 before = rank(lo, c);
      i64 inside = rank(hi + 1, c) - before;
      if (inside <= 0) { lo = 1; hi = 0; break; }
      lo = Fcum[c] + before;
      hi = lo + inside - 1;
    }
    out_lo[q] = lo;
    out_hi[q] = hi;
  }
}
}
