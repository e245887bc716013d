// SA-IS suffix array construction (Nong, Zhang & Chan, "Two Efficient
// Algorithms for Linear Time Suffix Array Construction", 2009) — our own
// implementation for the host construction toolchain, replacing the role of
// the reference's out-of-repo pfbwt-f builder (/root/reference/.gitmodules:7-9).
//
// Convention: the input text is mapped to values in [1, K); a unique sentinel 0
// is appended internally at each recursion level.  O(n) time, O(n) extra space.
// Templated on the index type: int32 for n < 2^31 (half the memory traffic of
// the induce passes — the hot loops are random-access bound), int64 beyond.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;

// T: values in [0, K), with T[n-1] == 0 the unique smallest sentinel.
// SA: output, size n.
template <class I>
void sais_rec(const I* T, I* SA, I n, I K) {
  if (n == 1) {
    SA[0] = 0;
    return;
  }
  std::vector<uint8_t> stype(n);
  stype[n - 1] = 1;
  for (I i = n - 2; i >= 0; --i)
    stype[i] = T[i] < T[i + 1] || (T[i] == T[i + 1] && stype[i + 1]);

  auto is_lms = [&](I i) { return i > 0 && stype[i] && !stype[i - 1]; };

  std::vector<I> C(K), B(K);
  for (I i = 0; i < n; ++i) C[T[i]]++;
  auto bkt_heads = [&] {
    I sum = 0;
    for (I k = 0; k < K; ++k) { B[k] = sum; sum += C[k]; }
  };
  auto bkt_tails = [&] {
    I sum = 0;
    for (I k = 0; k < K; ++k) { sum += C[k]; B[k] = sum; }
  };

  auto induce = [&](const std::vector<I>& lms_ordered) {
    std::fill(SA, SA + n, (I)-1);
    // place LMS suffixes at bucket tails, in the given order reversed
    bkt_tails();
    for (i64 t = (i64)lms_ordered.size() - 1; t >= 0; --t) {
      I p = lms_ordered[t];
      SA[--B[T[p]]] = p;
    }
    // induce L-type left to right
    bkt_heads();
    for (I i = 0; i < n; ++i) {
      I j = SA[i] - 1;
      if (SA[i] > 0 && !stype[j]) SA[B[T[j]]++] = j;
    }
    // induce S-type right to left
    bkt_tails();
    for (I i = n - 1; i >= 0; --i) {
      I j = SA[i] - 1;
      if (SA[i] > 0 && stype[j]) SA[--B[T[j]]] = j;
    }
  };

  // pass 1: LMS positions in text order
  std::vector<I> lms;
  lms.reserve(n / 2 + 1);
  for (I i = 1; i < n; ++i)
    if (is_lms(i)) lms.push_back(i);
  induce(lms);

  // collect LMS suffixes in their induced (sorted-by-LMS-substring) order
  std::vector<I> lms_sorted;
  lms_sorted.reserve(lms.size());
  for (I i = 0; i < n; ++i)
    if (is_lms(SA[i])) lms_sorted.push_back(SA[i]);

  // name LMS substrings
  i64 m = (i64)lms.size();
  std::vector<I> name_of(n, (I)-1);
  I names = 0;
  I prev = -1;
  for (i64 t = 0; t < m; ++t) {
    I p = lms_sorted[t];
    bool differ = (prev < 0);
    if (!differ) {
      // compare LMS substrings at prev and p (up to and including next LMS char)
      for (I d = 0;; ++d) {
        bool end_p = d > 0 && is_lms(p + d);
        bool end_q = d > 0 && is_lms(prev + d);
        if (p + d >= n || prev + d >= n || T[p + d] != T[prev + d] ||
            stype[p + d] != stype[prev + d]) {
          differ = true;
          break;
        }
        if (end_p || end_q) {
          differ = !(end_p && end_q);
          break;
        }
      }
    }
    if (differ) { ++names; prev = p; }
    name_of[p] = names - 1;
  }

  // order LMS suffixes
  std::vector<I> lms_final;
  if (names < m) {
    // recurse on the reduced string (in text order of LMS positions)
    std::vector<I> T1(m), SA1(m);
    for (i64 t = 0; t < m; ++t) T1[t] = name_of[lms[t]] + 1;
    // append sentinel: the LAST LMS position is the sentinel suffix (T[n-1]=0),
    // whose name is the unique smallest already; make it explicit:
    T1[m - 1] = 0;  // the sentinel LMS (position n-1) is always last in text order
    sais_rec<I>(T1.data(), SA1.data(), (I)m, names + 1);
    lms_final.resize(m);
    for (i64 t = 0; t < m; ++t) lms_final[t] = lms[SA1[t]];
  } else {
    lms_final = std::move(lms_sorted);
  }

  induce(lms_final);
}

template <class I>
void sais_u8_run(const uint8_t* t, i64* sa_out, i64 n) {
  std::vector<I> T(n + 1);
  for (i64 i = 0; i < n; ++i) T[i] = (I)t[i] + 1;
  T[n] = 0;
  std::vector<I> SA(n + 1);
  sais_rec<I>(T.data(), SA.data(), (I)(n + 1), (I)258);
  // SA[0] is the sentinel suffix
  for (i64 i = 0; i < n; ++i) sa_out[i] = (i64)SA[i + 1];
}

}  // namespace

extern "C" {

// Suffix array of a uint8 text (no sentinel required in the input; one is
// added internally, its SA entry dropped).  Returns 0 on success.
int rbt_sais_u8(const uint8_t* t, i64* sa_out, i64 n) {
  if (n <= 0) return 0;
  if (n + 1 < (i64)INT32_MAX)
    sais_u8_run<int32_t>(t, sa_out, n);
  else
    sais_u8_run<int64_t>(t, sa_out, n);
  return 0;
}

// Suffix array over an INTEGER alphabet (values in [0, K)) — the PFP parse
// string (construct/pfp.py).  A unique smallest sentinel is appended
// internally and its SA row dropped, exactly like rbt_sais_u8.
int rbt_sais_i32(const int32_t* t, i64* sa_out, i64 n, i64 K) {
  if (n <= 0) return 0;
  if (n + 1 < (i64)INT32_MAX && K + 2 < (i64)INT32_MAX) {
    std::vector<int32_t> T((size_t)(n + 1));
    for (i64 i = 0; i < n; ++i) T[(size_t)i] = t[i] + 1;
    T[(size_t)n] = 0;
    std::vector<int32_t> SA((size_t)(n + 1));
    sais_rec<int32_t>(T.data(), SA.data(), (int32_t)(n + 1), (int32_t)(K + 1));
    for (i64 i = 0; i < n; ++i) sa_out[i] = (i64)SA[(size_t)(i + 1)];
  } else {
    std::vector<i64> T((size_t)(n + 1));
    for (i64 i = 0; i < n; ++i) T[(size_t)i] = (i64)t[i] + 1;
    T[(size_t)n] = 0;
    std::vector<i64> SA((size_t)(n + 1));
    sais_rec<i64>(T.data(), SA.data(), n + 1, K + 1);
    for (i64 i = 0; i < n; ++i) sa_out[i] = SA[(size_t)(i + 1)];
  }
  return 0;
}
}
