// Prefix-free parsing (PFP) BWT construction for pangenome panels.
//
// The reference outsources pangenome-scale construction to pfbwt-f
// (/root/reference/README.md:37-44, scripts/vcf_to_rowbowt.sh:9-10) precisely
// because whole-text suffix sorting at panel scale is infeasible; prefix-free
// parsing (Boucher et al. 2019) makes construction cost scale with the
// PARSE + DICTIONARY instead of the text.  For a panel of near-identical
// haplotypes the dictionary is ~(reference + one phrase per variant) and the
// parse is n / avg-phrase-len, so a 10^10-symbol panel builds in minutes.
// This is an independent implementation driven by rowbowt_tpu/construct/pfp.py
// (the pfbwt-f submodule is empty in the reference checkout; nothing here is
// derived from it).
//
// Conventions (construct/pfp.py mirrors these):
//   * A text position i in [0, n-w] is a TRIGGER when the Karp-Rabin hash of
//     T[i..i+w) is 0 mod p.  Phrases run from trigger to next-trigger + w
//     (consecutive phrases overlap by w chars); the first phrase starts at 0,
//     the final phrase runs to n and is padded with w 0x00 sentinels (0x00 is
//     smaller than every text byte and never occurs in real text).
//   * Position i belongs to the phrase occurrence whose [start, next-start)
//     half-open span contains it; its phrase suffix has length > w.  Distinct
//     phrase suffixes of length > w are PREFIX-FREE (an internal trigger
//     window would have split the phrase), so sorting T's suffixes factors
//     into (a) sorting distinct phrase suffixes as strings and (b) ordering
//     equal phrase suffixes by the rank of the parse suffix that FOLLOWS the
//     occurrence (the "key": inverse parse-SA at t+1).
//   * The sweep walks dictionary-SA order, groups equal phrase suffixes (via
//     Kasai LCP), and emits the BWT as runs.  SA values (Tstart[occ] + offset)
//     are resolved ONLY at run boundaries, marker probes, and watched rows —
//     O(R + M), never O(n).
//
// Output contract is byte-identical to BigIndex.from_codes +
// attach_locate/attach_markers run over the whole-text suffix array
// (tests/test_pfp.py proves equality at oracle scale).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

using i64 = int64_t;
using u64 = uint64_t;
using u32 = uint32_t;
using u8 = uint8_t;

constexpr u64 KR_BASE = 0x100000001b3ULL;  // odd 64-bit polynomial base

// ---------------------------------------------------------------- parser ----

struct Parser {
  i64 w;
  u64 pmod;
  // rolling window state
  std::vector<u8> ring;  // last w bytes, ring buffer
  i64 fed = 0;           // total real bytes fed
  u64 hash = 0;
  u64 basew = 1;  // KR_BASE^w
  // current phrase bytes since its start (includes the leading trigger window)
  std::vector<u8> cur;
  // dictionary: arena + open-addressing hash (64-bit content hash, compare on
  // collision)
  std::vector<u8> arena;
  std::vector<i64> poff;  // arena offset per phrase id (insertion order)
  std::vector<i64> plen;
  std::vector<u32> slot_id;   // hash table: phrase id + 1 (0 = empty)
  std::vector<u64> slot_h;
  u64 mask = 0;
  std::vector<u32> parse;  // phrase ids in text order (insertion-order ids)

  Parser(i64 w_, u64 p_) : w(w_), pmod(p_) {
    ring.assign((size_t)w, 0);
    for (i64 i = 0; i < w; ++i) basew *= KR_BASE;
    grow_table(1 << 16);
  }

  void grow_table(size_t cap) {
    std::vector<u32> ni(cap, 0);
    std::vector<u64> nh(cap, 0);
    u64 nm = cap - 1;
    for (size_t s = 0; s < slot_id.size(); ++s) {
      if (!slot_id[s]) continue;
      u64 q = slot_h[s] & nm;
      while (ni[q]) q = (q + 1) & nm;
      ni[q] = slot_id[s];
      nh[q] = slot_h[s];
    }
    slot_id.swap(ni);
    slot_h.swap(nh);
    mask = nm;
  }

  static u64 content_hash(const u8* p, i64 len) {
    u64 h = 0xcbf29ce484222325ULL;
    for (i64 i = 0; i < len; ++i) h = (h ^ p[i]) * 0x100000001b3ULL;
    return h ^ (u64)len;
  }

  u32 intern(const u8* p, i64 len) {
    u64 h = content_hash(p, len);
    u64 q = h & mask;
    while (slot_id[q]) {
      if (slot_h[q] == h) {
        u32 id = slot_id[q] - 1;
        if (plen[id] == len && !memcmp(arena.data() + poff[id], p, (size_t)len))
          return id;
      }
      q = (q + 1) & mask;
    }
    u32 id = (u32)poff.size();
    poff.push_back((i64)arena.size());
    plen.push_back(len);
    arena.insert(arena.end(), p, p + len);
    slot_id[q] = id + 1;
    slot_h[q] = h;
    if ((poff.size() + 1) * 10 > (mask + 1) * 7) grow_table((mask + 1) * 2);
    return id;
  }

  void feed(const u8* buf, i64 len) {
    for (i64 k = 0; k < len; ++k) {
      u8 b = buf[k];
      cur.push_back(b);
      i64 pos = fed++;  // 0-based index of this byte in T
      u8 out = ring[(size_t)(pos % w)];
      ring[(size_t)(pos % w)] = b;
      hash = hash * KR_BASE + b;
      if (pos >= w) hash -= basew * out;
      if (pos >= w - 1 && hash % pmod == 0) {
        // trigger at window start tau = pos - w + 1; phrase = [s, tau + w)
        // (everything currently in cur); skip if tau == phrase start (the
        // trigger that opened this phrase)
        i64 tau_cur = (i64)cur.size() - w;  // tau relative to phrase start
        if (tau_cur > 0) {
          u32 id = intern(cur.data(), (i64)cur.size());
          parse.push_back(id);
          // next phrase starts at tau: keep the trailing w bytes
          std::memmove(cur.data(), cur.data() + tau_cur, (size_t)w);
          cur.resize((size_t)w);
        }
      }
    }
  }

  void finish() {
    // final phrase: remainder + w sentinel zeros
    cur.insert(cur.end(), (size_t)w, 0);
    parse.push_back(intern(cur.data(), (i64)cur.size()));
    cur.clear();
  }
};

// ------------------------------------------------------------ sweep state ----

struct Member {
  i64 pid, off;     // phrase id + suffix offset (off == 0: full phrase)
  i64 seg0, seg1;   // ilist segment
  i64 cur;          // merge cursor
};

// run/char emission tracker (pass A counts runs; pass B records tables)
struct Emitter {
  // pass-B outputs (null in pass A)
  u8* run_head = nullptr;
  i64* run_start = nullptr;
  i64* run_sa_first = nullptr;
  i64* run_sa_last = nullptr;
  const i64* tstart = nullptr;
  // watched rows (sorted) — pass B only
  const i64* watch_rows = nullptr;
  i64 nwatch = 0;
  i64* watch_sa = nullptr;
  i64* watch_prev = nullptr;
  i64 wi = 0;

  i64 row = 0;
  i64 R = 0;
  int cur_char = -1;
  bool counting = true;  // pass A
  // lazily-resolved last occurrence of the current run, plus the occurrence
  // emitted just before the current segment (for watch_prev)
  i64 last_t = -1, last_off = 0;
  i64 last_t_prev = -1, last_off_prev = 0;

  inline i64 sa_of(i64 t, i64 off) const { return tstart[t] + off; }

  // a maximal same-char slice of one group member segment: cnt occurrences,
  // first/last identified by (t, off) — SA resolved only on demand
  void segment(int c, i64 cnt, i64 first_t, i64 first_off, i64 lt, i64 lof) {
    if (c != cur_char) {
      if (!counting) {
        if (R > 0) run_sa_last[R - 1] = sa_of(last_t, last_off);
        run_head[R] = (u8)c;
        run_start[R] = row;
        run_sa_first[R] = sa_of(first_t, first_off);
      }
      cur_char = c;
      ++R;
    }
    if (!counting) {
      // watched rows inside [row, row + cnt)?  (only for contiguous
      // single-segment spans; merged groups emit cnt == 1 per occurrence)
      while (wi < nwatch && watch_rows[wi] < row + cnt) {
        i64 wr = watch_rows[wi];
        // occurrence at wr: for cnt == 1 it's (first_t, first_off); for a
        // bulk segment the caller guarantees first..last are the ilist
        // segment in order — resolved by the caller via segment_watch
        if (cnt == 1) {
          watch_sa[wi] = sa_of(first_t, first_off);
          watch_prev[wi] = (wr == 0) ? -1 : sa_of(last_t_prev, last_off_prev);
        } else {
          watch_sa[wi] = -2;  // caller must resolve (bulk path)
          watch_prev[wi] = -2;
        }
        ++wi;
      }
    }
    last_t_prev = lt;  // the next segment's "previous occurrence"
    last_off_prev = lof;
    last_t = lt;
    last_off = lof;
    row += cnt;
  }
};

}  // namespace

extern "C" {

// ---- parser entry points ----

void* rbt_pfp_new(i64 w, u64 pmod) { return new Parser(w, pmod); }

void rbt_pfp_feed(void* h, const u8* buf, i64 len) {
  ((Parser*)h)->feed(buf, len);
}

void rbt_pfp_finish(void* h) { ((Parser*)h)->finish(); }

// out[0]=n  out[1]=np  out[2]=nd  out[3]=total dict chars (incl. sentinels)
void rbt_pfp_stats(void* h, i64* out) {
  Parser* p = (Parser*)h;
  out[0] = p->fed;
  out[1] = (i64)p->parse.size();
  out[2] = (i64)p->poff.size();
  out[3] = (i64)p->arena.size();
}

// Sorted dictionary + rank-remapped parse.
//   concat:  [dict_chars + nd] sorted phrase bytes, 0x00 after each phrase
//   starts:  [nd + 1] concat offset of each sorted phrase (end = total)
//   parse_out: [np] sorted-rank ids
void rbt_pfp_dict_parse(void* h, u8* concat, i64* starts, u32* parse_out) {
  Parser* p = (Parser*)h;
  i64 nd = (i64)p->poff.size();
  std::vector<u32> order((size_t)nd);
  for (i64 i = 0; i < nd; ++i) order[(size_t)i] = (u32)i;
  const u8* ar = p->arena.data();
  std::sort(order.begin(), order.end(), [&](u32 a, u32 b) {
    i64 la = p->plen[a], lb = p->plen[b];
    int c = memcmp(ar + p->poff[a], ar + p->poff[b],
                   (size_t)std::min(la, lb));
    if (c) return c < 0;
    return la < lb;  // prefix-free in theory; defensive tiebreak
  });
  std::vector<u32> rank_of((size_t)nd);
  i64 pos = 0;
  for (i64 r = 0; r < nd; ++r) {
    u32 id = order[(size_t)r];
    rank_of[id] = (u32)r;
    starts[r] = pos;
    std::memcpy(concat + pos, ar + p->poff[id], (size_t)p->plen[id]);
    pos += p->plen[id];
    concat[pos++] = 0;
  }
  starts[nd] = pos;
  for (size_t t = 0; t < p->parse.size(); ++t)
    parse_out[t] = rank_of[p->parse[t]];
}

void rbt_pfp_free(void* h) { delete (Parser*)h; }

// ---- Kasai LCP over the dict concat ----
// lcp_out[i] = LCP(dcat[dsa[i-1]:], dcat[dsa[i]:]); lcp_out[0] = 0.
void rbt_kasai(const u8* s, i64 n, const i64* sa, int32_t* lcp_out) {
  std::vector<int32_t> rank((size_t)n);
  for (i64 i = 0; i < n; ++i) rank[(size_t)sa[i]] = (int32_t)i;
  i64 k = 0;
  lcp_out[0] = 0;
  for (i64 i = 0; i < n; ++i) {
    int32_t r = rank[(size_t)i];
    if (r == 0) {
      k = 0;
      continue;
    }
    i64 j = sa[r - 1];
    while (i + k < n && j + k < n && s[i + k] == s[j + k]) ++k;
    lcp_out[r] = (int32_t)k;
    if (k) --k;
  }
}

// ---- the sweep ----
//
// Pass A always runs: counts rows + runs, resolves probe rows.  If cap_R is
// large enough, pass B fills the run tables and watch pairs.  Returns R
// (negative if cap_R was insufficient: call again with |R|).
//
// probes MUST be sorted by (pid, off, key); watch_pos are TEXT positions
// (resolved internally via the probe machinery — pass them also as probes
// with matching order is NOT required).
i64 rbt_pfp_sweep(
    const u8* dcat, i64 dlen, const i64* dstarts, i64 nd, const i64* dsa,
    const int32_t* lcp, i64 w, const u32* parse, i64 np,
    const i64* ilist_off, const int32_t* ilist_t, const int32_t* ilist_key,
    const i64* tstart,
    const int32_t* pr_pid, const i64* pr_off, const int32_t* pr_key, i64 npr,
    i64* pr_row,
    const i64* watch_rows_in, i64 nwatch, i64* watch_sa, i64* watch_prev,
    i64 cap_R, u8* run_head, i64* run_start, i64* run_sa_first,
    i64* run_sa_last, i64* out_n_rows) {
  // phrase id of each concat position (separators get the preceding phrase)
  std::vector<int32_t> phrase_of((size_t)dlen);
  for (i64 d = 0; d < nd; ++d)
    for (i64 q = dstarts[d]; q < dstarts[d + 1]; ++q)
      phrase_of[(size_t)q] = (int32_t)d;

  auto plen_of = [&](i64 d) { return dstarts[d + 1] - dstarts[d] - 1; };
  auto freq_of = [&](i64 d) { return ilist_off[d + 1] - ilist_off[d]; };
  // char preceding a full-phrase occurrence t (the last non-overlap char of
  // the previous phrase; t == 0 wraps to the final phrase = T[n-1])
  auto prev_char = [&](i64 t) {
    i64 e = (t > 0) ? (i64)parse[t - 1] : (i64)parse[np - 1];
    return (int)dcat[dstarts[e] + plen_of(e) - w - 1];
  };
  // lower_bound over a phrase's ilist keys
  auto lb_key = [&](i64 d, int32_t key) {
    const int32_t* b = ilist_key + ilist_off[d];
    const int32_t* e = ilist_key + ilist_off[d + 1];
    return (i64)(std::lower_bound(b, e, key) - b);
  };
  // probe range for (pid, off): probes sorted by (pid, off, key)
  auto probe_range = [&](i64 d, i64 off, i64& a, i64& b) {
    // binary search twice over the (pid, off) pairs
    i64 lo = 0, hi = npr;
    while (lo < hi) {
      i64 m = (lo + hi) >> 1;
      if (pr_pid[m] < d || (pr_pid[m] == d && pr_off[m] < off)) lo = m + 1;
      else hi = m;
    }
    a = lo;
    hi = npr;
    while (lo < hi) {
      i64 m = (lo + hi) >> 1;
      if (pr_pid[m] < d || (pr_pid[m] == d && pr_off[m] <= off)) lo = m + 1;
      else hi = m;
    }
    b = lo;
  };

  std::vector<Member> members;
  members.reserve(16);

  for (int pass = 0; pass < 2; ++pass) {
    bool counting = (pass == 0);
    if (!counting && *out_n_rows < 0) return -1;  // unreachable guard
    Emitter em;
    em.counting = counting;
    em.tstart = tstart;
    if (!counting) {
      em.run_head = run_head;
      em.run_start = run_start;
      em.run_sa_first = run_sa_first;
      em.run_sa_last = run_sa_last;
      em.watch_rows = watch_rows_in;
      em.nwatch = nwatch;
      em.watch_sa = watch_sa;
      em.watch_prev = watch_prev;
    }

    i64 idx = 0;
    i64 group_minlcp = 0;
    // current group state
    members.clear();
    i64 pending_minlcp = 1 << 30;

    auto flush_group = [&]() {
      if (members.empty()) return;
      // --- probes: row = group_row_start + sum of member lb_key ---
      if (counting) {
        for (size_t mi = 0; mi < members.size(); ++mi) {
          i64 a, b;
          probe_range(members[mi].pid, members[mi].off, a, b);
          for (i64 pi = a; pi < b; ++pi) {
            i64 r = em.row;
            for (size_t mj = 0; mj < members.size(); ++mj)
              r += lb_key(members[mj].pid, pr_key[pi]);
            pr_row[pi] = r;
          }
        }
      }
      if (members.size() == 1 && members[0].off > 0) {
        // uniform char, bulk emission
        Member& m = members[0];
        i64 cnt = m.seg1 - m.seg0;
        int c = dcat[dstarts[m.pid] + m.off - 1];
        if (!counting && em.nwatch) {
          // bulk watch resolution: emit around watches occurrence-precise
          i64 row0 = em.row;
          while (em.wi < em.nwatch && em.watch_rows[em.wi] < row0 + cnt) {
            i64 wr = em.watch_rows[em.wi];
            i64 k = wr - row0;  // k-th occurrence of this segment
            i64 before = k;     // occurrences before the watch inside segment
            // emit the prefix, the watched occurrence, then continue
            i64 done = em.row - row0;
            if (before > done)
              em.segment(c, before - done, ilist_t[m.seg0 + done], m.off,
                         ilist_t[m.seg0 + before - 1], m.off);
            em.segment(c, 1, ilist_t[m.seg0 + k], m.off,
                       ilist_t[m.seg0 + k], m.off);
          }
          i64 done = em.row - row0;
          if (done < cnt)
            em.segment(c, cnt - done, ilist_t[m.seg0 + done], m.off,
                       ilist_t[m.seg1 - 1], m.off);
        } else {
          em.segment(c, cnt, ilist_t[m.seg0], m.off, ilist_t[m.seg1 - 1],
                     m.off);
        }
      } else {
        // k-way merge by key; per-occurrence chars
        for (auto& m : members) m.cur = m.seg0;
        for (;;) {
          int best = -1;
          int32_t bk = 0;
          for (size_t mi = 0; mi < members.size(); ++mi) {
            Member& m = members[mi];
            if (m.cur < m.seg1 &&
                (best < 0 || ilist_key[m.cur] < bk)) {
              best = (int)mi;
              bk = ilist_key[m.cur];
            }
          }
          if (best < 0) break;
          Member& m = members[(size_t)best];
          i64 t = ilist_t[m.cur++];
          int c = m.off > 0 ? dcat[dstarts[m.pid] + m.off - 1]
                            : prev_char(t);
          em.segment(c, 1, t, m.off, t, m.off);
        }
      }
      members.clear();
    };

    for (idx = 0; idx < dlen; ++idx) {
      i64 pos = dsa[idx];
      i64 cur_lcp = lcp[idx];
      if (idx) pending_minlcp = std::min(pending_minlcp, (i64)cur_lcp);
      if (dcat[pos] == 0) continue;
      i64 pid = phrase_of[(size_t)pos];
      i64 off = pos - dstarts[pid];
      i64 suf_len = plen_of(pid) - off;
      if (suf_len <= w) continue;
      bool same = !members.empty() &&
                  (plen_of(members.back().pid) - members.back().off ==
                   suf_len) &&
                  pending_minlcp >= suf_len;
      if (!same) flush_group();
      members.push_back(
          {pid, off, ilist_off[pid], ilist_off[pid + 1], ilist_off[pid]});
      pending_minlcp = 1 << 30;
    }
    flush_group();
    if (!counting && em.R > 0)
      em.run_sa_last[em.R - 1] = em.sa_of(em.last_t, em.last_off);
    if (!counting) {
      // watch_prev for row 0 (wrap): SA[n-1] = last occurrence overall
      for (i64 t = 0; t < nwatch; ++t)
        if (watch_prev[t] == -1)
          watch_prev[t] = em.sa_of(em.last_t, em.last_off);
    }
    *out_n_rows = em.row;
    if (counting) {
      if (em.R > cap_R) return -em.R;
    } else {
      return em.R;
    }
  }
  return -1;  // unreachable
}

// ---- fused-block rank table from the run-length BWT ----
//
// fb2: int32[nb_pad, 8 + block/8] rows with SUPERBLOCK-local checkpoints
// (bigindex.BigIndex layout, generalized to `block` symbols per row);
// base: int64[n_sup, 8] global per-char counts before each superblock.
// heads are CODES (< A <= 8); pad nibbles are 15 (match no code).
void rbt_fb2_fill_rle(const u8* heads, const i64* lens, i64 R, i64 A, i64 n,
                      i64 block, i64 per_blk, i64 n_sup, int32_t* fb2,
                      i64* base) {
  i64 words_per_row = block / 8;
  i64 row_lanes = 8 + words_per_row;
  i64 nb_pad = per_blk * n_sup;
  // zero + pad
  std::memset(fb2, 0, (size_t)(nb_pad * row_lanes) * 4);
  std::memset(base, 0, (size_t)(n_sup * 8) * 8);
  for (i64 b = 0; b < nb_pad; ++b) {
    int32_t* rw = fb2 + b * row_lanes + 8;
    std::memset(rw, 0xFF, (size_t)words_per_row * 4);  // nibble 15 everywhere
  }
  i64 run_cnt[8] = {0};   // global counts so far
  i64 sup_base[8] = {0};  // counts at current superblock start
  i64 cur_sup = -1;
  i64 pos = 0;
  for (i64 r = 0; r < R; ++r) {
    u8 c = heads[r];
    i64 len = lens[r];
    u64 pat = 0x1111111111111111ULL * (u64)c;
    while (len > 0) {
      i64 blk = pos / block;
      i64 sup = blk / per_blk;
      if (sup != cur_sup) {
        for (i64 k = 0; k < 8; ++k) {
          base[sup * 8 + k] = run_cnt[k];
          sup_base[k] = run_cnt[k];
        }
        cur_sup = sup;
      }
      i64 boff = pos - blk * block;
      if (boff == 0) {
        int32_t* ck = fb2 + blk * row_lanes;
        for (i64 k = 0; k < 8; ++k) ck[k] = (int32_t)(run_cnt[k] - sup_base[k]);
      }
      i64 take = std::min(len, block - boff);
      // write `take` nibbles of value c starting at boff
      u64* wp = (u64*)(fb2 + blk * row_lanes + 8);
      i64 q = boff, left = take;
      while (left > 0) {
        i64 wi = q >> 4;
        i64 sh = (q & 15) * 4;
        i64 in_word = std::min(left, 16 - (q & 15));
        u64 m = in_word == 16 ? ~0ULL : (((1ULL << (4 * in_word)) - 1) << sh);
        wp[wi] = (wp[wi] & ~m) | (pat & m);
        q += in_word;
        left -= in_word;
      }
      run_cnt[c] += take;
      pos += take;
      len -= take;
      // checkpoints for blocks fully covered by a long run are written when
      // the loop reaches them (boff == 0 each iteration)
    }
  }
  // remaining superblock bases (pad superblocks): counts at end; pad-row
  // checkpoints stay ZERO (the fb3_from_codes convention — pad rows are
  // never gathered: the engines clamp i to n-1)
  for (i64 s = cur_sup + 1; s < n_sup; ++s)
    for (i64 k = 0; k < 8; ++k) base[s * 8 + k] = run_cnt[k];
  (void)n;
  (void)A;
}
}
