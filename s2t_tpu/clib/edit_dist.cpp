// Batch Levenshtein edit distance over integer token sequences.
//
// Host-side native equivalent of the reference's libnat edit-distance ops
// (reference: fairseq/clib/libnat/edit_dist.cpp:231) used for WER scoring and
// Levenshtein-NAT supervision.  Exposed via C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// refs: (B, max_ref) int32 padded; hyps: (B, max_hyp) int32 padded.
// out: (B,) int32 distances.
void batch_edit_distance(const int32_t* refs, const int32_t* ref_lens,
                         const int32_t* hyps, const int32_t* hyp_lens,
                         int32_t batch, int32_t max_ref, int32_t max_hyp,
                         int32_t* out) {
  std::vector<int32_t> prev(max_hyp + 1), cur(max_hyp + 1);
  for (int32_t b = 0; b < batch; ++b) {
    const int32_t* r = refs + (int64_t)b * max_ref;
    const int32_t* h = hyps + (int64_t)b * max_hyp;
    const int32_t n = ref_lens[b], m = hyp_lens[b];
    for (int32_t j = 0; j <= m; ++j) prev[j] = j;
    for (int32_t i = 1; i <= n; ++i) {
      cur[0] = i;
      const int32_t ri = r[i - 1];
      for (int32_t j = 1; j <= m; ++j) {
        const int32_t sub = prev[j - 1] + (ri != h[j - 1]);
        cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
      }
      std::swap(prev, cur);
    }
    out[b] = prev[m];
  }
}

// Token-budget batch packing over pre-sorted indices (native replacement for
// the reference's Cython batch_by_size_vec, fairseq/data/data_utils_fast.pyx).
// lengths are the *bucketed* frame lengths of each sample in iteration order.
// Writes batch end-offsets into out (capacity n); returns count of batches.
int64_t batch_by_size_fast(const int64_t* lengths, int64_t n,
                           int64_t max_tokens, int64_t max_sentences,
                           int64_t bsz_mult, int64_t* out) {
  int64_t n_batches = 0;
  int64_t start = 0;
  int64_t cur_max = 0;
  auto cost = [&](int64_t count, int64_t maxlen) {
    int64_t padded = ((count + bsz_mult - 1) / bsz_mult) * bsz_mult;
    return padded * maxlen;
  };
  for (int64_t i = 0; i < n; ++i) {
    const int64_t count = i - start;
    const int64_t new_max = std::max(cur_max, lengths[i]);
    const bool over_tokens =
        max_tokens > 0 && count > 0 && cost(count + 1, new_max) > max_tokens;
    const bool over_sent = max_sentences > 0 && count >= max_sentences;
    if (over_tokens || over_sent) {
      out[n_batches++] = i;  // batch = [start, i)
      start = i;
      cur_max = lengths[i];
    } else {
      cur_max = new_max;
    }
  }
  if (start < n) out[n_batches++] = n;
  return n_batches;
}

}  // extern "C"
