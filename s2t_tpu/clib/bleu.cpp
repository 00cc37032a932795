// Fast corpus-BLEU n-gram statistics (1..4-grams).
//
// Native equivalent of the reference's libbleu (reference:
// fairseq/clib/libbleu/libbleu.cpp:141, loaded via ctypes at
// fairseq/scoring/bleu.py:6-30).  Accumulates per-sentence match/total counts
// into a stats array; the Python side turns stats into BLEU.

#include <cstdint>
#include <unordered_map>

namespace {
constexpr int kMaxOrder = 4;

inline uint64_t hash_step(uint64_t h, int32_t tok) {
  return h * 1000003ULL + (uint64_t)(tok + 1);
}
}  // namespace

extern "C" {

// stats layout: [match1, total1, match2, total2, match3, total3, match4,
// total4, hyp_len, ref_len] — accumulated (+=) across calls.
void bleu_add_sentence(const int32_t* ref, int32_t ref_len, const int32_t* hyp,
                       int32_t hyp_len, int64_t* stats) {
  std::unordered_map<uint64_t, int32_t> ref_counts[kMaxOrder];
  for (int32_t i = 0; i < ref_len; ++i) {
    uint64_t h = 0;
    for (int n = 0; n < kMaxOrder && i + n < ref_len; ++n) {
      h = hash_step(h, ref[i + n]);
      ref_counts[n][h]++;
    }
  }
  for (int32_t i = 0; i < hyp_len; ++i) {
    uint64_t h = 0;
    for (int n = 0; n < kMaxOrder && i + n < hyp_len; ++n) {
      h = hash_step(h, hyp[i + n]);
      stats[2 * n + 1] += 1;  // total n-grams
      auto& counts = ref_counts[n];
      auto it = counts.find(h);
      if (it != counts.end() && it->second > 0) {
        it->second--;  // clipped match
        stats[2 * n] += 1;
      }
    }
  }
  stats[8] += hyp_len;
  stats[9] += ref_len;
}

}  // extern "C"
