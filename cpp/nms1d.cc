// 1-D temporal NMS / Soft-NMS, C API for ctypes.
//
// Native replacement for the reference's torch extension
// (detection/eval_detection/csrc/nms_cpu.cpp): greedy IoU suppression and
// Soft-NMS (linear/gaussian decay) over [start, end] segments. Semantics
// match the reference exactly (epsilon'd lengths, >= threshold suppression,
// in-place swap compaction for soft-NMS) so detection mAP is reproducible;
// the implementation below is written fresh around a single Seg record
// instead of parallel raw arrays.
//
// Build: g++ -O3 -march=native -shared -fPIC nms1d.cc -o libnms1d.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

struct Seg {
  float start;
  float end;
  float score;
  float len;       // end - start + 1e-6 (reference-compatible epsilon)
  int64_t index;   // original position
};

inline float overlap(const Seg& a, const Seg& b) {
  const float lo = std::max(a.start, b.start);
  const float hi = std::min(a.end, b.end);
  const float inter = std::max(0.0f, hi - lo);
  return inter / (a.len + b.len - inter);
}

}  // namespace

extern "C" {

// Greedy NMS. keep_out must hold n entries; returns the kept count.
// Kept indices are emitted in descending-score order.
int64_t nms_1d(const float* segs, const float* scores, int64_t n,
               float iou_threshold, int64_t* keep_out) {
  if (n <= 0) return 0;
  std::vector<Seg> s(n);
  for (int64_t i = 0; i < n; ++i) {
    s[i] = {segs[2 * i], segs[2 * i + 1], scores[i],
            segs[2 * i + 1] - segs[2 * i] + 1e-6f, i};
  }
  std::stable_sort(s.begin(), s.end(), [](const Seg& a, const Seg& b) {
    return a.score > b.score;
  });

  std::vector<char> alive(n, 1);
  int64_t kept = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!alive[i]) continue;
    keep_out[kept++] = s[i].index;
    for (int64_t j = i + 1; j < n; ++j) {
      if (alive[j] && overlap(s[i], s[j]) >= iou_threshold) alive[j] = 0;
    }
  }
  return kept;
}

// Soft-NMS. dets_out: [n, 3] (start, end, decayed score) in processed
// order; inds_out: original indices of survivors. Returns survivor count.
// method: 0 = hard, 1 = linear decay, 2 = gaussian decay.
int64_t softnms_1d(const float* segs, const float* scores, int64_t n,
                   float iou_threshold, float sigma, float min_score,
                   int method, float* dets_out, int64_t* inds_out) {
  if (n <= 0) return 0;
  std::vector<Seg> s(n);
  for (int64_t i = 0; i < n; ++i) {
    s[i] = {segs[2 * i], segs[2 * i + 1], scores[i],
            segs[2 * i + 1] - segs[2 * i] + 1e-6f, i};
  }

  int64_t count = n;
  for (int64_t i = 0; i < count; ++i) {
    // Bring the highest-scoring remaining segment to slot i.
    int64_t best = i;
    for (int64_t j = i + 1; j < count; ++j) {
      if (s[j].score > s[best].score) best = j;
    }
    std::swap(s[i], s[best]);

    dets_out[3 * i + 0] = s[i].start;
    dets_out[3 * i + 1] = s[i].end;
    dets_out[3 * i + 2] = s[i].score;
    inds_out[i] = s[i].index;

    // Decay every remaining segment's score by its overlap with s[i];
    // drop below-threshold segments via swap-with-last compaction.
    for (int64_t j = i + 1; j < count; ++j) {
      const float ovr = overlap(s[i], s[j]);
      float weight = 1.0f;
      if (method == 0) {
        if (ovr >= iou_threshold) weight = 0.0f;
      } else if (method == 1) {
        if (ovr >= iou_threshold) weight = 1.0f - ovr;
      } else if (method == 2) {
        weight = std::exp(-(ovr * ovr) / sigma);
      }
      s[j].score *= weight;
      if (s[j].score < min_score) {
        s[j] = s[count - 1];
        --count;
        --j;
      }
    }
  }
  return count;
}

}  // extern "C"
