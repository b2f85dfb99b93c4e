// Fast note-event extraction (host decode hot path).
//
// C counterpart of reconvat_tpu/decode.py::extract_notes_wo_velocity
// (reference semantics at model/decoding.py:4-55): strict > thresholds,
// rising-edge onsets, rule1/rule2, walk-to-first-inactive offsets.
// Operates on row-major float rolls (T, P); returns packed
// (pitch, onset, offset) int32 triples in row-major onset order.
#include <cstdint>
#include <cstdlib>
#include <vector>

extern "C" {

// Returns number of notes. *out is malloc'd [n*3] (pitch, onset, offset).
long long extract_notes(const float* onsets, const float* frames,
                        int T, int P, float onset_threshold,
                        float frame_threshold, int rule1,
                        int32_t** out) {
  std::vector<uint8_t> on((size_t)T * P), fr((size_t)T * P);
  for (size_t i = 0; i < (size_t)T * P; ++i) {
    on[i] = onsets[i] > onset_threshold;
    fr[i] = frames[i] > frame_threshold;
  }

  // next inactive index at or after t, per pitch (backward scan)
  std::vector<int32_t> nz((size_t)(T + 1) * P);
  for (int p = 0; p < P; ++p) nz[(size_t)T * P + p] = T;
  for (int t = T - 1; t >= 0; --t) {
    for (int p = 0; p < P; ++p) {
      bool active = on[(size_t)t * P + p] || fr[(size_t)t * P + p];
      nz[(size_t)t * P + p] =
          active ? nz[(size_t)(t + 1) * P + p] : t;
    }
  }

  std::vector<int32_t> notes;
  for (int t = 0; t < T; ++t) {
    for (int p = 0; p < P; ++p) {
      bool edge = on[(size_t)t * P + p] &&
                  (t == 0 || !on[(size_t)(t - 1) * P + p]);
      if (!edge) continue;
      if (rule1 && !fr[(size_t)t * P + p]) continue;
      int32_t offset = nz[(size_t)t * P + p];
      if (offset > t) {
        notes.push_back(p);
        notes.push_back(t);
        notes.push_back(offset);
      }
    }
  }

  long long n = (long long)(notes.size() / 3);
  *out = (int32_t*)malloc(notes.size() * sizeof(int32_t));
  if (!*out) return -1;
  for (size_t i = 0; i < notes.size(); ++i) (*out)[i] = notes[i];
  return n;
}

void notes_free(int32_t* p) { free(p); }

}  // extern "C"
