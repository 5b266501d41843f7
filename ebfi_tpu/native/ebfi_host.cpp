// Host-side data-plane hot loops for the input pipeline.
//
// The reference runs these inside torch DataLoader fork workers in Python
// (dataloader/encodings.py events_to_stack; h5dataset.py GetFrames blurry
// synthesis).  Here they are C(++) kernels driven through ctypes, used by
// the prefetching loader when the shared library is built
// (ebfi_tpu/native/build.sh); the numpy implementations remain as
// fallback and parity oracle.
//
// Semantics match ebfi_tpu/data/encodings.py exactly:
// - per-bin event slicing via binary search over sorted timestamps,
//   bins [tstart, tend] closed on both sides (searchsorted left/right);
// - bin edges computed in FLOAT64 with the reference's op order (the
//   reference's loader promotes ts to f64 via np.concatenate of the f64 H5
//   ts column, h5dataset.py:337 + event_packagers.py:47, and only casts ps
//   to f32): dt = ts[-1]-ts[0]+1e-6, delta = dt/B, tstart = ts[0]+delta*bi,
//   tend = tstart+delta — an event exactly on a shared f64 edge lands in
//   both adjacent bins, like the reference;
// - accumulation weight ps^2 into the polarity channel of sign(ps);
// - out-of-range pixels dropped; <=3 events or all-zero ts -> zeros.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// stack: float32 [2, num_bins, H, W] (zeroed by caller or here)
void events_to_stack_f32(
    const double* xs, const double* ys, const double* ts, const double* ps,
    int64_t n, int num_bins, int H, int W, float* stack) {
  const int64_t plane = static_cast<int64_t>(H) * W;
  std::memset(stack, 0, sizeof(float) * 2 * num_bins * plane);
  if (n <= 3) return;
  double ts_sum = 0.0;
  for (int64_t i = 0; i < n; ++i) ts_sum += ts[i];
  if (ts_sum == 0.0) return;

  const double t0 = ts[0];
  const double dt = ts[n - 1] - t0 + 1e-6;
  const double delta = dt / static_cast<double>(num_bins);
  for (int bi = 0; bi < num_bins; ++bi) {
    const double tstart = t0 + delta * static_cast<double>(bi);
    const double tend = tstart + delta;
    const int64_t beg = std::lower_bound(ts, ts + n, tstart) - ts;
    const int64_t end = std::upper_bound(ts, ts + n, tend) - ts;
    float* pos = stack + static_cast<int64_t>(bi) * plane;
    float* neg = stack + (static_cast<int64_t>(num_bins) + bi) * plane;
    for (int64_t i = beg; i < end; ++i) {
      const int64_t x = static_cast<int64_t>(xs[i]);
      const int64_t y = static_cast<int64_t>(ys[i]);
      if (x < 0 || x >= W || y < 0 || y >= H) continue;
      const double p = ps[i];
      const float w = static_cast<float>(p * p);
      if (p > 0)
        pos[y * W + x] += w;
      else if (p < 0)
        neg[y * W + x] += w;
    }
  }
}

// frames: uint8 [N, H, W, 3] BGR; out: float32 [H, W, 3] RGB in [0,1],
// the on-the-fly blurry synthesis (mean of the exposure window).
void blurry_mean_bgr_u8(
    const uint8_t* frames, int64_t n, int64_t H, int64_t W, float* out) {
  // Exact reference op order (h5dataset.py:311): uint8 mean in float64,
  // cast to f32, then divide by 255 in f32 — bit-identical to
  // `torch.from_numpy(FNumpy.mean(0)).float() / 255`.
  const int64_t px = H * W;
  std::vector<double> acc(px * 3, 0.0);
  for (int64_t f = 0; f < n; ++f) {
    const uint8_t* src = frames + f * px * 3;
    for (int64_t i = 0; i < px; ++i) {
      acc[i * 3 + 0] += src[i * 3 + 2];  // B -> R position
      acc[i * 3 + 1] += src[i * 3 + 1];
      acc[i * 3 + 2] += src[i * 3 + 0];  // R -> B position
    }
  }
  const double dn = static_cast<double>(n);
  for (int64_t i = 0; i < px * 3; ++i)
    out[i] = static_cast<float>(acc[i] / dn) / 255.0f;
}

// ts normalization (h5dataset.py:335): (ts - ts0) / (ts_last - ts0 + 1e-6)
void normalize_ts(const double* ts, int64_t n, double* out) {
  if (n == 0) return;
  const double t0 = ts[0];
  const double dt = ts[n - 1] - t0 + 1e-6;
  for (int64_t i = 0; i < n; ++i) out[i] = (ts[i] - t0) / dt;
}

}  // extern "C"
