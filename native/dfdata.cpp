// dfdata: native data-engine kernels (C ABI, consumed via ctypes).
//
// TPU-native replacement for the reference's Rust data-engine hot loops
// (libDF decoders + DSP inner loops): audio codec decode for HDF5 datasets
// and float64-accumulated biquad filtering for augmentations.

#include <cstddef>
#include <cstdint>

namespace dfdata {
int64_t decode_flac(const uint8_t*, size_t, int16_t*, int64_t, int*, int*);
int64_t decode_vorbis(const uint8_t*, size_t, int16_t*, int64_t, int*, int*);
}  // namespace dfdata

extern "C" {

// Returns frames decoded (samples/channel); -1 error; -2 lib missing.
int64_t df_decode_flac(const uint8_t* data, size_t size, int16_t* out,
                       int64_t max_frames, int* channels, int* sr) {
  return dfdata::decode_flac(data, size, out, max_frames, channels, sr);
}

int64_t df_decode_vorbis(const uint8_t* data, size_t size, int16_t* out,
                         int64_t max_frames, int* channels, int* sr) {
  return dfdata::decode_vorbis(data, size, out, max_frames, channels, sr);
}

// Direct-form-II-transposed biquad chain with f64 accumulation
// (transforms.rs:21-56 semantics). coefs: n_sections x 6 (b0 b1 b2 a0 a1 a2),
// processed in sequence, in place over x[n].
void df_biquad_chain(float* x, int64_t n, const double* coefs,
                     int n_sections) {
  for (int s = 0; s < n_sections; ++s) {
    const double* c = coefs + s * 6;
    double b0 = c[0] / c[3], b1 = c[1] / c[3], b2 = c[2] / c[3];
    double a1 = c[4] / c[3], a2 = c[5] / c[3];
    double z1 = 0.0, z2 = 0.0;
    for (int64_t i = 0; i < n; ++i) {
      double in = x[i];
      double out = b0 * in + z1;
      z1 = b1 * in - a1 * out + z2;
      z2 = b2 * in - a2 * out;
      x[i] = (float)out;
    }
  }
}

}  // extern "C"
