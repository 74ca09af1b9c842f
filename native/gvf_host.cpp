// gvf_host: native host-side data-path kernels.
//
// TPU-native stance (SURVEY.md §2.4): device compute goes through
// XLA/Pallas, but the HOST data path — voxel serialization, dedup/pooling,
// farthest-point sampling during dataset preprocessing — deserves native
// speed too, like the reference's vox2seq CUDA extension did on GPU
// (model/sparse_voxel_diffusion/vox2seq/src/{z_order.cu,hilbert.cu}).
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libgvf_host.so gvf_host.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <cmath>
#include <limits>

extern "C" {

// ---- Morton (Z-order) codes: 10 bits per axis -> 30-bit codes ----------

static inline uint32_t part1by2(uint32_t v) {
  v &= 0x3FF;
  v = (v | (v << 16)) & 0x030000FF;
  v = (v | (v << 8)) & 0x0300F00F;
  v = (v | (v << 4)) & 0x030C30C3;
  v = (v | (v << 2)) & 0x09249249;
  return v;
}

static inline uint32_t compact1by2(uint32_t v) {
  v &= 0x09249249;
  v = (v | (v >> 2)) & 0x030C30C3;
  v = (v | (v >> 4)) & 0x0300F00F;
  v = (v | (v >> 8)) & 0x030000FF;
  v = (v | (v >> 16)) & 0x000003FF;
  return v;
}

void z_order_encode(const int32_t* coords, int32_t n, int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    out[i] = (int32_t)(part1by2((uint32_t)coords[3 * i]) |
                       (part1by2((uint32_t)coords[3 * i + 1]) << 1) |
                       (part1by2((uint32_t)coords[3 * i + 2]) << 2));
  }
}

void z_order_decode(const int32_t* codes, int32_t n, int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    uint32_t c = (uint32_t)codes[i];
    out[3 * i] = (int32_t)compact1by2(c);
    out[3 * i + 1] = (int32_t)compact1by2(c >> 1);
    out[3 * i + 2] = (int32_t)compact1by2(c >> 2);
  }
}

// ---- Hilbert codes (Skilling's algorithm, bits static) ------------------

void hilbert_encode(const int32_t* coords, int32_t n, int32_t bits,
                    int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    uint32_t X[3] = {(uint32_t)coords[3 * i], (uint32_t)coords[3 * i + 1],
                     (uint32_t)coords[3 * i + 2]};
    uint32_t M = 1u << (bits - 1);
    // axes -> transposed Hilbert
    for (uint32_t Q = M; Q > 1; Q >>= 1) {
      uint32_t P = Q - 1;
      for (int j = 0; j < 3; ++j) {
        if (X[j] & Q) {
          X[0] ^= P;
        } else {
          uint32_t t = (X[0] ^ X[j]) & P;
          X[0] ^= t;
          X[j] ^= t;
        }
      }
    }
    X[1] ^= X[0];
    X[2] ^= X[1];
    uint32_t t = 0;
    for (uint32_t Q = M; Q > 1; Q >>= 1)
      if (X[2] & Q) t ^= Q - 1;
    for (int j = 0; j < 3; ++j) X[j] ^= t;
    // interleave MSB-first, axis 0 most significant per level
    uint32_t code = 0;
    for (int b = bits - 1; b >= 0; --b) {
      code = (code << 1) | ((X[0] >> b) & 1);
      code = (code << 1) | ((X[1] >> b) & 1);
      code = (code << 1) | ((X[2] >> b) & 1);
    }
    out[i] = (int32_t)code;
  }
}

void hilbert_decode(const int32_t* codes, int32_t n, int32_t bits,
                    int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    uint32_t c = (uint32_t)codes[i];
    uint32_t X[3] = {0, 0, 0};
    for (int b = 0; b < bits; ++b) {
      X[0] |= ((c >> (3 * b + 2)) & 1) << b;
      X[1] |= ((c >> (3 * b + 1)) & 1) << b;
      X[2] |= ((c >> (3 * b)) & 1) << b;
    }
    uint32_t N = 2u << (bits - 1);
    // Gray decode
    uint32_t t = X[2] >> 1;
    X[2] ^= X[1];
    X[1] ^= X[0];
    X[0] ^= t;
    // undo excess work
    for (uint32_t Q = 2; Q != N; Q <<= 1) {
      uint32_t P = Q - 1;
      for (int j = 2; j >= 0; --j) {
        if (X[j] & Q) {
          X[0] ^= P;
        } else {
          uint32_t tt = (X[0] ^ X[j]) & P;
          X[0] ^= tt;
          X[j] ^= tt;
        }
      }
    }
    out[3 * i] = (int32_t)X[0];
    out[3 * i + 1] = (int32_t)X[1];
    out[3 * i + 2] = (int32_t)X[2];
  }
}

// ---- Voxel mean-pool dedup (host-side downsampling) ---------------------
// coords [n,3] int32, feats [n,c] float32, factor -> unique parent cells.
// Returns the number of parents; out buffers must hold n entries.

int32_t voxel_downsample(const int32_t* coords, const float* feats, int32_t n,
                         int32_t c, int32_t factor, int32_t res,
                         int32_t* out_coords, float* out_feats) {
  int32_t pres = res / factor;
  std::vector<std::pair<int64_t, int32_t>> keyed(n);
  for (int32_t i = 0; i < n; ++i) {
    int64_t px = coords[3 * i] / factor;
    int64_t py = coords[3 * i + 1] / factor;
    int64_t pz = coords[3 * i + 2] / factor;
    keyed[i] = {px * pres * pres + py * pres + pz, i};
  }
  std::sort(keyed.begin(), keyed.end());
  int32_t n_out = 0;
  int32_t run_start = 0;
  for (int32_t i = 1; i <= n; ++i) {
    if (i == n || keyed[i].first != keyed[run_start].first) {
      int64_t key = keyed[run_start].first;
      out_coords[3 * n_out] = (int32_t)(key / (pres * pres));
      out_coords[3 * n_out + 1] = (int32_t)((key / pres) % pres);
      out_coords[3 * n_out + 2] = (int32_t)(key % pres);
      for (int32_t ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int32_t j = run_start; j < i; ++j)
          acc += feats[(int64_t)keyed[j].second * c + ch];
        out_feats[(int64_t)n_out * c + ch] = acc / (float)(i - run_start);
      }
      ++n_out;
      run_start = i;
    }
  }
  return n_out;
}

// ---- Farthest point sampling (host preprocessing) -----------------------

void fps(const float* points, int32_t n, int32_t k, int32_t start,
         int32_t* out_idx) {
  std::vector<float> min_d2(n, std::numeric_limits<float>::infinity());
  out_idx[0] = start;
  for (int32_t s = 1; s < k; ++s) {
    const float* last = points + (int64_t)out_idx[s - 1] * 3;
    float best = -1.f;
    int32_t best_i = 0;
    for (int32_t i = 0; i < n; ++i) {
      float dx = points[3 * i] - last[0];
      float dy = points[3 * i + 1] - last[1];
      float dz = points[3 * i + 2] - last[2];
      float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < min_d2[i]) min_d2[i] = d2;
      if (min_d2[i] > best) {
        best = min_d2[i];
        best_i = i;
      }
    }
    out_idx[s] = best_i;
  }
}

}  // extern "C"
