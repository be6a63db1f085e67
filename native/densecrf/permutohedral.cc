// Permutohedral-lattice Gaussian filtering + mean-field DenseCRF (host).
//
// From-scratch implementation of the lattice algorithm (Adams, Baek,
// Davis: "Fast High-Dimensional Filtering Using the Permutohedral
// Lattice", 2010) and the Krahenbuhl-Koltun fully-connected CRF
// mean-field update. This is the TPU framework's host-parity replacement
// for the reference's pydensecrf C++ dependency (driver :1030-1074); the
// on-device path (ops/crf.py) computes the same messages exactly on the
// MXU.
//
// Exposed C ABI (ctypes):
//   permutohedral_filter(features[N*d], N, d, values[N*c], c, out[N*c])
//   densecrf_inference(unary[N*L], img[N*3], H, W, L, params..., out[N])
//
// Build: make -C native/densecrf  (produces libdensecrf.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Hash for a lattice key of d int16 coordinates.
struct KeyHash {
  size_t operator()(const std::vector<int16_t>& k) const {
    size_t h = 14695981039346656037ULL;
    for (int16_t v : k) {
      h ^= static_cast<uint16_t>(v);
      h *= 1099511628211ULL;
    }
    return h;
  }
};

class Permutohedral {
 public:
  void init(const float* features, int N, int d) {
    N_ = N;
    d_ = d;
    const int dp1 = d + 1;
    offsets_.assign(static_cast<size_t>(N) * dp1, 0);
    weights_.assign(static_cast<size_t>(N) * dp1, 0.f);

    // Elevation scale factors.
    std::vector<float> scale(d);
    const float inv_std_dev = std::sqrt(2.0f / 3.0f) * (d + 1);
    for (int i = 0; i < d; ++i)
      scale[i] = 1.0f / std::sqrt(float((i + 2) * (i + 1))) * inv_std_dev;

    std::unordered_map<std::vector<int16_t>, int, KeyHash> hash;
    hash.reserve(static_cast<size_t>(N) * 2);

    std::vector<float> elevated(dp1);
    std::vector<int> rem0(dp1), rank(dp1);
    std::vector<float> barycentric(d + 2);
    std::vector<int16_t> key(d);

    for (int n = 0; n < N; ++n) {
      const float* f = features + static_cast<size_t>(n) * d;

      // Elevate into the hyperplane sum(x)=0 using the E matrix.
      float sm = 0.f;
      for (int j = d; j > 0; --j) {
        float cf = f[j - 1] * scale[j - 1];
        elevated[j] = sm - j * cf;
        sm += cf;
      }
      elevated[0] = sm;

      // Round to the nearest remainder-0 lattice point.
      const float down = 1.0f / dp1;
      int sum = 0;
      for (int j = 0; j <= d; ++j) {
        int rd = static_cast<int>(std::round(elevated[j] * down)) * dp1;
        rem0[j] = rd;
        sum += rd / dp1;
      }

      // Rank differential coordinates.
      for (int j = 0; j <= d; ++j) rank[j] = 0;
      for (int i = 0; i < d; ++i)
        for (int j = i + 1; j <= d; ++j) {
          if (elevated[i] - rem0[i] < elevated[j] - rem0[j])
            ++rank[i];
          else
            ++rank[j];
        }

      // Fix points that round outside the canonical simplex.
      for (int j = 0; j <= d; ++j) {
        rank[j] += sum;
        if (rank[j] < 0) {
          rank[j] += dp1;
          rem0[j] += dp1;
        } else if (rank[j] > d) {
          rank[j] -= dp1;
          rem0[j] -= dp1;
        }
      }

      // Barycentric coordinates.
      std::fill(barycentric.begin(), barycentric.end(), 0.f);
      for (int j = 0; j <= d; ++j) {
        float v = (elevated[j] - rem0[j]) * down;
        barycentric[d - rank[j]] += v;
        barycentric[d + 1 - rank[j]] -= v;
      }
      barycentric[0] += 1.0f + barycentric[d + 1];

      // Splat targets: the d+1 simplex vertices.
      for (int remainder = 0; remainder <= d; ++remainder) {
        for (int j = 0; j < d; ++j) {
          int16_t v = static_cast<int16_t>(rem0[j] + remainder);
          if (rank[j] > d - remainder) v -= static_cast<int16_t>(dp1);
          key[j] = v;
        }
        auto it = hash.find(key);
        int idx;
        if (it == hash.end()) {
          idx = static_cast<int>(hash.size());
          hash.emplace(key, idx);
          keys_.insert(keys_.end(), key.begin(), key.end());
        } else {
          idx = it->second;
        }
        offsets_[static_cast<size_t>(n) * dp1 + remainder] = idx;
        weights_[static_cast<size_t>(n) * dp1 + remainder] =
            barycentric[remainder];
      }
    }
    M_ = static_cast<int>(hash.size());

    // Precompute blur neighbours along each lattice axis.
    blur_n1_.assign(static_cast<size_t>(M_) * dp1, -1);
    blur_n2_.assign(static_cast<size_t>(M_) * dp1, -1);
    std::vector<int16_t> np(d), nm(d);
    for (int m = 0; m < M_; ++m) {
      const int16_t* k = keys_.data() + static_cast<size_t>(m) * d;
      for (int j = 0; j <= d; ++j) {
        for (int i = 0; i < d; ++i) {
          np[i] = k[i] + 1;
          nm[i] = k[i] - 1;
        }
        if (j < d) {
          np[j] = k[j] - d;
          nm[j] = k[j] + d;
        }
        auto i1 = hash.find(np);
        auto i2 = hash.find(nm);
        blur_n1_[static_cast<size_t>(m) * dp1 + j] =
            i1 == hash.end() ? -1 : i1->second;
        blur_n2_[static_cast<size_t>(m) * dp1 + j] =
            i2 == hash.end() ? -1 : i2->second;
      }
    }
  }

  // out = K @ values (Gaussian filtering); values/out are [N, c].
  void compute(const float* values, int c, float* out) const {
    const int dp1 = d_ + 1;
    std::vector<float> lattice(static_cast<size_t>(M_ + 1) * c, 0.f);

    // Splat.
    for (int n = 0; n < N_; ++n)
      for (int j = 0; j <= d_; ++j) {
        int o = offsets_[static_cast<size_t>(n) * dp1 + j];
        float w = weights_[static_cast<size_t>(n) * dp1 + j];
        float* dst = lattice.data() + static_cast<size_t>(o) * c;
        const float* src = values + static_cast<size_t>(n) * c;
        for (int k = 0; k < c; ++k) dst[k] += w * src[k];
      }

    // Blur along each axis: v <- (n1 + 2*v + n2) / 2 (unnormalised).
    std::vector<float> buf(static_cast<size_t>(M_) * c);
    for (int j = 0; j <= d_; ++j) {
      for (int m = 0; m < M_; ++m) {
        const float* v = lattice.data() + static_cast<size_t>(m) * c;
        int i1 = blur_n1_[static_cast<size_t>(m) * dp1 + j];
        int i2 = blur_n2_[static_cast<size_t>(m) * dp1 + j];
        const float* v1 = i1 >= 0
            ? lattice.data() + static_cast<size_t>(i1) * c : zeros(c);
        const float* v2 = i2 >= 0
            ? lattice.data() + static_cast<size_t>(i2) * c : zeros(c);
        float* dst = buf.data() + static_cast<size_t>(m) * c;
        for (int k = 0; k < c; ++k)
          dst[k] = 0.5f * (v1[k] + 2.f * v[k] + v2[k]);
      }
      std::memcpy(lattice.data(), buf.data(),
                  static_cast<size_t>(M_) * c * sizeof(float));
    }

    // Slice (with the alternating-sign normalisation constant).
    const float alpha = 1.0f / (1.0f + std::pow(2.0f, -float(d_)));
    for (int n = 0; n < N_; ++n) {
      float* dst = out + static_cast<size_t>(n) * c;
      for (int k = 0; k < c; ++k) dst[k] = 0.f;
      for (int j = 0; j <= d_; ++j) {
        int o = offsets_[static_cast<size_t>(n) * dp1 + j];
        float w = weights_[static_cast<size_t>(n) * dp1 + j];
        const float* src = lattice.data() + static_cast<size_t>(o) * c;
        for (int k = 0; k < c; ++k) dst[k] += w * src[k] * alpha;
      }
    }
  }

 private:
  static const float* zeros(int c) {
    static std::vector<float> z(4096, 0.f);
    if (static_cast<size_t>(c) > z.size()) z.assign(c, 0.f);
    return z.data();
  }

  int N_ = 0, d_ = 0, M_ = 0;
  std::vector<int> offsets_;
  std::vector<float> weights_;
  std::vector<int16_t> keys_;
  std::vector<int> blur_n1_, blur_n2_;
};

void softmax_rows(std::vector<float>& x, int n, int c) {
  for (int i = 0; i < n; ++i) {
    float* row = x.data() + static_cast<size_t>(i) * c;
    float mx = row[0];
    for (int k = 1; k < c; ++k) mx = std::max(mx, row[k]);
    float sum = 0.f;
    for (int k = 0; k < c; ++k) {
      row[k] = std::exp(row[k] - mx);
      sum += row[k];
    }
    for (int k = 0; k < c; ++k) row[k] /= sum;
  }
}

}  // namespace

extern "C" {

// out[N*c] = Gaussian-filter(values) over features (kernel exp(-|df|^2/2)).
void permutohedral_filter(const float* features, int n, int d,
                          const float* values, int c, float* out) {
  Permutohedral lattice;
  lattice.init(features, n, d);
  lattice.compute(values, c, out);
}

// Fully-connected CRF mean-field inference.
//   unary_logits: [N, L] mask maps (softmaxed internally, reference :1057)
//   image:        [N, 3] RGB 0-255
//   out_labels:   [N] int32 argmax labels
void densecrf_inference(const float* unary_logits, const float* image,
                        int height, int width, int num_labels, int num_iters,
                        float pos_w, float pos_xy_std, float bi_w,
                        float bi_xy_std, float bi_rgb_std,
                        int32_t* out_labels) {
  const int n = height * width;
  const int L = num_labels;

  // Q0 = softmax(logits); U = -log(clip(Q0, 1e-5, 1)).
  std::vector<float> q(unary_logits,
                       unary_logits + static_cast<size_t>(n) * L);
  softmax_rows(q, n, L);
  std::vector<float> unary(static_cast<size_t>(n) * L);
  for (size_t i = 0; i < unary.size(); ++i) {
    float p = q[i] < 1e-5f ? 1e-5f : (q[i] > 1.f ? 1.f : q[i]);
    unary[i] = -std::log(p);
  }

  // Feature sets.
  std::vector<float> f_sp(static_cast<size_t>(n) * 2);
  std::vector<float> f_bi(static_cast<size_t>(n) * 5);
  for (int y = 0; y < height; ++y)
    for (int x = 0; x < width; ++x) {
      int i = y * width + x;
      f_sp[i * 2 + 0] = x / pos_xy_std;
      f_sp[i * 2 + 1] = y / pos_xy_std;
      f_bi[i * 5 + 0] = x / bi_xy_std;
      f_bi[i * 5 + 1] = y / bi_xy_std;
      f_bi[i * 5 + 2] = image[i * 3 + 0] / bi_rgb_std;
      f_bi[i * 5 + 3] = image[i * 3 + 1] / bi_rgb_std;
      f_bi[i * 5 + 4] = image[i * 3 + 2] / bi_rgb_std;
    }

  Permutohedral lat_sp, lat_bi;
  lat_sp.init(f_sp.data(), n, 2);
  lat_bi.init(f_bi.data(), n, 5);

  // Symmetric normalisation: norm = 1/sqrt(K 1).
  std::vector<float> ones(n, 1.f), deg(n);
  std::vector<float> norm_sp(n), norm_bi(n);
  lat_sp.compute(ones.data(), 1, deg.data());
  for (int i = 0; i < n; ++i)
    norm_sp[i] = 1.0f / std::sqrt(deg[i] > 1e-20f ? deg[i] : 1e-20f);
  lat_bi.compute(ones.data(), 1, deg.data());
  for (int i = 0; i < n; ++i)
    norm_bi[i] = 1.0f / std::sqrt(deg[i] > 1e-20f ? deg[i] : 1e-20f);

  std::vector<float> tmp(static_cast<size_t>(n) * L);
  std::vector<float> msg(static_cast<size_t>(n) * L);
  std::vector<float> energy(static_cast<size_t>(n) * L);

  for (int it = 0; it < num_iters; ++it) {
    for (size_t i = 0; i < energy.size(); ++i) energy[i] = -unary[i];

    // Spatial term.
    for (int i = 0; i < n; ++i)
      for (int k = 0; k < L; ++k)
        tmp[static_cast<size_t>(i) * L + k] =
            q[static_cast<size_t>(i) * L + k] * norm_sp[i];
    lat_sp.compute(tmp.data(), L, msg.data());
    for (int i = 0; i < n; ++i)
      for (int k = 0; k < L; ++k)
        energy[static_cast<size_t>(i) * L + k] +=
            pos_w * msg[static_cast<size_t>(i) * L + k] * norm_sp[i];

    // Bilateral term.
    for (int i = 0; i < n; ++i)
      for (int k = 0; k < L; ++k)
        tmp[static_cast<size_t>(i) * L + k] =
            q[static_cast<size_t>(i) * L + k] * norm_bi[i];
    lat_bi.compute(tmp.data(), L, msg.data());
    for (int i = 0; i < n; ++i)
      for (int k = 0; k < L; ++k)
        energy[static_cast<size_t>(i) * L + k] +=
            bi_w * msg[static_cast<size_t>(i) * L + k] * norm_bi[i];

    q = energy;
    softmax_rows(q, n, L);
  }

  for (int i = 0; i < n; ++i) {
    const float* row = q.data() + static_cast<size_t>(i) * L;
    int best = 0;
    for (int k = 1; k < L; ++k)
      if (row[k] > row[best]) best = k;
    out_labels[i] = best;
  }
}

}  // extern "C"
