// COCO mask codec — native core for pnp_ovss_tpu/data/rle.py.
//
// The reference depends on pycocotools (a C extension) for annToMask
// (PnP_OVSS_0514_updated_segmentation_coco.py:1095-1125). This is a
// from-scratch implementation of the needed subset against the published
// COCO API format: LEB128-style ASCII compressed RLE, raw counts lists,
// and even-odd polygon scanline rasterisation at pixel centers. Semantics
// match the pure-numpy fallback in data/rle.py bit-for-bit (cross-tested
// in tests/test_rle_native.py); this path exists because the Python
// rasteriser's per-row loop dominates COCO ground-truth loading.
//
// All outputs are row-major [h, w] uint8 masks (the COCO RLE stream itself
// is column-major; the transpose happens here, once, in cache-friendly
// blocks).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Fill a column-major run-length stream into a row-major mask.
int counts_fill(const std::vector<int64_t>& counts, int64_t h, int64_t w,
                uint8_t* out) {
  const int64_t hw = h * w;
  std::vector<uint8_t> col(static_cast<size_t>(hw), 0);
  int64_t pos = 0;
  int val = 0;
  for (int64_t c : counts) {
    // NOTE: written as `c > hw - pos` (pos <= hw is an invariant), NOT
    // `pos + c > hw`: a malformed stream can decode c near INT64_MAX and
    // the addition would signed-overflow past the bounds check.
    if (c < 0 || c > hw - pos) return -1;
    if (val) std::memset(col.data() + pos, 1, static_cast<size_t>(c));
    pos += c;
    val ^= 1;
  }
  // col[x * h + y] -> out[y * w + x], blocked for locality.
  const int64_t B = 64;
  for (int64_t y0 = 0; y0 < h; y0 += B)
    for (int64_t x0 = 0; x0 < w; x0 += B) {
      const int64_t y1 = y0 + B < h ? y0 + B : h;
      const int64_t x1 = x0 + B < w ? x0 + B : w;
      for (int64_t y = y0; y < y1; ++y)
        for (int64_t x = x0; x < x1; ++x) out[y * w + x] = col[x * h + y];
    }
  return 0;
}

}  // namespace

extern "C" {

// COCO compressed RLE ASCII string -> row-major [h, w] uint8 mask.
// Returns 0 on success, -1 on malformed input.
int rle_decode_string(const char* s, int64_t h, int64_t w, uint8_t* out) {
  std::vector<int64_t> counts;
  for (const char* p = s; *p;) {
    // Accumulate in uint64_t: the 13th char (k == 12) shifts its payload
    // to bit 60, and payloads >= 8 would overflow into/past the int64
    // sign bit — signed-overflow UB before C++20. Unsigned shifts and the
    // final wraparound cast are fully defined.
    uint64_t ux = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (!*p) return -1;
      // 13 x 5-bit chars exceed the 64-bit range; reject over-long
      // (malformed/corrupt) varints outright.
      if (k > 12) return -1;
      const uint64_t c = static_cast<uint64_t>(*p) - 48;
      ux |= (c & 0x1F) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10) && 5 * k < 64) ux |= ~uint64_t{0} << (5 * k);
    }
    int64_t x = static_cast<int64_t>(ux);
    if (counts.size() > 2) x += counts[counts.size() - 2];
    counts.push_back(x);
  }
  return counts_fill(counts, h, w, out);
}

// Raw (uncompressed) counts list -> row-major [h, w] uint8 mask.
int rle_decode_counts(const int64_t* counts, int64_t n, int64_t h, int64_t w,
                      uint8_t* out) {
  return counts_fill(std::vector<int64_t>(counts, counts + n), h, w, out);
}

// COCO polygon list -> row-major [h, w] uint8 mask.
// xy: concatenated (x, y) vertex pairs for all polygons; sizes[i] = vertex
// count of polygon i. Even-odd scanline fill at pixel centers (y + 0.5),
// XOR-composited per polygon — exactly the numpy rasteriser's semantics.
int rle_rasterize_polygons(const double* xy, const int64_t* sizes,
                           int64_t npoly, int64_t h, int64_t w,
                           uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(h * w));
  std::vector<double> cross;
  const double* v = xy;
  for (int64_t pi = 0; pi < npoly; ++pi) {
    const int64_t n = sizes[pi];
    if (n < 3) {
      v += 2 * n;
      continue;
    }
    for (int64_t y = 0; y < h; ++y) {
      const double cy = y + 0.5;
      cross.clear();
      for (int64_t i = 0; i < n; ++i) {
        const int64_t j = (i + 1) % n;
        const double y0 = v[2 * i + 1], y1 = v[2 * j + 1];
        if ((y0 <= cy) != (y1 <= cy)) {
          const double t = (cy - y0) / (y1 - y0);
          cross.push_back(v[2 * i] + t * (v[2 * j] - v[2 * i]));
        }
      }
      if (cross.empty()) continue;
      std::sort(cross.begin(), cross.end());
      for (size_t k = 0; k + 1 < cross.size(); k += 2) {
        const int64_t lo =
            static_cast<int64_t>(std::ceil(cross[k] - 0.5));
        const int64_t hi =
            static_cast<int64_t>(std::floor(cross[k + 1] - 0.5));
        if (hi < lo) continue;
        const int64_t a = lo > 0 ? lo : 0;
        const int64_t b = hi + 1 < w ? hi + 1 : w;
        for (int64_t x = a; x < b; ++x) out[y * w + x] ^= 1;
      }
    }
    v += 2 * n;
  }
  return 0;
}

}  // extern "C"
