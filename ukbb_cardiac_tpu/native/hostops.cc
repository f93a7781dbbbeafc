// Native host-side ops for ukbb_cardiac_tpu.
//
// The reference's only first-party native code is a C++ FFD-averaging
// tool (third_party/src/average_3d_ffd.cc) whose math moved onto the TPU
// (reg/register.py::average_fields).  The host-side hot loops that remain
// in THIS framework are per-frame connected-component passes inside the
// QC gates and the atrial area-length analysis
// (cardiac_utils.py:77-169,1616-1796 equivalents) — scipy.ndimage.label
// is called O(labels x frames) per subject.  This library provides:
//
//   cc_label_2d      union-find connected-component labelling
//                    (4- or 8-connectivity), one pass per frame
//   cc_stats_2d      component sizes in the same pass
//   largest_cc_2d    mask of the largest component
//   count_significant_cc_2d  number of components above a pixel threshold
//   label_areas_4d   per-label voxel counts over a 4D (X,Y,Z,T) volume
//
// Built as a plain shared library; Python binds via ctypes
// (ukbb_cardiac_tpu/native/__init__.py) with a numpy/scipy fallback.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find over the pixel grid.
// ---------------------------------------------------------------------------

static inline int32_t uf_find(std::vector<int32_t>& parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

static inline void uf_union(std::vector<int32_t>& parent, int32_t a,
                            int32_t b) {
  a = uf_find(parent, a);
  b = uf_find(parent, b);
  if (a != b) parent[b] = a;
}

// Label a binary 2D image (row-major, shape ny x nx... caller passes
// dims; the algorithm is orientation-agnostic).  connectivity: 1 = faces,
// 2 = faces + diagonals.  Returns the number of components; labels out[i]
// in 1..n (0 = background).
int32_t cc_label_2d(const uint8_t* binary, int32_t nx, int32_t ny,
                    int32_t connectivity, int32_t* out) {
  const int64_t n = (int64_t)nx * ny;
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = (int32_t)i;

  for (int32_t y = 0; y < ny; ++y) {
    for (int32_t x = 0; x < nx; ++x) {
      const int64_t i = (int64_t)y * nx + x;
      if (!binary[i]) continue;
      if (x > 0 && binary[i - 1]) uf_union(parent, (int32_t)i, (int32_t)(i - 1));
      if (y > 0 && binary[i - nx]) uf_union(parent, (int32_t)i, (int32_t)(i - nx));
      if (connectivity >= 2 && y > 0) {
        if (x > 0 && binary[i - nx - 1])
          uf_union(parent, (int32_t)i, (int32_t)(i - nx - 1));
        if (x < nx - 1 && binary[i - nx + 1])
          uf_union(parent, (int32_t)i, (int32_t)(i - nx + 1));
      }
    }
  }

  // compress to consecutive labels
  std::vector<int32_t> remap(n, 0);
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!binary[i]) {
      out[i] = 0;
      continue;
    }
    int32_t root = uf_find(parent, (int32_t)i);
    if (remap[root] == 0) remap[root] = ++next;
    out[i] = remap[root];
  }
  return next;
}

// Component sizes: sizes[k-1] = pixel count of component k.
// sizes must have room for n_components entries (call cc_label_2d first).
void cc_sizes(const int32_t* labels, int64_t n, int32_t n_components,
              int64_t* sizes) {
  std::memset(sizes, 0, sizeof(int64_t) * n_components);
  for (int64_t i = 0; i < n; ++i) {
    if (labels[i] > 0) sizes[labels[i] - 1]++;
  }
}

// Largest connected component as a 0/1 mask. Returns its size (0 if none).
int64_t largest_cc_2d(const uint8_t* binary, int32_t nx, int32_t ny,
                      int32_t connectivity, uint8_t* out_mask) {
  const int64_t n = (int64_t)nx * ny;
  std::vector<int32_t> labels(n);
  int32_t nc = cc_label_2d(binary, nx, ny, connectivity, labels.data());
  if (nc == 0) {
    std::memset(out_mask, 0, n);
    return 0;
  }
  std::vector<int64_t> sizes(nc);
  cc_sizes(labels.data(), n, nc, sizes.data());
  int32_t best = 0;
  for (int32_t k = 1; k < nc; ++k)
    if (sizes[k] > sizes[best]) best = k;
  for (int64_t i = 0; i < n; ++i) out_mask[i] = (labels[i] == best + 1);
  return sizes[best];
}

// Number of components larger than pixel_thres (the QC fragmentation
// criterion, 8-connectivity in the reference).
int32_t count_significant_cc_2d(const uint8_t* binary, int32_t nx, int32_t ny,
                                int32_t connectivity, int64_t pixel_thres) {
  const int64_t n = (int64_t)nx * ny;
  std::vector<int32_t> labels(n);
  int32_t nc = cc_label_2d(binary, nx, ny, connectivity, labels.data());
  if (nc == 0) return 0;
  std::vector<int64_t> sizes(nc);
  cc_sizes(labels.data(), n, nc, sizes.data());
  int32_t count = 0;
  for (int32_t k = 0; k < nc; ++k)
    if (sizes[k] > pixel_thres) count++;
  return count;
}

// Zero out components smaller than thres pixels (remove_small_cc).
void remove_small_cc_2d(const uint8_t* binary, int32_t nx, int32_t ny,
                        int32_t connectivity, int64_t thres,
                        uint8_t* out_mask) {
  const int64_t n = (int64_t)nx * ny;
  std::vector<int32_t> labels(n);
  int32_t nc = cc_label_2d(binary, nx, ny, connectivity, labels.data());
  std::vector<int64_t> sizes(nc);
  if (nc > 0) cc_sizes(labels.data(), n, nc, sizes.data());
  for (int64_t i = 0; i < n; ++i) {
    out_mask[i] = (labels[i] > 0 && sizes[labels[i] - 1] >= thres);
  }
}

// Per-label voxel counts over an int16 4D volume laid out (X,Y,Z,T)
// C-order or any order — it is a flat histogram. counts has n_labels
// entries; values outside [0, n_labels) are ignored.
void label_areas(const int16_t* volume, int64_t n, int32_t n_labels,
                 int64_t* counts) {
  std::memset(counts, 0, sizeof(int64_t) * n_labels);
  for (int64_t i = 0; i < n; ++i) {
    int16_t v = volume[i];
    if (v >= 0 && v < n_labels) counts[v]++;
  }
}

// Per-frame per-label counts: volume (X*Y*Z, T) flattened frame-major
// is awkward; instead caller passes stride so counts[t * n_labels + v].
void label_areas_per_frame(const int16_t* volume, int64_t frame_voxels,
                           int32_t n_frames, int32_t n_labels,
                           int64_t* counts) {
  std::memset(counts, 0, sizeof(int64_t) * n_labels * n_frames);
  for (int32_t t = 0; t < n_frames; ++t) {
    const int16_t* frame = volume + (int64_t)t * frame_voxels;
    int64_t* c = counts + (int64_t)t * n_labels;
    for (int64_t i = 0; i < frame_voxels; ++i) {
      int16_t v = frame[i];
      if (v >= 0 && v < n_labels) c[v]++;
    }
  }
}

}  // extern "C"
