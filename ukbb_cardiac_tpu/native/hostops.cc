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
//   largest_cc_2d    mask of the largest component
//   count_significant_cc_2d  number of components above a pixel threshold
//   remove_small_cc_2d       zero components below a pixel threshold
//   label_areas_per_frame    per-frame per-label voxel counts (4D volume)
//   dicom_scan       DICOM element walker for the Biobank attribute subset
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


// ---------------------------------------------------------------------------
// DICOM element scanner (data-loader fast path).
//
// Mirrors data/dicom.py::_parse_dataset exactly: walks an implicit- or
// explicit-VR little-endian dataset, records (tag_index, value_offset,
// value_length, vr_code) for the attribute subset Biobank_Dataset
// consumes, and skips items / undefined-length sequences.  Value decoding
// (ASCII numerics, backslash lists) stays in Python — the hot cost is the
// per-element walk over thousands of files, not the ~20 tiny decodes.
//
// Returns: number of entries written (>= 0); -1 for an unsupported
// transfer syntax or encapsulated (compressed) pixel data; -2 for a
// truncated / malformed stream.  vr_code is the two ASCII VR bytes packed
// little-endian, 0 in implicit-VR files.
// ---------------------------------------------------------------------------

// (group << 16) | element, ascending — MUST match _SCAN_NAMES in
// ukbb_cardiac_tpu/data/dicom.py.
static const uint32_t kDicomWanted[] = {
    0x00080018u,  // SOPInstanceUID
    0x0008103Eu,  // SeriesDescription
    0x00180050u,  // SliceThickness
    0x00180088u,  // SpacingBetweenSlices
    0x00181060u,  // TriggerTime
    0x00181090u,  // CardiacNumberOfImages
    0x0020000Eu,  // SeriesInstanceUID
    0x00200013u,  // InstanceNumber
    0x00200032u,  // ImagePositionPatient
    0x00200037u,  // ImageOrientationPatient
    0x00280002u,  // SamplesPerPixel
    0x00280008u,  // NumberOfFrames
    0x00280010u,  // Rows
    0x00280011u,  // Columns
    0x00280030u,  // PixelSpacing
    0x00280100u,  // BitsAllocated
    0x00280103u,  // PixelRepresentation
    0x00281052u,  // RescaleIntercept
    0x00281053u,  // RescaleSlope
    0x7FE00010u,  // PixelData
};
static const int kDicomWantedN =
    sizeof(kDicomWanted) / sizeof(kDicomWanted[0]);

static inline uint16_t rd16(const uint8_t* b, int64_t p) {
  return (uint16_t)(b[p] | (b[p + 1] << 8));
}
static inline uint32_t rd32(const uint8_t* b, int64_t p) {
  return (uint32_t)(b[p] | (b[p + 1] << 8) | (b[p + 2] << 16) |
                    ((uint32_t)b[p + 3] << 24));
}

static inline int dicom_tag_index(uint32_t key) {
  int lo = 0, hi = kDicomWantedN - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (kDicomWanted[mid] == key) return mid;
    if (kDicomWanted[mid] < key) lo = mid + 1; else hi = mid - 1;
  }
  return -1;
}

static inline bool dicom_long_vr(uint8_t a, uint8_t b) {
  // OB OW OF SQ UT UN — the explicit-VR forms with a 4-byte length
  return (a == 'O' && (b == 'B' || b == 'W' || b == 'F')) ||
         (a == 'S' && b == 'Q') || (a == 'U' && (b == 'T' || b == 'N'));
}

// twin of data/dicom.py::_skip_undefined
static int64_t dicom_skip_undefined(const uint8_t* b, int64_t n, int64_t pos,
                                    bool explicit_vr) {
  int depth = 1;
  while (pos + 8 <= n && depth > 0) {
    uint16_t group = rd16(b, pos), elem = rd16(b, pos + 2);
    if (group == 0xFFFE &&
        (elem == 0xE000 || elem == 0xE00D || elem == 0xE0DD)) {
      uint32_t length = rd32(b, pos + 4);
      pos += 8;
      if (elem == 0xE0DD) {
        depth -= 1;
      } else if (elem == 0xE000 && length != 0xFFFFFFFFu) {
        pos += length;
      }
      continue;
    }
    uint32_t length;
    if (explicit_vr) {
      uint8_t v0 = b[pos + 4], v1 = b[pos + 5];
      if (dicom_long_vr(v0, v1)) {
        if (pos + 12 > n) return n;  // truncated right after tag+VR
        length = rd32(b, pos + 8);
        pos += 12;
      } else {
        length = rd16(b, pos + 6);
        pos += 8;
      }
    } else {
      length = rd32(b, pos + 4);
      pos += 8;
    }
    if (length == 0xFFFFFFFFu) depth += 1;
    else pos += length;
  }
  return pos;
}

int64_t dicom_scan(const uint8_t* buf, int64_t n, int64_t* out,
                   int64_t out_cap) {
  int64_t pos = 0;
  bool explicit_vr = false;  // raw datasets default to implicit VR LE
  if (n >= 132 && memcmp(buf + 128, "DICM", 4) == 0) {
    pos = 132;
    char transfer[64];
    transfer[0] = '\0';
    while (pos + 8 <= n) {
      uint16_t group = rd16(buf, pos), elem = rd16(buf, pos + 2);
      if (group != 0x0002) break;
      uint8_t v0 = buf[pos + 4], v1 = buf[pos + 5];
      uint32_t length;
      int64_t hdr;
      if (dicom_long_vr(v0, v1)) {
        if (pos + 12 > n) return -2;  // truncated right after tag+VR
        length = rd32(buf, pos + 8);
        hdr = 12;
      } else {
        length = rd16(buf, pos + 6);
        hdr = 8;
      }
      if (group == 0x0002 && elem == 0x0010) {
        uint32_t m = length < 63 ? length : 63;
        if (pos + hdr + m > n) return -2;
        memcpy(transfer, buf + pos + hdr, m);
        transfer[m] = '\0';
        // strip trailing NUL/space padding
        for (int i = (int)m - 1;
             i >= 0 && (transfer[i] == '\0' || transfer[i] == ' '); --i)
          transfer[i] = '\0';
      }
      pos += hdr + length;
    }
    if (strcmp(transfer, "1.2.840.10008.1.2") == 0) explicit_vr = false;
    else if (strcmp(transfer, "1.2.840.10008.1.2.1") == 0) explicit_vr = true;
    else return -1;
  }

  int64_t count = 0;
  while (pos + 8 <= n) {
    uint16_t group = rd16(buf, pos), elem = rd16(buf, pos + 2);
    pos += 4;
    if (group == 0xFFFE && (elem == 0xE00D || elem == 0xE0DD)) {
      pos += 4;
      continue;
    }
    uint16_t vr_code = 0;
    uint32_t length;
    if (group == 0xFFFE && elem == 0xE000) {  // item inside SQ
      length = rd32(buf, pos);
      pos += 4;
      if (length == 0xFFFFFFFFu) pos = dicom_skip_undefined(buf, n, pos,
                                                            explicit_vr);
      else pos += length;
      continue;
    }
    if (explicit_vr) {
      uint8_t v0 = buf[pos], v1 = buf[pos + 1];
      vr_code = (uint16_t)(v0 | (v1 << 8));
      if (dicom_long_vr(v0, v1)) {
        if (pos + 8 > n) return -2;  // truncated right after tag+VR
        length = rd32(buf, pos + 4);
        pos += 8;
      } else {
        length = rd16(buf, pos + 2);
        pos += 4;
      }
    } else {
      length = rd32(buf, pos);
      pos += 4;
    }
    if (length == 0xFFFFFFFFu) {
      if (group == 0x7FE0 && elem == 0x0010) return -1;  // encapsulated
      pos = dicom_skip_undefined(buf, n, pos, explicit_vr);
      continue;
    }
    if (pos + (int64_t)length > n) return -2;
    int idx = dicom_tag_index(((uint32_t)group << 16) | elem);
    if (idx >= 0) {
      // table full: DECLINE (-2) so the caller uses the pure-Python
      // parser, instead of silently dropping later wanted tags (which
      // would lose PixelData first and invert duplicate-value rules)
      if (count >= out_cap) return -2;
      out[count * 4 + 0] = idx;
      out[count * 4 + 1] = pos;
      out[count * 4 + 2] = (int64_t)length;
      out[count * 4 + 3] = vr_code;
      ++count;
    }
    pos += length;
  }
  return count;
}

}  // extern "C"
