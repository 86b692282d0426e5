// egogs_io: native IO runtime for EgoGaussian-TPU.
//
// TPU-native counterpart of the reference's native data-path components
// (the reference leans on CUDA submodules for compute and python struct
// loops for COLMAP parsing — scene/colmap_loader.py:125-154 reads points3D
// one python-level struct.unpack per point, seconds at 100k+ points).
// This library does the host-side heavy IO in C++:
//   * COLMAP points3D.bin parsing (track-skipping single pass)
//   * COLMAP images.bin parsing (poses + names, 2D tracks skipped)
//   * binary-little-endian PLY vertex parsing into a column-major f32 matrix
//   * PLY writing
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  FILE* f = nullptr;
  explicit Reader(const char* path) { f = std::fopen(path, "rb"); }
  ~Reader() {
    if (f) std::fclose(f);
  }
  bool ok() const { return f != nullptr; }
  template <typename T>
  bool read(T* out, size_t n = 1) {
    return std::fread(out, sizeof(T), n, f) == n;
  }
  bool skip(long n) { return std::fseek(f, n, SEEK_CUR) == 0; }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// COLMAP points3D.bin
// ---------------------------------------------------------------------------

// Returns the number of points, or -1 on error. Caller first calls with
// xyz==nullptr to get the count, then allocates [n*3] f32 xyz, [n*3] u8 rgb,
// [n] f64 err and calls again.
long long egogs_read_points3d_bin(const char* path, float* xyz, uint8_t* rgb,
                                  double* err) {
  Reader r(path);
  if (!r.ok()) return -1;
  uint64_t n = 0;
  if (!r.read(&n)) return -1;
  if (xyz == nullptr) return (long long)n;
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t id;
    double p[3];
    uint8_t c[3];
    double e;
    uint64_t track_len;
    if (!r.read(&id) || !r.read(p, 3) || !r.read(c, 3) || !r.read(&e) ||
        !r.read(&track_len))
      return -1;
    if (!r.skip((long)(8 * track_len))) return -1;
    xyz[i * 3 + 0] = (float)p[0];
    xyz[i * 3 + 1] = (float)p[1];
    xyz[i * 3 + 2] = (float)p[2];
    rgb[i * 3 + 0] = c[0];
    rgb[i * 3 + 1] = c[1];
    rgb[i * 3 + 2] = c[2];
    err[i] = e;
  }
  return (long long)n;
}

// ---------------------------------------------------------------------------
// COLMAP images.bin: id, qvec[4], tvec[3], camera_id, name\0, tracks skipped
// ---------------------------------------------------------------------------

// First call with out==nullptr: returns count. Second call fills:
//   ids [n] i32, qvecs [n*4] f64, tvecs [n*3] f64, cam_ids [n] i32,
//   names: concatenated NUL-terminated strings into name_buf (cap bytes);
// returns count or -1 on error / -2 if name_buf too small.
long long egogs_read_images_bin(const char* path, int32_t* ids, double* qvecs,
                                double* tvecs, int32_t* cam_ids,
                                char* name_buf, long long name_cap) {
  Reader r(path);
  if (!r.ok()) return -1;
  uint64_t n = 0;
  if (!r.read(&n)) return -1;
  long long name_off = 0;
  for (uint64_t i = 0; i < n; ++i) {
    int32_t id, cam;
    double q[4], t[3];
    if (!r.read(&id) || !r.read(q, 4) || !r.read(t, 3) || !r.read(&cam))
      return -1;
    std::string name;
    for (;;) {
      char c;
      if (!r.read(&c)) return -1;
      if (c == '\0') break;
      name.push_back(c);
    }
    uint64_t npts;
    if (!r.read(&npts)) return -1;
    if (!r.skip((long)(24 * npts))) return -1;
    if (ids != nullptr) {
      ids[i] = id;
      cam_ids[i] = cam;
      std::memcpy(qvecs + i * 4, q, 4 * sizeof(double));
      std::memcpy(tvecs + i * 3, t, 3 * sizeof(double));
      if (name_off + (long long)name.size() + 1 > name_cap) return -2;
      std::memcpy(name_buf + name_off, name.c_str(), name.size() + 1);
      name_off += (long long)name.size() + 1;
    }
  }
  return (long long)n;
}

// ---------------------------------------------------------------------------
// PLY (binary little-endian, scalar float properties only)
// ---------------------------------------------------------------------------

// Parse the header: returns vertex count, writes num_props and the
// concatenated property names (NUL-separated) into prop_buf. -1 on error,
// -3 if not a pure-f32 binary_little_endian vertex PLY.
long long egogs_ply_header(const char* path, int32_t* num_props,
                           char* prop_buf, long long prop_cap,
                           long long* data_offset) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  long long count = -1;
  int nprops = 0;
  long long off = 0;
  bool binary_le = false;
  bool in_vertex = false;
  while (std::fgets(line, sizeof(line), f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("format ", 0) == 0) {
      binary_le = s.find("binary_little_endian") != std::string::npos;
    } else if (s.rfind("element vertex ", 0) == 0) {
      count = std::atoll(s.c_str() + 15);
      in_vertex = true;
    } else if (s.rfind("element ", 0) == 0) {
      in_vertex = false;
    } else if (s.rfind("property ", 0) == 0 && in_vertex) {
      if (s.rfind("property float ", 0) != 0) {
        std::fclose(f);
        return -3;
      }
      std::string name = s.substr(15);
      if (off + (long long)name.size() + 1 > prop_cap) {
        std::fclose(f);
        return -1;
      }
      std::memcpy(prop_buf + off, name.c_str(), name.size() + 1);
      off += (long long)name.size() + 1;
      ++nprops;
    } else if (s == "end_header") {
      *data_offset = std::ftell(f);
      break;
    }
  }
  std::fclose(f);
  if (!binary_le || count < 0) return -3;
  *num_props = nprops;
  return count;
}

// Read the vertex payload: out must hold count*num_props f32 (row-major).
long long egogs_ply_read_f32(const char* path, long long data_offset,
                             long long count, int32_t num_props, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, (long)data_offset, SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  size_t want = (size_t)count * (size_t)num_props;
  size_t got = std::fread(out, sizeof(float), want, f);
  std::fclose(f);
  return got == want ? (long long)count : -1;
}

// Write a binary-little-endian float PLY. names: NUL-separated property
// names; data: row-major [count, num_props] f32.
long long egogs_ply_write_f32(const char* path, const char* names,
                              int32_t num_props, const float* data,
                              long long count) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f, "ply\nformat binary_little_endian 1.0\n");
  std::fprintf(f, "element vertex %lld\n", count);
  const char* p = names;
  for (int i = 0; i < num_props; ++i) {
    std::fprintf(f, "property float %s\n", p);
    p += std::strlen(p) + 1;
  }
  std::fprintf(f, "end_header\n");
  size_t want = (size_t)count * (size_t)num_props;
  size_t got = std::fwrite(data, sizeof(float), want, f);
  std::fclose(f);
  return got == want ? count : -1;
}

}  // extern "C"
