// Native asset pipeline: OBJ parsing + tangent-frame generation.
//
// The reference engine's loader layer is native Rust (src/resource_loader.rs,
// src/model.rs:316-520); this is the TPU build's native equivalent — a small
// C ABI consumed from Python via ctypes (assets/native.py). Semantics match
// the Python fallback exactly (assets/mesh.py parse_obj_text /
// compute_tangents), which is itself the reference's algorithm:
//   - unified v/vt/vn index map with negative-index support
//   - polygon fan triangulation (model merging offsets like
//     src/resource_loader.rs:316-353)
//   - per-triangle tangent/bitangent solve, accumulate, average by incident
//     triangle count (src/model.rs:442-499)
//
// Build: g++ -O3 -shared -fPIC -o libtr_assets.so asset_loader.cpp -lz

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

struct MeshBuffers {
  std::vector<float> positions;   // 3 per vertex
  std::vector<float> tex_coords;  // 2 per vertex
  std::vector<float> normals;     // 3 per vertex
  std::vector<int32_t> indices;
};

// Result handle returned to Python; freed by tr_mesh_free.
struct MeshResult {
  MeshBuffers buf;
  std::string error;
};

inline bool is_space(char c) { return c == ' ' || c == '\t' || c == '\r'; }

// Parse one float, advancing p. strtof handles exponents the same way
// Python float() does for OBJ content.
inline float read_float(const char*& p, const char* end) {
  char* out = nullptr;
  float v = strtof(p, &out);
  p = (out && out <= end) ? out : p;
  return v;
}

struct TokenKey {
  int pi, ti, ni;
  bool operator==(const TokenKey& o) const {
    return pi == o.pi && ti == o.ti && ni == o.ni;
  }
};
struct TokenKeyHash {
  size_t operator()(const TokenKey& k) const {
    size_t h = (size_t)(uint32_t)k.pi;
    h = h * 1000003u ^ (size_t)(uint32_t)(k.ti + 1);
    h = h * 1000003u ^ (size_t)(uint32_t)(k.ni + 1);
    return h;
  }
};

}  // namespace

extern "C" {

// Parse OBJ text -> MeshResult*. NULL only on allocation failure; check
// tr_mesh_error() for parse errors (empty string = ok).
void* tr_parse_obj(const char* text, int64_t len) {
  auto* res = new (std::nothrow) MeshResult();
  if (!res) return nullptr;
  MeshBuffers& m = res->buf;

  std::vector<float> raw_pos, raw_uv, raw_norm;  // flat 3/2/3
  std::unordered_map<TokenKey, int32_t, TokenKeyHash> vert_map;
  std::vector<int32_t> face;  // scratch, reused per face

  const char* p = text;
  const char* end = text + len;
  while (p < end) {
    const char* line_end = (const char*)memchr(p, '\n', end - p);
    if (!line_end) line_end = end;
    const char* q = p;
    while (q < line_end && is_space(*q)) ++q;

    if (q + 1 < line_end && q[0] == 'v' && is_space(q[1])) {
      q += 2;
      for (int k = 0; k < 3; ++k) raw_pos.push_back(read_float(q, line_end));
    } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 't' && is_space(q[2])) {
      q += 3;
      raw_uv.push_back(read_float(q, line_end));
      while (q < line_end && is_space(*q)) ++q;
      raw_uv.push_back(q < line_end && *q != '\n' && *q != '#'
                           ? read_float(q, line_end) : 0.0f);
    } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 'n' && is_space(q[2])) {
      q += 3;
      for (int k = 0; k < 3; ++k) raw_norm.push_back(read_float(q, line_end));
    } else if (q + 1 < line_end && q[0] == 'f' && is_space(q[1])) {
      q += 2;
      face.clear();
      while (q < line_end) {
        while (q < line_end && is_space(*q)) ++q;
        if (q >= line_end || *q == '#') break;
        // token: i[/ti][/ni] with optional negatives
        long pi = strtol(q, (char**)&q, 10);
        long ti = 0, ni = 0;
        bool has_t = false, has_n = false;
        if (q < line_end && *q == '/') {
          ++q;
          if (q < line_end && *q != '/') {
            ti = strtol(q, (char**)&q, 10);
            has_t = true;
          }
          if (q < line_end && *q == '/') {
            ++q;
            ni = strtol(q, (char**)&q, 10);
            has_n = true;
          }
        }
        int npos = (int)(raw_pos.size() / 3);
        int nuv = (int)(raw_uv.size() / 2);
        int nnm = (int)(raw_norm.size() / 3);
        int rpi = pi > 0 ? (int)pi - 1 : npos + (int)pi;
        int rti = has_t ? (ti > 0 ? (int)ti - 1 : nuv + (int)ti) : -1;
        int rni = has_n ? (ni > 0 ? (int)ni - 1 : nnm + (int)ni) : -1;
        if (rpi < 0 || rpi >= npos || (has_t && (rti < 0 || rti >= nuv)) ||
            (has_n && (rni < 0 || rni >= nnm))) {
          res->error = "face index out of range";
          return res;
        }
        TokenKey key{rpi, rti, rni};
        auto it = vert_map.find(key);
        int32_t vid;
        if (it != vert_map.end()) {
          vid = it->second;
        } else {
          vid = (int32_t)(m.positions.size() / 3);
          m.positions.insert(m.positions.end(), &raw_pos[3 * rpi],
                             &raw_pos[3 * rpi] + 3);
          if (rti >= 0) {
            m.tex_coords.insert(m.tex_coords.end(), &raw_uv[2 * rti],
                                &raw_uv[2 * rti] + 2);
          } else {
            m.tex_coords.push_back(0.0f);
            m.tex_coords.push_back(0.0f);
          }
          if (rni >= 0) {
            m.normals.insert(m.normals.end(), &raw_norm[3 * rni],
                             &raw_norm[3 * rni] + 3);
          } else {
            m.normals.insert(m.normals.end(), {0.0f, 0.0f, 0.0f});
          }
          vert_map.emplace(key, vid);
        }
        face.push_back(vid);
      }
      for (size_t k = 1; k + 1 < face.size(); ++k) {  // fan triangulation
        m.indices.push_back(face[0]);
        m.indices.push_back(face[k]);
        m.indices.push_back(face[k + 1]);
      }
    }
    p = line_end + 1;
  }
  return res;
}

const char* tr_mesh_error(void* handle) {
  return ((MeshResult*)handle)->error.c_str();
}
int64_t tr_mesh_num_vertices(void* handle) {
  return (int64_t)(((MeshResult*)handle)->buf.positions.size() / 3);
}
int64_t tr_mesh_num_indices(void* handle) {
  return (int64_t)((MeshResult*)handle)->buf.indices.size();
}
void tr_mesh_copy(void* handle, float* positions, float* tex_coords,
                  float* normals, int32_t* indices) {
  MeshBuffers& m = ((MeshResult*)handle)->buf;
  memcpy(positions, m.positions.data(), m.positions.size() * sizeof(float));
  memcpy(tex_coords, m.tex_coords.data(), m.tex_coords.size() * sizeof(float));
  memcpy(normals, m.normals.data(), m.normals.size() * sizeof(float));
  memcpy(indices, m.indices.data(), m.indices.size() * sizeof(int32_t));
}
void tr_mesh_free(void* handle) { delete (MeshResult*)handle; }

// Tangent/bitangent generation (src/model.rs:442-499 in double precision,
// identical to the numpy fallback).
void tr_compute_tangents(const float* positions, const float* tex_coords,
                         const int32_t* indices, int64_t num_vertices,
                         int64_t num_indices, float* tangents_out,
                         float* bitangents_out) {
  std::vector<double> tan_acc(num_vertices * 3, 0.0);
  std::vector<double> bit_acc(num_vertices * 3, 0.0);
  std::vector<double> counts(num_vertices, 0.0);

  for (int64_t t = 0; t + 2 < num_indices; t += 3) {
    int32_t i0 = indices[t], i1 = indices[t + 1], i2 = indices[t + 2];
    double p0[3], p1[3], p2[3];
    for (int k = 0; k < 3; ++k) {
      p0[k] = positions[3 * i0 + k];
      p1[k] = positions[3 * i1 + k];
      p2[k] = positions[3 * i2 + k];
    }
    double d1u = (double)tex_coords[2 * i1] - tex_coords[2 * i0];
    double d1v = (double)tex_coords[2 * i1 + 1] - tex_coords[2 * i0 + 1];
    double d2u = (double)tex_coords[2 * i2] - tex_coords[2 * i0];
    double d2v = (double)tex_coords[2 * i2 + 1] - tex_coords[2 * i0 + 1];
    double det = d1u * d2v - d2u * d1v;
    double r = 1.0 / (fabs(det) < 1e-20 ? 1e-20 : det);
    for (int k = 0; k < 3; ++k) {
      double e1 = p1[k] - p0[k], e2 = p2[k] - p0[k];
      double tan = (e1 * d2v - e2 * d1v) * r;
      double bit = -(e2 * d1u - e1 * d2u) * r;
      tan_acc[3 * i0 + k] += tan;
      tan_acc[3 * i1 + k] += tan;
      tan_acc[3 * i2 + k] += tan;
      bit_acc[3 * i0 + k] += bit;
      bit_acc[3 * i1 + k] += bit;
      bit_acc[3 * i2 + k] += bit;
    }
    counts[i0] += 1.0;
    counts[i1] += 1.0;
    counts[i2] += 1.0;
  }
  for (int64_t v = 0; v < num_vertices; ++v) {
    double c = counts[v] > 0.0 ? counts[v] : 1.0;
    for (int k = 0; k < 3; ++k) {
      tangents_out[3 * v + k] = (float)(tan_acc[3 * v + k] / c);
      bitangents_out[3 * v + k] = (float)(bit_acc[3 * v + k] / c);
    }
  }
}

// PNG encode (viewer frame streaming + screenshot writes). The reference
// writes frames through wgpu's swapchain; our viewer streams PNG over
// HTTP, and PIL's encoder costs 26-350 ms per 1080p frame on this host —
// a per-frame host bottleneck. Sub-filter + zlib level 1 keeps the
// stream small on rendered content while staying fast.
//
// Returns a malloc'd buffer (caller frees with tr_png_free); *out_len = 0
// on failure. img is (h, w, c) uint8, c in {3, 4}, row-major contiguous.
unsigned char* tr_encode_png(const unsigned char* img, int64_t h, int64_t w,
                             int64_t c, int64_t* out_len);
void tr_png_free(unsigned char* buf) { free(buf); }

static void png_put_be32(std::vector<unsigned char>& v, uint32_t x) {
  v.push_back((x >> 24) & 0xff);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back(x & 0xff);
}

static void png_chunk(std::vector<unsigned char>& out, const char type[4],
                      const unsigned char* data, size_t len) {
  png_put_be32(out, (uint32_t)len);
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = (uint32_t)crc32(0L, out.data() + start, (uInt)(len + 4));
  png_put_be32(out, crc);
}

unsigned char* tr_encode_png(const unsigned char* img, int64_t h, int64_t w,
                             int64_t c, int64_t* out_len) {
  *out_len = 0;
  if ((c != 3 && c != 4) || h <= 0 || w <= 0) return nullptr;
  const size_t row = (size_t)w * c;
  // Sub-filtered scanlines: filter byte 1 + per-byte left-delta. Cheap and
  // compresses rendered gradients far better than filter 0.
  std::vector<unsigned char> raw((row + 1) * h);
  for (int64_t y = 0; y < h; ++y) {
    unsigned char* dst = raw.data() + (size_t)y * (row + 1);
    const unsigned char* src = img + (size_t)y * row;
    dst[0] = 1;  // Sub
    for (size_t x = 0; x < row; ++x)
      dst[1 + x] = (unsigned char)(src[x] - (x >= (size_t)c ? src[x - c] : 0));
  }
  uLongf zcap = compressBound((uLong)raw.size());
  std::vector<unsigned char> zbuf(zcap);
  if (compress2(zbuf.data(), &zcap, raw.data(), (uLong)raw.size(), 1) != Z_OK)
    return nullptr;

  std::vector<unsigned char> out;
  out.reserve(zcap + 128);
  static const unsigned char sig[8] = {137, 'P', 'N', 'G', 13, 10, 26, 10};
  out.insert(out.end(), sig, sig + 8);
  unsigned char ihdr[13];
  ihdr[0] = (unsigned char)((w >> 24) & 0xff);
  ihdr[1] = (unsigned char)((w >> 16) & 0xff);
  ihdr[2] = (unsigned char)((w >> 8) & 0xff);
  ihdr[3] = (unsigned char)(w & 0xff);
  ihdr[4] = (unsigned char)((h >> 24) & 0xff);
  ihdr[5] = (unsigned char)((h >> 16) & 0xff);
  ihdr[6] = (unsigned char)((h >> 8) & 0xff);
  ihdr[7] = (unsigned char)(h & 0xff);
  ihdr[8] = 8;                          // bit depth
  ihdr[9] = (c == 3) ? 2 : 6;           // color type: RGB / RGBA
  ihdr[10] = ihdr[11] = ihdr[12] = 0;   // compression/filter/interlace
  png_chunk(out, "IHDR", ihdr, 13);
  png_chunk(out, "IDAT", zbuf.data(), zcap);
  png_chunk(out, "IEND", nullptr, 0);

  unsigned char* buf = (unsigned char*)malloc(out.size());
  if (!buf) return nullptr;
  memcpy(buf, out.data(), out.size());
  *out_len = (int64_t)out.size();
  return buf;
}

// Radiance HDR (RGBE) scanline decode — the native analog of the
// reference's `radiant` crate load (src/texture.rs:166-192). The Python
// fallback (assets/hdr.py decode_hdr) runs the adaptive-RLE inner loop
// per scanline per channel in the interpreter; env maps are the largest
// assets the engine loads, so this is the loader's hot path. Output is
// the raw (h, w, 4) RGBE u8 image — the float conversion stays in numpy
// (vectorized, and shared with the Python decoder so both paths are
// bit-identical by construction).
//
// Returns a malloc'd h*w*4 buffer (caller frees with tr_buf_free) or NULL
// on malformed/truncated input; *out_w/*out_h carry the dimensions.
unsigned char* tr_decode_hdr(const unsigned char* data, int64_t len,
                             int64_t* out_w, int64_t* out_h) {
  *out_w = *out_h = 0;
  if (len < 2 || data[0] != '#' || data[1] != '?') return nullptr;
  // header: lines until an empty line, then the resolution line
  int64_t pos = 0;
  while (true) {
    const unsigned char* nl = (const unsigned char*)memchr(
        data + pos, '\n', (size_t)(len - pos));
    if (!nl) return nullptr;
    int64_t eol = nl - data;
    if (eol == pos) { pos = eol + 1; break; }  // empty line ends header
    pos = eol + 1;
  }
  const unsigned char* nl = (const unsigned char*)memchr(
      data + pos, '\n', (size_t)(len - pos));
  if (!nl) return nullptr;
  std::string dims((const char*)(data + pos), (size_t)(nl - data - pos));
  int64_t h = 0, w = 0;
  // Bound dimensions to plausible env maps (up to 16k x 8k equirect):
  // a hostile/corrupt header like "-Y 65535 +X 65535" must be rejected
  // here, not turned into a 17 GB malloc the OOM killer answers. Other
  // orientations unsupported (matches hdr.py).
  if (sscanf(dims.c_str(), "-Y %ld +X %ld", (long*)&h, (long*)&w) != 2 ||
      h <= 0 || w <= 0 || h > 32768 || w > 32768 ||
      h * w > (int64_t)1 << 27)
    return nullptr;
  pos = (nl - data) + 1;

  unsigned char* rgbe = (unsigned char*)malloc((size_t)(h * w * 4));
  if (!rgbe) return nullptr;
  int64_t off = pos;
  for (int64_t y = 0; y < h; ++y) {
    unsigned char* row = rgbe + (size_t)(y * w * 4);
    // adaptive RLE scanline: 0x02 0x02 hi lo, then 4 RLE-coded channels
    if (w >= 8 && w <= 0x7fff && off + 4 <= len && data[off] == 2 &&
        data[off + 1] == 2 &&
        ((int64_t)data[off + 2] << 8 | data[off + 3]) == w) {
      off += 4;
      for (int ch = 0; ch < 4; ++ch) {
        int64_t x = 0;
        while (x < w) {
          if (off >= len) { free(rgbe); return nullptr; }
          int count = data[off++];
          if (count > 128) {  // run
            count -= 128;
            if (off >= len || x + count > w) { free(rgbe); return nullptr; }
            unsigned char v = data[off++];
            for (int i = 0; i < count; ++i) row[(x + i) * 4 + ch] = v;
          } else {            // literal
            if (off + count > len || x + count > w) {
              free(rgbe); return nullptr;
            }
            for (int i = 0; i < count; ++i)
              row[(x + i) * 4 + ch] = data[off + i];
            off += count;
          }
          x += count;
        }
      }
    } else {  // flat scanline
      if (off + w * 4 > len) { free(rgbe); return nullptr; }
      memcpy(row, data + off, (size_t)(w * 4));
      off += w * 4;
    }
  }
  *out_w = w;
  *out_h = h;
  return rgbe;
}

void tr_buf_free(unsigned char* buf) { free(buf); }

// 2x2 box-filter downsample (the mipmap_generator.wgsl CPU analog used at
// texture load, one call per mip level).
void tr_box_downsample(const float* src, int64_t h, int64_t w, int64_t c,
                       float* dst) {
  int64_t oh = h / 2, ow = w / 2;
  for (int64_t y = 0; y < oh; ++y) {
    for (int64_t x = 0; x < ow; ++x) {
      for (int64_t k = 0; k < c; ++k) {
        const float* r0 = src + ((2 * y) * w + 2 * x) * c + k;
        const float* r1 = src + ((2 * y + 1) * w + 2 * x) * c + k;
        dst[(y * ow + x) * c + k] =
            0.25f * (r0[0] + r0[c] + r1[0] + r1[c]);
      }
    }
  }
}

}  // extern "C"
