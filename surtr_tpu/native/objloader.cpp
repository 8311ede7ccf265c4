// Native OBJ loader — the C++ fast path of the asset pipeline, replacing the
// reference's Assimp import (LoadModelData, Surtr.cpp:2683-2732) with the
// same semantics: fan-triangulate polygon faces, weld identical vertices,
// mirror X + flip winding, apply per-model scale/offset.
//
// C ABI (ctypes-bound from surtr_tpu/native/__init__.py):
//   void* obj_parse(const char* path, const float scale[3],
//                   const float offset[3], int mirror_x);
//   int   obj_counts(void* h, int* n_verts, int* n_tris);
//   int   obj_copy(void* h, float* verts, int* tris);
//   void  obj_free(void* h);
//
// Build: make native   (g++ -O2 -shared -fPIC → libsurtr_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Mesh {
  std::vector<float> verts;  // 3 * n
  std::vector<int> tris;     // 3 * m
};

struct Key {
  int64_t x, y, z;
  bool operator==(const Key& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct KeyHash {
  size_t operator()(const Key& k) const {
    uint64_t h = 1469598103934665603ull;
    auto mix = [&h](int64_t v) {
      h ^= static_cast<uint64_t>(v);
      h *= 1099511628211ull;
    };
    mix(k.x);
    mix(k.y);
    mix(k.z);
    return static_cast<size_t>(h);
  }
};

// Weld positionally identical vertices (1e-6 grid, matching the python
// fallback's rounding) and drop degenerate triangles.
void weld(Mesh& m) {
  const double scale = 1e6;
  std::unordered_map<Key, int, KeyHash> seen;
  std::vector<int> remap(m.verts.size() / 3);
  std::vector<float> out_verts;
  out_verts.reserve(m.verts.size());
  for (size_t i = 0; i < m.verts.size() / 3; ++i) {
    Key k{
        static_cast<int64_t>(llround(m.verts[3 * i + 0] * scale)),
        static_cast<int64_t>(llround(m.verts[3 * i + 1] * scale)),
        static_cast<int64_t>(llround(m.verts[3 * i + 2] * scale)),
    };
    auto it = seen.find(k);
    if (it == seen.end()) {
      int id = static_cast<int>(out_verts.size() / 3);
      seen.emplace(k, id);
      remap[i] = id;
      out_verts.push_back(m.verts[3 * i + 0]);
      out_verts.push_back(m.verts[3 * i + 1]);
      out_verts.push_back(m.verts[3 * i + 2]);
    } else {
      remap[i] = it->second;
    }
  }
  std::vector<int> out_tris;
  out_tris.reserve(m.tris.size());
  const int n_in = static_cast<int>(remap.size());
  for (size_t t = 0; t < m.tris.size() / 3; ++t) {
    // Malformed faces (index 0 / out-of-range) must not index past remap.
    int ia = m.tris[3 * t], ib = m.tris[3 * t + 1], ic = m.tris[3 * t + 2];
    if (ia < 0 || ib < 0 || ic < 0 || ia >= n_in || ib >= n_in || ic >= n_in)
      continue;
    int a = remap[ia], b = remap[ib], c = remap[ic];
    if (a != b && b != c && a != c) {
      out_tris.push_back(a);
      out_tris.push_back(b);
      out_tris.push_back(c);
    }
  }
  m.verts.swap(out_verts);
  m.tris.swap(out_tris);
}

}  // namespace

extern "C" {

void* obj_parse(const char* path, const float* scale, const float* offset,
                int mirror_x) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* m = new Mesh();
  std::vector<int> poly;
  char line[8192];
  while (fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      double x, y, z;
      if (sscanf(line + 2, "%lf %lf %lf", &x, &y, &z) == 3) {
        if (mirror_x) x = -x;
        m->verts.push_back(static_cast<float>(x * scale[0] + offset[0]));
        m->verts.push_back(static_cast<float>(y * scale[1] + offset[1]));
        m->verts.push_back(static_cast<float>(z * scale[2] + offset[2]));
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      poly.clear();
      const char* p = line + 2;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        long idx = strtol(p, const_cast<char**>(&p), 10);
        int n = static_cast<int>(m->verts.size() / 3);
        int v = idx > 0 ? static_cast<int>(idx - 1) : n + static_cast<int>(idx);
        poly.push_back(v);
        while (*p && *p != ' ' && *p != '\t' && *p != '\n') ++p;  // skip /vt/vn
      }
      // Fan-triangulate; mirror_x flips winding to keep outward orientation.
      for (size_t t = 1; t + 1 < poly.size(); ++t) {
        if (mirror_x) {
          m->tris.push_back(poly[t + 1]);
          m->tris.push_back(poly[t]);
          m->tris.push_back(poly[0]);
        } else {
          m->tris.push_back(poly[0]);
          m->tris.push_back(poly[t]);
          m->tris.push_back(poly[t + 1]);
        }
      }
    }
  }
  fclose(f);
  weld(*m);
  return m;
}

int obj_counts(void* h, int* n_verts, int* n_tris) {
  if (!h) return -1;
  auto* m = static_cast<Mesh*>(h);
  *n_verts = static_cast<int>(m->verts.size() / 3);
  *n_tris = static_cast<int>(m->tris.size() / 3);
  return 0;
}

int obj_copy(void* h, float* verts, int* tris) {
  if (!h) return -1;
  auto* m = static_cast<Mesh*>(h);
  memcpy(verts, m->verts.data(), m->verts.size() * sizeof(float));
  memcpy(tris, m->tris.data(), m->tris.size() * sizeof(int));
  return 0;
}

void obj_free(void* h) { delete static_cast<Mesh*>(h); }

}  // extern "C"
