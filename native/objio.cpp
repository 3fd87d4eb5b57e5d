// Fast OBJ parser — native data-loader component (TPU-side equivalent of
// the reference's native layer role; feeds data/obj_io.py via ctypes).
//
// The reference parses OBJ in Python line-by-line (src/utils/obj.py:59-209)
// inside its obj2mesh.py preprocessing tool; at Objaverse scale the parse
// dominates preprocessing time.  This parser is a single-pass C++ scanner
// exposed through a C ABI (no pybind11 dependency).
//
// API (all out-params are malloc'd; caller frees with objio_free):
//   objio_parse(path,
//               &v_pos,&n_pos, &v_tex,&n_tex, &v_nrm,&n_nrm,
//               &f_pos,&f_tex,&f_nrm,&n_tri) -> 0 on success
//
// Faces with >3 vertices are fan-triangulated; missing vt/vn indices are
// encoded as -1.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Buf {
  std::vector<float> v;
  std::vector<float> vt;
  std::vector<float> vn;
  std::vector<int> fp, ft, fn;
};

// parse "i", "i/j", "i//k", "i/j/k"; returns via out params (1-based or
// negative-relative converted later; 0 = absent)
inline void parse_corner(const char*& p, long& vi, long& ti, long& ni) {
  vi = strtol(p, const_cast<char**>(&p), 10);
  ti = 0; ni = 0;
  if (*p == '/') {
    ++p;
    if (*p != '/') ti = strtol(p, const_cast<char**>(&p), 10);
    if (*p == '/') { ++p; ni = strtol(p, const_cast<char**>(&p), 10); }
  }
}

inline int fix_index(long idx, size_t count) {
  if (idx > 0) return static_cast<int>(idx - 1);
  if (idx < 0) return static_cast<int>(count + idx);
  return -1;
}

}  // namespace

extern "C" {

int objio_parse(const char* path,
                float** v_pos, long* n_pos,
                float** v_tex, long* n_tex,
                float** v_nrm, long* n_nrm,
                int** f_pos, int** f_tex, int** f_nrm, long* n_tri) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* data = static_cast<char*>(malloc(size + 1));
  if (!data) { fclose(f); return 2; }
  if (fread(data, 1, size, f) != static_cast<size_t>(size)) {
    free(data); fclose(f); return 3;
  }
  data[size] = '\0';
  fclose(f);

  Buf b;
  b.v.reserve(1 << 16);
  b.fp.reserve(1 << 16);

  const char* p = data;
  const char* end = data + size;
  while (p < end) {
    // skip leading whitespace
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    if (p >= end) break;
    if (*p == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      p += 2;
      for (int k = 0; k < 3; ++k)
        b.v.push_back(strtof(p, const_cast<char**>(&p)));
    } else if (*p == 'v' && p[1] == 't') {
      p += 3;
      for (int k = 0; k < 2; ++k)
        b.vt.push_back(strtof(p, const_cast<char**>(&p)));
    } else if (*p == 'v' && p[1] == 'n') {
      p += 3;
      for (int k = 0; k < 3; ++k)
        b.vn.push_back(strtof(p, const_cast<char**>(&p)));
    } else if (*p == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      p += 2;
      long vi[64], ti[64], ni[64];
      int cnt = 0;
      while (cnt < 64) {
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        if (p >= end || *p == '\n' || *p == '\r' || *p == '#') break;
        parse_corner(p, vi[cnt], ti[cnt], ni[cnt]);
        ++cnt;
      }
      size_t nv = b.v.size() / 3, nt = b.vt.size() / 2, nn = b.vn.size() / 3;
      for (int k = 2; k < cnt; ++k) {   // fan triangulation
        int corners[3] = {0, k - 1, k};
        for (int c = 0; c < 3; ++c) {
          int j = corners[c];
          b.fp.push_back(fix_index(vi[j], nv));
          b.ft.push_back(fix_index(ti[j], nt));
          b.fn.push_back(fix_index(ni[j], nn));
        }
      }
    }
    // to end of line
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
  free(data);

  auto out_f = [](std::vector<float>& src, float** dst, long* n, int stride) {
    *n = static_cast<long>(src.size()) / stride;
    *dst = static_cast<float*>(malloc(src.size() * sizeof(float)));
    memcpy(*dst, src.data(), src.size() * sizeof(float));
  };
  auto out_i = [](std::vector<int>& src, int** dst) {
    *dst = static_cast<int*>(malloc(src.size() * sizeof(int)));
    memcpy(*dst, src.data(), src.size() * sizeof(int));
  };
  out_f(b.v, v_pos, n_pos, 3);
  out_f(b.vt, v_tex, n_tex, 2);
  out_f(b.vn, v_nrm, n_nrm, 3);
  *n_tri = static_cast<long>(b.fp.size()) / 3;
  out_i(b.fp, f_pos);
  out_i(b.ft, f_tex);
  out_i(b.fn, f_nrm);
  return 0;
}

void objio_free(void* ptr) { free(ptr); }

}  // extern "C"
