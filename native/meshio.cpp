// Native I/O kernels: gmsh 2.2 ASCII parsing and legacy-VTK writing.
//
// The reference delegates these to deal.II's C++ GridIn/DataOut
// (PoroelasticityFSS.h:439-445, :228-291).  Here the text-heavy work lives
// in a small C++ library with a C ABI consumed via ctypes
// (poroelasticity_dealii_tpu/utils/native.py); topology post-processing
// (corner permutations, face matching) stays in Python where it is cheap.
// The pure-Python readers/writers remain as always-available fallbacks.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- gmsh --

struct MshData {
  int64_t n_nodes;
  int64_t *node_ids;       // (n_nodes)
  double *coords;          // (n_nodes, 3)
  int64_t n_elems;
  int32_t *elem_types;     // (n_elems)
  int32_t *elem_ntags;     // (n_elems)
  int64_t *elem_tag0;      // (n_elems) first tag (physical id) or 0
  int64_t *conn;           // flattened node ids
  int64_t *conn_offsets;   // (n_elems + 1)
};

static int n_nodes_of(int t) {
  switch (t) {
    case 1: return 2;   // line
    case 2: return 3;   // triangle
    case 3: return 4;   // quad
    case 4: return 4;   // tet
    case 5: return 8;   // hex
    case 15: return 1;  // point
    default: return -1;
  }
}

// Returns 0 on success; fills *out (caller frees via msh_free).
int msh_parse(const char *path, MshData *out) {
  FILE *f = fopen(path, "r");
  if (!f) return 1;
  char line[1 << 16];
  std::memset(out, 0, sizeof(*out));
  std::vector<int64_t> ids;
  std::vector<double> xyz;
  std::vector<int32_t> etypes, entags;
  std::vector<int64_t> etag0, conn, offsets;
  offsets.push_back(0);
  bool ok_format = false;

  while (fgets(line, sizeof(line), f)) {
    if (std::strncmp(line, "$MeshFormat", 11) == 0) {
      if (!fgets(line, sizeof(line), f)) { fclose(f); return 2; }
      double ver = atof(line);
      if (ver < 2.0 || ver >= 3.0) { fclose(f); return 3; }
      ok_format = true;
    } else if (std::strncmp(line, "$Nodes", 6) == 0) {
      if (!fgets(line, sizeof(line), f)) { fclose(f); return 2; }
      long n = atol(line);
      ids.reserve(n);
      xyz.reserve(3 * n);
      for (long i = 0; i < n; ++i) {
        long id;
        double x, y, z;
        if (fscanf(f, "%ld %lf %lf %lf", &id, &x, &y, &z) != 4) {
          fclose(f);
          return 4;
        }
        ids.push_back(id);
        xyz.push_back(x); xyz.push_back(y); xyz.push_back(z);
      }
    } else if (std::strncmp(line, "$Elements", 9) == 0) {
      if (!fgets(line, sizeof(line), f)) { fclose(f); return 2; }
      long n = atol(line);
      etypes.reserve(n);
      for (long i = 0; i < n; ++i) {
        long id, type, ntags;
        if (fscanf(f, "%ld %ld %ld", &id, &type, &ntags) != 3) {
          fclose(f);
          return 5;
        }
        int nn = n_nodes_of((int)type);
        if (nn < 0) { fclose(f); return 6; }
        long t0 = 0;
        for (long k = 0; k < ntags; ++k) {
          long tag;
          if (fscanf(f, "%ld", &tag) != 1) { fclose(f); return 5; }
          if (k == 0) t0 = tag;
        }
        etypes.push_back((int32_t)type);
        entags.push_back((int32_t)ntags);
        etag0.push_back(t0);
        for (int k = 0; k < nn; ++k) {
          long nid;
          if (fscanf(f, "%ld", &nid) != 1) { fclose(f); return 5; }
          conn.push_back(nid);
        }
        offsets.push_back((int64_t)conn.size());
      }
    }
  }
  fclose(f);
  if (!ok_format || ids.empty()) return 7;

  out->n_nodes = (int64_t)ids.size();
  out->node_ids = (int64_t *)std::malloc(ids.size() * sizeof(int64_t));
  out->coords = (double *)std::malloc(xyz.size() * sizeof(double));
  std::memcpy(out->node_ids, ids.data(), ids.size() * sizeof(int64_t));
  std::memcpy(out->coords, xyz.data(), xyz.size() * sizeof(double));
  out->n_elems = (int64_t)etypes.size();
  out->elem_types = (int32_t *)std::malloc(etypes.size() * sizeof(int32_t));
  out->elem_ntags = (int32_t *)std::malloc(entags.size() * sizeof(int32_t));
  out->elem_tag0 = (int64_t *)std::malloc(etag0.size() * sizeof(int64_t));
  out->conn = (int64_t *)std::malloc(conn.size() * sizeof(int64_t));
  out->conn_offsets =
      (int64_t *)std::malloc(offsets.size() * sizeof(int64_t));
  std::memcpy(out->elem_types, etypes.data(),
              etypes.size() * sizeof(int32_t));
  std::memcpy(out->elem_ntags, entags.data(),
              entags.size() * sizeof(int32_t));
  std::memcpy(out->elem_tag0, etag0.data(), etag0.size() * sizeof(int64_t));
  std::memcpy(out->conn, conn.data(), conn.size() * sizeof(int64_t));
  std::memcpy(out->conn_offsets, offsets.data(),
              offsets.size() * sizeof(int64_t));
  return 0;
}

void msh_free(MshData *d) {
  std::free(d->node_ids);
  std::free(d->coords);
  std::free(d->elem_types);
  std::free(d->elem_ntags);
  std::free(d->elem_tag0);
  std::free(d->conn);
  std::free(d->conn_offsets);
  std::memset(d, 0, sizeof(*d));
}

// ----------------------------------------------------------------- vtk --

// Legacy ASCII unstructured grid with point data.  scalars: n_scalars
// arrays of length n_points laid out contiguously; names separated by ';'.
int vtk_write(const char *path, int64_t n_points, const double *xyz3,
              int64_t n_cells, int32_t nodes_per_cell, const int32_t *conn,
              int32_t vtk_cell_type, const double *vectors3,
              int32_t n_scalars, const char *names_joined,
              const double *scalars) {
  FILE *f = fopen(path, "w");
  if (!f) return 1;
  fprintf(f, "# vtk DataFile Version 3.0\n");
  fprintf(f, "poroelasticity_dealii_tpu output\nASCII\n");
  fprintf(f, "DATASET UNSTRUCTURED_GRID\nPOINTS %lld double\n",
          (long long)n_points);
  for (int64_t i = 0; i < n_points; ++i)
    fprintf(f, "%.16g %.16g %.16g\n", xyz3[3 * i], xyz3[3 * i + 1],
            xyz3[3 * i + 2]);
  fprintf(f, "CELLS %lld %lld\n", (long long)n_cells,
          (long long)(n_cells * (nodes_per_cell + 1)));
  for (int64_t c = 0; c < n_cells; ++c) {
    fprintf(f, "%d", nodes_per_cell);
    for (int k = 0; k < nodes_per_cell; ++k)
      fprintf(f, " %d", conn[c * nodes_per_cell + k]);
    fputc('\n', f);
  }
  fprintf(f, "CELL_TYPES %lld\n", (long long)n_cells);
  for (int64_t c = 0; c < n_cells; ++c) fprintf(f, "%d\n", vtk_cell_type);
  fprintf(f, "POINT_DATA %lld\n", (long long)n_points);
  if (vectors3) {
    fprintf(f, "VECTORS u double\n");
    for (int64_t i = 0; i < n_points; ++i)
      fprintf(f, "%.16g %.16g %.16g\n", vectors3[3 * i], vectors3[3 * i + 1],
              vectors3[3 * i + 2]);
  }
  // split names on ';'
  std::string names(names_joined ? names_joined : "");
  size_t pos = 0;
  for (int s = 0; s < n_scalars; ++s) {
    size_t next = names.find(';', pos);
    std::string name = names.substr(pos, next == std::string::npos
                                             ? std::string::npos
                                             : next - pos);
    pos = (next == std::string::npos) ? names.size() : next + 1;
    fprintf(f, "SCALARS %s double 1\nLOOKUP_TABLE default\n", name.c_str());
    const double *col = scalars + (int64_t)s * n_points;
    for (int64_t i = 0; i < n_points; ++i) fprintf(f, "%.16g\n", col[i]);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
