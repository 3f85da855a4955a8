// Native host-side mesh operations (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's in-tree C++ components
// (SURVEY.md §2.6): the Hunyuan mesh-inpaint processor
// (`Hunyuan3D_2_1/hy3dpaint/DifferentiableRenderer/mesh_inpaint_processor.cpp`
// `meshVerticeInpaint` — BFS vertex-color diffusion) and the CPU mesh-
// hygiene roles the reference outsources to pymeshlab / fast-simplification
// (`mesh_processer/mesh_utils.py:213-331`): quadric-error-metric edge-
// collapse decimation and duplicate/degenerate/unreferenced cleanup.
// These are irregular pointer-chasing graph algorithms — exactly the work
// that should stay on the host CPU between device stages, not be forced
// through XLA.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC). No external deps.

#include <algorithm>
#include <array>
#include <functional>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <set>
#include <unordered_map>
#include <vector>

extern "C" {

// --------------------------------------------------------------------
// Vertex-color diffusion inpaint (meshVerticeInpaint role).
// colors: [n_verts, channels], mask: [n_verts] (1 = painted).
// Unpainted vertices iteratively take the average of painted neighbors.
// Returns number of vertices filled.
// --------------------------------------------------------------------
int inpaint_vertex_colors(float* colors, uint8_t* mask, int n_verts,
                          int channels, const int32_t* faces, int n_faces,
                          int max_rounds) {
  std::vector<std::vector<int>> adj(n_verts);
  for (int f = 0; f < n_faces; ++f) {
    const int32_t* tri = faces + 3 * f;
    for (int e = 0; e < 3; ++e) {
      int a = tri[e], b = tri[(e + 1) % 3];
      if (a < 0 || b < 0 || a >= n_verts || b >= n_verts) continue;
      adj[a].push_back(b);
      adj[b].push_back(a);
    }
  }
  int filled_total = 0;
  std::vector<float> accum(channels);
  for (int round = 0; round < max_rounds; ++round) {
    // frontier: unpainted vertices with at least one painted neighbor
    std::vector<int> frontier;
    for (int v = 0; v < n_verts; ++v) {
      if (mask[v]) continue;
      for (int u : adj[v]) {
        if (mask[u]) { frontier.push_back(v); break; }
      }
    }
    if (frontier.empty()) break;
    std::vector<std::pair<int, std::vector<float>>> updates;
    updates.reserve(frontier.size());
    for (int v : frontier) {
      std::fill(accum.begin(), accum.end(), 0.f);
      int cnt = 0;
      for (int u : adj[v]) {
        if (!mask[u]) continue;
        for (int c = 0; c < channels; ++c) accum[c] += colors[u * channels + c];
        ++cnt;
      }
      if (!cnt) continue;
      std::vector<float> val(channels);
      for (int c = 0; c < channels; ++c) val[c] = accum[c] / cnt;
      updates.emplace_back(v, std::move(val));
    }
    for (auto& [v, val] : updates) {
      std::memcpy(colors + v * channels, val.data(),
                  channels * sizeof(float));
      mask[v] = 1;
      ++filled_total;
    }
  }
  return filled_total;
}

// --------------------------------------------------------------------
// Mesh cleanup (pymeshlab clean role, mesh_utils.py:272-331):
// weld duplicate vertices (grid quantization), drop degenerate faces,
// drop unreferenced vertices, optionally drop small connected components
// ("dust", fraction of the largest component).
// In/out buffers are caller-allocated at input size; returns new counts
// through out params.
// --------------------------------------------------------------------
void clean_mesh(const float* verts, int n_verts, const int32_t* faces,
                int n_faces, float weld_eps, float min_component_frac,
                float* out_verts, int32_t* out_faces, int32_t* out_nv,
                int32_t* out_nf) {
  // weld
  struct Key { int64_t x, y, z; };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      return std::hash<int64_t>()(k.x * 73856093LL ^ k.y * 19349663LL ^
                                  k.z * 83492791LL);
    }
  };
  struct KeyEq {
    bool operator()(const Key& a, const Key& b) const {
      return a.x == b.x && a.y == b.y && a.z == b.z;
    }
  };
  float inv = weld_eps > 0 ? 1.0f / weld_eps : 1e12f;
  std::unordered_map<Key, int, KeyHash, KeyEq> weld;
  std::vector<int> remap(n_verts);
  std::vector<int> rep;  // representative original index
  rep.reserve(n_verts);
  for (int v = 0; v < n_verts; ++v) {
    Key k{(int64_t)llroundf(verts[3 * v] * inv),
          (int64_t)llroundf(verts[3 * v + 1] * inv),
          (int64_t)llroundf(verts[3 * v + 2] * inv)};
    auto it = weld.find(k);
    if (it == weld.end()) {
      weld.emplace(k, (int)rep.size());
      remap[v] = (int)rep.size();
      rep.push_back(v);
    } else {
      remap[v] = it->second;
    }
  }
  // faces: remap, drop degenerate + duplicate
  std::set<std::array<int, 3>> seen;
  std::vector<std::array<int, 3>> tris;
  tris.reserve(n_faces);
  for (int f = 0; f < n_faces; ++f) {
    int a = remap[faces[3 * f]], b = remap[faces[3 * f + 1]],
        c = remap[faces[3 * f + 2]];
    if (a == b || b == c || a == c) continue;
    std::array<int, 3> key = {a, b, c};
    std::array<int, 3> sorted = key;
    std::sort(sorted.begin(), sorted.end());
    if (!seen.insert(sorted).second) continue;
    tris.push_back(key);
  }
  // connected components over face adjacency (via shared vertices)
  int nv = (int)rep.size();
  std::vector<int> parent(nv);
  for (int i = 0; i < nv; ++i) parent[i] = i;
  std::function<int(int)> find = [&](int x) {
    while (parent[x] != x) x = parent[x] = parent[parent[x]];
    return x;
  };
  for (auto& t : tris) {
    int a = find(t[0]), b = find(t[1]), c = find(t[2]);
    parent[b] = a;
    parent[c] = a;
  }
  std::unordered_map<int, int> comp_size;
  for (auto& t : tris) comp_size[find(t[0])]++;
  int largest = 0;
  for (auto& [root, sz] : comp_size) largest = std::max(largest, sz);
  int min_faces = (int)(min_component_frac * largest);
  std::vector<std::array<int, 3>> kept;
  kept.reserve(tris.size());
  for (auto& t : tris) {
    if (comp_size[find(t[0])] >= min_faces) kept.push_back(t);
  }
  // drop unreferenced vertices
  std::vector<int> used(nv, -1);
  int out_count = 0;
  for (auto& t : tris) (void)t;
  for (auto& t : kept) {
    for (int k = 0; k < 3; ++k) {
      if (used[t[k]] < 0) used[t[k]] = out_count++;
    }
  }
  for (int v = 0; v < nv; ++v) {
    if (used[v] < 0) continue;
    std::memcpy(out_verts + 3 * used[v], verts + 3 * rep[v],
                3 * sizeof(float));
  }
  for (size_t f = 0; f < kept.size(); ++f) {
    for (int k = 0; k < 3; ++k) out_faces[3 * f + k] = used[kept[f][k]];
  }
  *out_nv = out_count;
  *out_nf = (int)kept.size();
}

// --------------------------------------------------------------------
// Quadric-error-metric edge-collapse decimation
// (fast-simplification / pymeshlab decimate role, mesh_utils.py:213-271).
// Simplified QEM: vertex quadrics from face planes, collapse cheapest
// edges to their midpoint-or-endpoint minimizer until target_faces.
// --------------------------------------------------------------------
struct Quadric {
  double q[10];  // symmetric 4x4: xx xy xz xw yy yz yw zz zw ww
  void add(const Quadric& o) {
    for (int i = 0; i < 10; ++i) q[i] += o.q[i];
  }
  double eval(const double* v) const {
    double x = v[0], y = v[1], z = v[2];
    return q[0] * x * x + 2 * q[1] * x * y + 2 * q[2] * x * z +
           2 * q[3] * x + q[4] * y * y + 2 * q[5] * y * z + 2 * q[6] * y +
           q[7] * z * z + 2 * q[8] * z + q[9];
  }
};

void decimate_mesh(const float* verts, int n_verts, const int32_t* faces,
                   int n_faces, int target_faces, float* out_verts,
                   int32_t* out_faces, int32_t* out_nv, int32_t* out_nf) {
  std::vector<double> pos(3 * n_verts);
  for (int i = 0; i < 3 * n_verts; ++i) pos[i] = verts[i];
  std::vector<Quadric> quad(n_verts, Quadric{{0}});
  std::vector<std::array<int, 3>> tris(n_faces);
  std::vector<bool> face_alive(n_faces, true);
  std::vector<bool> vert_alive(n_verts, true);
  std::vector<std::vector<int>> vfaces(n_verts);

  for (int f = 0; f < n_faces; ++f) {
    tris[f] = {faces[3 * f], faces[3 * f + 1], faces[3 * f + 2]};
    auto [a, b, c] = std::tuple(tris[f][0], tris[f][1], tris[f][2]);
    double ux = pos[3 * b] - pos[3 * a], uy = pos[3 * b + 1] - pos[3 * a + 1],
           uz = pos[3 * b + 2] - pos[3 * a + 2];
    double vx = pos[3 * c] - pos[3 * a], vy = pos[3 * c + 1] - pos[3 * a + 1],
           vz = pos[3 * c + 2] - pos[3 * a + 2];
    double nx = uy * vz - uz * vy, ny = uz * vx - ux * vz,
           nz = ux * vy - uy * vx;
    double len = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (len < 1e-20) { face_alive[f] = false; continue; }
    nx /= len; ny /= len; nz /= len;
    double d = -(nx * pos[3 * a] + ny * pos[3 * a + 1] + nz * pos[3 * a + 2]);
    Quadric kp{{nx * nx, nx * ny, nx * nz, nx * d, ny * ny, ny * nz, ny * d,
                nz * nz, nz * d, d * d}};
    for (int k = 0; k < 3; ++k) {
      quad[tris[f][k]].add(kp);
      vfaces[tris[f][k]].push_back(f);
    }
  }

  auto edge_cost = [&](int a, int b, double* best) {
    Quadric q = quad[a];
    q.add(quad[b]);
    const double* pa = &pos[3 * a];
    const double* pb = &pos[3 * b];
    double mid[3] = {(pa[0] + pb[0]) / 2, (pa[1] + pb[1]) / 2,
                     (pa[2] + pb[2]) / 2};
    double ca = q.eval(pa), cb = q.eval(pb), cm = q.eval(mid);
    if (cm <= ca && cm <= cb) { std::memcpy(best, mid, 24); return cm; }
    if (ca <= cb) { std::memcpy(best, pa, 24); return ca; }
    std::memcpy(best, pb, 24);
    return cb;
  };

  using Entry = std::pair<double, std::pair<int, int>>;
  std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;
  std::set<std::pair<int, int>> edges;
  for (int f = 0; f < n_faces; ++f) {
    if (!face_alive[f]) continue;
    for (int e = 0; e < 3; ++e) {
      int a = tris[f][e], b = tris[f][(e + 1) % 3];
      auto key = std::minmax(a, b);
      if (edges.insert({key.first, key.second}).second) {
        double best[3];
        heap.push({edge_cost(key.first, key.second, best),
                   {key.first, key.second}});
      }
    }
  }

  int alive_faces = 0;
  for (int f = 0; f < n_faces; ++f) alive_faces += face_alive[f];
  std::vector<int> remap(n_verts);
  for (int i = 0; i < n_verts; ++i) remap[i] = i;
  std::function<int(int)> find = [&](int x) {
    while (remap[x] != x) x = remap[x] = remap[remap[x]];
    return x;
  };

  while (alive_faces > target_faces && !heap.empty()) {
    auto [cost, e] = heap.top();
    heap.pop();
    int a = find(e.first), b = find(e.second);
    if (a == b || !vert_alive[a] || !vert_alive[b]) continue;
    double best[3];
    double cur = edge_cost(a, b, best);
    if (cur > cost * 1.5 + 1e-12) {  // stale entry → re-push refreshed
      heap.push({cur, {a, b}});
      continue;
    }
    // collapse b into a at the minimizer
    pos[3 * a] = best[0]; pos[3 * a + 1] = best[1]; pos[3 * a + 2] = best[2];
    quad[a].add(quad[b]);
    vert_alive[b] = false;
    remap[b] = a;
    // update faces
    for (int f : vfaces[b]) vfaces[a].push_back(f);
    std::vector<int> still;
    for (int f : vfaces[a]) {
      if (!face_alive[f]) continue;
      int va = find(tris[f][0]), vb = find(tris[f][1]), vc = find(tris[f][2]);
      if (va == vb || vb == vc || va == vc) {
        face_alive[f] = false;
        --alive_faces;
      } else {
        still.push_back(f);
      }
    }
    vfaces[a] = std::move(still);
    // refresh incident edges
    std::set<int> nbrs;
    for (int f : vfaces[a]) {
      for (int k = 0; k < 3; ++k) {
        int u = find(tris[f][k]);
        if (u != a) nbrs.insert(u);
      }
    }
    for (int u : nbrs) {
      double bb[3];
      heap.push({edge_cost(std::min(a, u), std::max(a, u), bb),
                 {std::min(a, u), std::max(a, u)}});
    }
  }

  // compact output
  std::vector<int> used(n_verts, -1);
  int nv_out = 0, nf_out = 0;
  for (int f = 0; f < n_faces; ++f) {
    if (!face_alive[f]) continue;
    int t[3];
    for (int k = 0; k < 3; ++k) {
      int v = find(tris[f][k]);
      if (used[v] < 0) {
        used[v] = nv_out;
        out_verts[3 * nv_out] = (float)pos[3 * v];
        out_verts[3 * nv_out + 1] = (float)pos[3 * v + 1];
        out_verts[3 * nv_out + 2] = (float)pos[3 * v + 2];
        ++nv_out;
      }
      t[k] = used[v];
    }
    out_faces[3 * nf_out] = t[0];
    out_faces[3 * nf_out + 1] = t[1];
    out_faces[3 * nf_out + 2] = t[2];
    ++nf_out;
  }
  *out_nv = nv_out;
  *out_nf = nf_out;
}

}  // extern "C"
