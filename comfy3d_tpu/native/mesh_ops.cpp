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

// --------------------------------------------------------------------
// Isotropic explicit remeshing (Botsch–Kobbelt incremental remeshing).
// The reference reaches this through pymeshlab
// `meshing_isotropic_explicit_remeshing` (`mesh_processer/mesh_utils.py:272`,
// used by the DiffRastMesh periodic remesh `diff_mesh.py:129`) and through
// gpytoolbox `remesh_botsch` (StableFast3D `sf3d/models/mesh.py:170`).
// Per iteration: split edges > 4/3·h, collapse edges < 4/5·h, flip edges
// toward valence 6, tangential Laplacian relaxation. Boundary vertices are
// kept fixed. Returns 0, or 1 if vertex/face capacity truncated splits.
// --------------------------------------------------------------------

namespace {

using V3 = std::array<double, 3>;
using Tri = std::array<int, 3>;

inline V3 sub3(const V3& a, const V3& b) {
  return {a[0] - b[0], a[1] - b[1], a[2] - b[2]};
}
inline V3 cross3(const V3& a, const V3& b) {
  return {a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]};
}
inline double dot3(const V3& a, const V3& b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}
inline double dist3(const V3& a, const V3& b) {
  V3 d = sub3(a, b);
  return std::sqrt(dot3(d, d));
}
inline int64_t ekey(int a, int b) {
  if (a > b) std::swap(a, b);
  return ((int64_t)a << 32) | (uint32_t)b;
}

struct RemeshState {
  std::vector<V3> v;
  std::vector<Tri> f;
  bool overflow = false;
  size_t max_v, max_f;

  // boundary vertices: endpoint of an edge with != 2 incident faces
  std::vector<uint8_t> boundary_verts() const {
    std::unordered_map<int64_t, int> ecount;
    ecount.reserve(f.size() * 3);
    for (const Tri& t : f)
      for (int e = 0; e < 3; ++e) ecount[ekey(t[e], t[(e + 1) % 3])]++;
    std::vector<uint8_t> bnd(v.size(), 0);
    for (auto& [k, c] : ecount) {
      if (c != 2) {
        bnd[(int)(k >> 32)] = 1;
        bnd[(int)(k & 0xffffffff)] = 1;
      }
    }
    return bnd;
  }

  void split_long_edges(double high) {
    std::unordered_map<int64_t, int> mid;  // edge → midpoint vertex id
    mid.reserve(f.size());
    for (const Tri& t : f) {
      for (int e = 0; e < 3; ++e) {
        int a = t[e], b = t[(e + 1) % 3];
        int64_t k = ekey(a, b);
        if (mid.count(k)) continue;
        if (dist3(v[a], v[b]) > high) {
          if (v.size() >= max_v) { overflow = true; continue; }
          mid.emplace(k, (int)v.size());
          v.push_back({(v[a][0] + v[b][0]) / 2, (v[a][1] + v[b][1]) / 2,
                       (v[a][2] + v[b][2]) / 2});
        }
      }
    }
    if (mid.empty()) return;
    std::vector<Tri> nf;
    nf.reserve(f.size() * 2);
    auto getmid = [&](int a, int b) {
      auto it = mid.find(ekey(a, b));
      return it == mid.end() ? -1 : it->second;
    };
    for (const Tri& t : f) {
      int m[3] = {getmid(t[0], t[1]), getmid(t[1], t[2]),
                  getmid(t[2], t[0])};
      int nsplit = (m[0] >= 0) + (m[1] >= 0) + (m[2] >= 0);
      // capacity: emitting (nsplit+1) faces in place of 1
      if (nsplit && nf.size() + nsplit + 1 > max_f) {
        overflow = true;
        nsplit = 0;
      }
      if (nsplit == 0) {
        nf.push_back(t);
      } else if (nsplit == 3) {
        nf.push_back({t[0], m[0], m[2]});
        nf.push_back({m[0], t[1], m[1]});
        nf.push_back({m[2], m[1], t[2]});
        nf.push_back({m[0], m[1], m[2]});
      } else if (nsplit == 1) {
        int e = m[0] >= 0 ? 0 : (m[1] >= 0 ? 1 : 2);
        int a = t[e], b = t[(e + 1) % 3], c = t[(e + 2) % 3];
        nf.push_back({a, m[e], c});
        nf.push_back({m[e], b, c});
      } else {  // two midpoints: rotate so the un-split edge is (c, a)
        int e = m[0] < 0 ? 1 : (m[1] < 0 ? 2 : 0);  // first split edge
        // with edges e and e+1 split (the un-split edge is e+2)
        int a = t[e], b = t[(e + 1) % 3], c = t[(e + 2) % 3];
        int mab = m[e], mbc = m[(e + 1) % 3];
        nf.push_back({mab, b, mbc});
        nf.push_back({a, mab, mbc});
        nf.push_back({a, mbc, c});
      }
    }
    f = std::move(nf);
  }

  void collapse_short_edges(double low, double high) {
    // the locking discipline below admits one collapse per neighborhood
    // per sweep; sweep until quiescent so coarse targets converge
    for (int sweep = 0; sweep < 20; ++sweep)
      if (!collapse_sweep(low, high)) break;
  }

  bool collapse_sweep(double low, double high) {
    std::vector<uint8_t> bnd = boundary_verts();
    std::vector<std::vector<int>> adj(v.size());
    for (const Tri& t : f)
      for (int e = 0; e < 3; ++e) {
        int a = t[e], b = t[(e + 1) % 3];
        adj[a].push_back(b);
        adj[b].push_back(a);
      }
    for (auto& ns : adj) {
      std::sort(ns.begin(), ns.end());
      ns.erase(std::unique(ns.begin(), ns.end()), ns.end());
    }
    std::vector<uint8_t> locked(v.size(), 0);
    std::vector<int> remap(v.size());
    for (size_t i = 0; i < v.size(); ++i) remap[i] = (int)i;
    bool any = false;
    std::unordered_map<int64_t, char> seen;
    for (const Tri& t : f) {
      for (int e = 0; e < 3; ++e) {
        int a = t[e], b = t[(e + 1) % 3];
        int64_t k = ekey(a, b);
        if (!seen.emplace(k, 1).second) continue;
        if (locked[a] || locked[b] || bnd[a] || bnd[b]) continue;
        if (dist3(v[a], v[b]) >= low) continue;
        // link condition: exactly two shared one-ring neighbors
        int common = 0;
        for (int u : adj[a])
          if (std::binary_search(adj[b].begin(), adj[b].end(), u)) ++common;
        if (common != 2) continue;
        V3 mid = {(v[a][0] + v[b][0]) / 2, (v[a][1] + v[b][1]) / 2,
                  (v[a][2] + v[b][2]) / 2};
        // don't create over-long edges
        bool ok = true;
        for (int u : adj[a])
          if (u != b && dist3(mid, v[u]) > high) { ok = false; break; }
        if (ok)
          for (int u : adj[b])
            if (u != a && dist3(mid, v[u]) > high) { ok = false; break; }
        if (!ok) continue;
        v[a] = mid;
        remap[b] = a;
        locked[a] = locked[b] = 1;
        for (int u : adj[a]) locked[u] = 1;
        for (int u : adj[b]) locked[u] = 1;
        any = true;
      }
    }
    if (!any) return false;
    std::vector<Tri> nf;
    nf.reserve(f.size());
    std::set<std::array<int, 3>> dedup;
    for (const Tri& t : f) {
      Tri r = {remap[t[0]], remap[t[1]], remap[t[2]]};
      if (r[0] == r[1] || r[1] == r[2] || r[0] == r[2]) continue;
      std::array<int, 3> s = {r[0], r[1], r[2]};
      std::sort(s.begin(), s.end());
      if (!dedup.insert(s).second) continue;
      nf.push_back(r);
    }
    f = std::move(nf);
    return true;
  }

  void equalize_valences() {
    std::vector<uint8_t> bnd = boundary_verts();
    std::vector<int> val(v.size(), 0);
    std::unordered_map<int64_t, std::array<int, 2>> e2f;  // edge → faces
    e2f.reserve(f.size() * 3);
    std::set<int64_t> edge_set;
    for (size_t fi = 0; fi < f.size(); ++fi) {
      for (int e = 0; e < 3; ++e) {
        int a = f[fi][e], b = f[fi][(e + 1) % 3];
        int64_t k = ekey(a, b);
        auto it = e2f.find(k);
        if (it == e2f.end()) {
          e2f[k] = {(int)fi, -1};
          val[a]++;
          val[b]++;
          edge_set.insert(k);
        } else {
          it->second[1] = (int)fi;
        }
      }
    }
    std::vector<uint8_t> face_locked(f.size(), 0);
    auto tgt = [&](int u) { return bnd[u] ? 4 : 6; };
    for (auto& [k, ff] : e2f) {
      if (ff[1] < 0) continue;  // boundary edge
      if (face_locked[ff[0]] || face_locked[ff[1]]) continue;
      int u = (int)(k >> 32), w = (int)(k & 0xffffffff);
      // orient: find the face where the edge runs u→w; its third vertex
      // is `a`; the other face (w→u) contributes `b`
      int a = -1, b = -1;
      for (int side = 0; side < 2; ++side) {
        const Tri& t = f[ff[side]];
        for (int e = 0; e < 3; ++e) {
          if (t[e] == u && t[(e + 1) % 3] == w) a = t[(e + 2) % 3];
          if (t[e] == w && t[(e + 1) % 3] == u) b = t[(e + 2) % 3];
        }
      }
      if (a < 0 || b < 0 || a == b) continue;
      if (edge_set.count(ekey(a, b))) continue;  // flip would duplicate
      auto sq = [](int x) { return x * x; };
      int before = sq(val[u] - tgt(u)) + sq(val[w] - tgt(w)) +
                   sq(val[a] - tgt(a)) + sq(val[b] - tgt(b));
      int after = sq(val[u] - 1 - tgt(u)) + sq(val[w] - 1 - tgt(w)) +
                  sq(val[a] + 1 - tgt(a)) + sq(val[b] + 1 - tgt(b));
      if (after >= before) continue;
      // geometric guard: new normals must agree with the old pair
      V3 n_old = cross3(sub3(v[w], v[u]), sub3(v[a], v[u]));
      V3 n_old2 = cross3(sub3(v[u], v[w]), sub3(v[b], v[w]));
      V3 avg = {n_old[0] + n_old2[0], n_old[1] + n_old2[1],
                n_old[2] + n_old2[2]};
      V3 n1 = cross3(sub3(v[u], v[a]), sub3(v[b], v[a]));   // (a,u,b)
      V3 n2 = cross3(sub3(v[w], v[b]), sub3(v[a], v[b]));   // (b,w,a)
      if (dot3(n1, avg) <= 0 || dot3(n2, avg) <= 0) continue;
      f[ff[0]] = {a, u, b};
      f[ff[1]] = {b, w, a};
      face_locked[ff[0]] = face_locked[ff[1]] = 1;
      val[u]--; val[w]--; val[a]++; val[b]++;
      edge_set.insert(ekey(a, b));
    }
  }

  void tangential_relax(double lambda) {
    std::vector<uint8_t> bnd = boundary_verts();
    std::vector<V3> nrm(v.size(), {0, 0, 0});
    std::vector<V3> cent(v.size(), {0, 0, 0});
    std::vector<int> cnt(v.size(), 0);
    for (const Tri& t : f) {
      V3 n = cross3(sub3(v[t[1]], v[t[0]]), sub3(v[t[2]], v[t[0]]));
      for (int k = 0; k < 3; ++k)
        for (int d = 0; d < 3; ++d) nrm[t[k]][d] += n[d];
      for (int e = 0; e < 3; ++e) {
        int a = t[e], b = t[(e + 1) % 3];
        for (int d = 0; d < 3; ++d) {
          cent[a][d] += v[b][d];
          cent[b][d] += v[a][d];
        }
        cnt[a]++;
        cnt[b]++;
      }
    }
    for (size_t i = 0; i < v.size(); ++i) {
      if (bnd[i] || cnt[i] == 0) continue;
      // cnt double-counts (each undirected edge seen from both faces) but
      // uniformly, so the centroid is unaffected
      V3 c = {cent[i][0] / cnt[i], cent[i][1] / cnt[i],
              cent[i][2] / cnt[i]};
      V3 d = sub3(c, v[i]);
      double nn = dot3(nrm[i], nrm[i]);
      if (nn > 1e-30) {
        double s = dot3(d, nrm[i]) / nn;
        for (int k = 0; k < 3; ++k) d[k] -= s * nrm[i][k];
      }
      for (int k = 0; k < 3; ++k) v[i][k] += lambda * d[k];
    }
  }
};

}  // namespace

int isotropic_remesh(const float* verts, int n_verts, const int32_t* faces,
                     int n_faces, float target_len, int iterations,
                     float* out_verts, int32_t* out_faces, int32_t* out_nv,
                     int32_t* out_nf, int max_verts, int max_faces) {
  RemeshState st;
  st.max_v = (size_t)max_verts;
  st.max_f = (size_t)max_faces;
  st.v.resize(n_verts);
  for (int i = 0; i < n_verts; ++i)
    st.v[i] = {verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]};
  st.f.resize(n_faces);
  for (int i = 0; i < n_faces; ++i)
    st.f[i] = {faces[3 * i], faces[3 * i + 1], faces[3 * i + 2]};

  double high = target_len * 4.0 / 3.0;
  double low = target_len * 4.0 / 5.0;
  for (int it = 0; it < iterations; ++it) {
    st.split_long_edges(high);
    st.collapse_short_edges(low, high);
    st.equalize_valences();
    st.tangential_relax(0.5);
  }

  // compact: drop unreferenced vertices
  std::vector<int> used(st.v.size(), -1);
  int nv = 0, nf = 0;
  for (const Tri& t : st.f) {
    if (nf >= max_faces) { st.overflow = true; break; }
    int out[3];
    bool ok = true;
    for (int k = 0; k < 3; ++k) {
      int u = t[k];
      if (used[u] < 0) {
        if (nv >= max_verts) { ok = false; st.overflow = true; break; }
        used[u] = nv;
        out_verts[3 * nv] = (float)st.v[u][0];
        out_verts[3 * nv + 1] = (float)st.v[u][1];
        out_verts[3 * nv + 2] = (float)st.v[u][2];
        ++nv;
      }
      out[k] = used[u];
    }
    if (!ok) break;
    out_faces[3 * nf] = out[0];
    out_faces[3 * nf + 1] = out[1];
    out_faces[3 * nf + 2] = out[2];
    ++nf;
  }
  *out_nv = nv;
  *out_nf = nf;
  return st.overflow ? 1 : 0;
}

}  // extern "C"
