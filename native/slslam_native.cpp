// slslam-tpu native runtime components.
//
// The host-side runtime pieces that the reference implements in C++ and
// that sit off the TPU compute path: the observation-file loader
// (reference: SLAM::grab_new_frame, src/slam.cpp:62-108) and the
// metric-embedding graph walk (SLAM::metric_embedding,
// src/slam.cpp:1317-1366).  Exposed as a C ABI for ctypes; NumPy arrays are
// passed as raw pointers.
//
// Build: native/build.sh  (g++ -O2 -shared -fPIC)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>
#include <utility>

extern "C" {

// ---------------------------------------------------------------------------
// Observation file parsing
// ---------------------------------------------------------------------------

// Parse one line-track file: rows "feature_id x0 y0 x1 y1 x2 y2 x3 y3 extra".
// Writes feature ids to ids[max_rows] and the 8 coords to obs[max_rows*8].
// Returns the number of rows parsed, or -1 if the file cannot be opened.
int slslam_parse_obs_file(const char* path, int* ids, double* obs,
                          int max_rows) {
  FILE* fp = fopen(path, "r");
  if (!fp) return -1;

  char line[512];
  int n = 0;
  while (n < max_rows && fgets(line, sizeof(line), fp)) {
    char* p = line;
    char* end;
    long fid = strtol(p, &end, 10);
    if (end == p) continue;  // blank / malformed line
    p = end;
    double vals[8];
    bool ok = true;
    for (int k = 0; k < 8; ++k) {
      double v = strtod(p, &end);
      if (end == p) { ok = false; break; }
      vals[k] = v;
      p = end;
    }
    if (!ok) continue;
    ids[n] = (int)fid;
    memcpy(obs + 8 * n, vals, sizeof(vals));
    ++n;
  }
  fclose(fp);
  return n;
}

// ---------------------------------------------------------------------------
// Metric embedding (best-first pose-field re-rooting)
// ---------------------------------------------------------------------------

static inline void compose(const double* Ra, const double* ta,
                           const double* Rb, const double* tb,
                           double* Rc, double* tc) {
  // T_c = T_a * T_b  (R_c = Ra Rb, t_c = Ra tb + ta)
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += Ra[3 * i + k] * Rb[3 * k + j];
      Rc[3 * i + j] = s;
    }
    double s = 0;
    for (int k = 0; k < 3; ++k) s += Ra[3 * i + k] * tb[k];
    tc[i] = s + ta[i];
  }
}

// Re-root the pose field at `root`.
//   n_kfs: number of keyframes (ids 0..n_kfs-1; absent ids get valid=0)
//   n_edges: number of DIRECTED edges
//   edge_i, edge_j: endpoints (edge transform maps frame i -> frame j)
//   edge_T: n_edges x 12 row-major (R 9, t 3)
//   order_out: n_kfs ints — kf ids in traversal (distance) order
//   T_out: n_kfs x 12 — embedded world->cam poses
//   valid_out: n_kfs bytes — 1 if reached
// Returns the number of reached keyframes.
int slslam_metric_embedding(int n_kfs, int n_edges, const int* edge_i,
                            const int* edge_j, const double* edge_T,
                            int root, int* order_out, double* T_out,
                            unsigned char* valid_out, double* dist_out) {
  // adjacency: for each node, list of edge indices leaving it
  std::vector<std::vector<int>> adj(n_kfs);
  for (int e = 0; e < n_edges; ++e) {
    int i = edge_i[e];
    if (i >= 0 && i < n_kfs) adj[i].push_back(e);
  }

  memset(valid_out, 0, n_kfs);
  std::vector<double> dist(n_kfs, 0.0);

  // identity at root
  double* Tr = T_out + 12 * root;
  memset(Tr, 0, 12 * sizeof(double));
  Tr[0] = Tr[4] = Tr[8] = 1.0;
  valid_out[root] = 1;

  typedef std::pair<double, int> Item;  // (accumulated distance, kf)
  std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;
  pq.push(Item(0.0, root));

  std::vector<unsigned char> popped(n_kfs, 0);
  int n_order = 0;

  while (!pq.empty()) {
    Item it = pq.top();
    pq.pop();
    int kid = it.second;
    if (popped[kid]) continue;
    popped[kid] = 1;
    dist_out[n_order] = it.first;
    order_out[n_order++] = kid;

    const double* Tk = T_out + 12 * kid;
    for (size_t a = 0; a < adj[kid].size(); ++a) {
      int e = adj[kid][a];
      int nb = edge_j[e];
      if (nb < 0 || nb >= n_kfs || valid_out[nb]) continue;
      const double* Te = edge_T + 12 * e;
      double* Tn = T_out + 12 * nb;
      // T_nb = T_edge * T_k  (matching slam.cpp:1353-1357: assignment at
      // insertion time using the parent's pose)
      compose(Te, Te + 9, Tk, Tk + 9, Tn, Tn + 9);
      valid_out[nb] = 1;
      double nd = sqrt(Te[9] * Te[9] + Te[10] * Te[10] + Te[11] * Te[11]);
      dist[nb] = it.first + nd;
      pq.push(Item(dist[nb], nb));
    }
  }
  return n_order;
}

}  // extern "C"
