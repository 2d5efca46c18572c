// Native grid MRF solver: alpha-expansion with a Dinic max-flow core.
//
// Replaces the reference's pymaxflow dependency
// (/root/reference/Space_Carving/mg_3d_to_dist.py:4-25 uses
// maxflow.fastmin.aexpansion_grid): given a per-pixel label cost volume
// [H, W, L] and a pairwise label-cost matrix [L, L] (truncated linear in the
// space-carving use), find a labeling minimizing
//     sum_p D(p, l_p) + sum_{(p,q) in 4-grid} V(l_p, l_q)
// by repeated alpha-expansion moves, each solved exactly as a min cut.
//
// The pairwise cost must be a metric (V(a,a)=0, symmetric, triangle
// inequality) for the expansion construction to be submodular; truncated
// linear qualifies.
//
// Exposed as a C ABI for ctypes.  Build: make -C native (produces
// libseason_native.so).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

// ---------------------------------------------------------------------------
// Dinic max-flow on a fixed graph (arc-array representation).
// ---------------------------------------------------------------------------
struct Dinic {
  struct Arc { int32_t to; int32_t next; double cap; };
  std::vector<Arc> arcs;
  std::vector<int32_t> head;   // per-node first arc
  std::vector<int32_t> level;
  std::vector<int32_t> iter;
  int n;

  explicit Dinic(int n_nodes) : head(n_nodes, -1), level(n_nodes),
                                iter(n_nodes), n(n_nodes) {}

  void add_edge(int u, int v, double cap_uv, double cap_vu) {
    arcs.push_back({(int32_t)v, head[u], cap_uv});
    head[u] = (int32_t)arcs.size() - 1;
    arcs.push_back({(int32_t)u, head[v], cap_vu});
    head[v] = (int32_t)arcs.size() - 1;
  }

  bool bfs(int s, int t) {
    std::fill(level.begin(), level.end(), -1);
    std::vector<int32_t> q;
    q.reserve(n);
    q.push_back(s);
    level[s] = 0;
    for (size_t qi = 0; qi < q.size(); ++qi) {
      int u = q[qi];
      for (int e = head[u]; e != -1; e = arcs[e].next) {
        if (arcs[e].cap > 1e-12 && level[arcs[e].to] < 0) {
          level[arcs[e].to] = level[u] + 1;
          q.push_back(arcs[e].to);
        }
      }
    }
    return level[t] >= 0;
  }

  double dfs(int u, int t, double f) {
    if (u == t) return f;
    for (int32_t &e = iter[u]; e != -1; e = arcs[e].next) {
      int v = arcs[e].to;
      if (arcs[e].cap > 1e-12 && level[v] == level[u] + 1) {
        double d = dfs(v, t, std::min(f, arcs[e].cap));
        if (d > 0) {
          arcs[e].cap -= d;
          arcs[e ^ 1].cap += d;
          return d;
        }
      }
    }
    return 0;
  }

  double max_flow(int s, int t) {
    double flow = 0;
    while (bfs(s, t)) {
      for (int i = 0; i < n; ++i) iter[i] = head[i];
      double f;
      while ((f = dfs(s, t, std::numeric_limits<double>::max())) > 0)
        flow += f;
    }
    return flow;
  }

  // nodes reachable from s in the residual graph = source side (keep label)
  void min_cut_side(int s, std::vector<uint8_t> *source_side) {
    std::fill(source_side->begin(), source_side->end(), 0);
    std::vector<int32_t> q;
    q.reserve(n);
    q.push_back(s);
    (*source_side)[s] = 1;
    for (size_t qi = 0; qi < q.size(); ++qi) {
      int u = q[qi];
      for (int e = head[u]; e != -1; e = arcs[e].next) {
        if (arcs[e].cap > 1e-12 && !(*source_side)[arcs[e].to]) {
          (*source_side)[arcs[e].to] = 1;
          q.push_back(arcs[e].to);
        }
      }
    }
  }
};

inline double Dat(const float *data, int W, int L, int y, int x, int l) {
  return (double)data[((size_t)y * W + x) * L + l];
}

double labeling_energy(const float *data, const float *smooth, int H, int W,
                       int L, const int32_t *labels) {
  double e = 0;
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      int l = labels[y * W + x];
      e += Dat(data, W, L, y, x, l);
      if (x + 1 < W) e += (double)smooth[l * L + labels[y * W + x + 1]];
      if (y + 1 < H) e += (double)smooth[l * L + labels[(y + 1) * W + x]];
    }
  return e;
}

// One alpha-expansion move; returns true if labeling changed.
bool expand(const float *data, const float *smooth, int H, int W, int L,
            int alpha, int32_t *labels) {
  const int n_pix = H * W;
  const int S = n_pix, T = n_pix + 1;
  Dinic g(n_pix + 2);
  // terminal capacities: s->p cut when p takes alpha (sink side) costs
  // D(p, alpha); p->t cut when p keeps its label costs D(p, l_p)
  // (infinite when l_p == alpha, it cannot "keep" anything else).
  const double INF = 1e30;
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      int p = y * W + x;
      int lp = labels[p];
      double cap_s = Dat(data, W, L, y, x, alpha);
      double cap_t = (lp == alpha) ? INF : Dat(data, W, L, y, x, lp);
      // pairwise reparameterization below may add to these; collect first
      g.add_edge(S, p, cap_s, 0.0);
      g.add_edge(p, T, cap_t, 0.0);
    }
  // pairwise terms: for neighbors (p, q):
  //   A = V(lp, lq), B = V(lp, alpha), C = V(alpha, lq), D = 0
  //   E(xp,xq) = A + (C-A) xp + (D-C) xq + (B+C-A-D)(1-xp) xq
  // xp=1 <=> p takes alpha (sink side).  (C-A) goes on p's s/t links,
  // (D-C) on q's, the cross term is the p->q arc with cap B+C-A-D >= 0.
  auto add_unary = [&](int p, double w) {
    // +w when xp = 1  -> s->p cap w if w>0 else p->t cap -w
    if (w > 0) g.add_edge(S, p, w, 0.0);
    else if (w < 0) g.add_edge(p, T, -w, 0.0);
  };
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      int p = y * W + x;
      int lp = labels[p];
      const int dx[2] = {1, 0}, dy[2] = {0, 1};
      for (int d = 0; d < 2; ++d) {
        int nx2 = x + dx[d], ny2 = y + dy[d];
        if (nx2 >= W || ny2 >= H) continue;
        int q = ny2 * W + nx2;
        int lq = labels[q];
        double A = smooth[lp * L + lq];
        double B = smooth[lp * L + alpha];
        double C = smooth[alpha * L + lq];
        // D = smooth[alpha][alpha] = 0
        add_unary(p, C - A);
        add_unary(q, -C);          // (D - C) with D = 0
        double cross = B + C - A;  // >= 0 for a metric
        if (cross > 0) g.add_edge(p, q, cross, 0.0);
      }
    }
  g.max_flow(S, T);
  std::vector<uint8_t> src(n_pix + 2);
  g.min_cut_side(S, &src);
  bool changed = false;
  for (int p = 0; p < n_pix; ++p) {
    if (!src[p] && labels[p] != alpha) {  // sink side -> take alpha
      labels[p] = alpha;
      changed = true;
    }
  }
  return changed;
}

}  // namespace

extern "C" {

// data:   [H, W, L] float32 label costs
// smooth: [L, L] float32 metric pairwise label costs
// labels: [H, W] int32, in/out (initial labeling in, result out)
// max_cycles: full passes over all labels (2 is usually enough)
// returns the final energy
double season_aexpansion_grid(const float *data, const float *smooth,
                              int H, int W, int L, int32_t *labels,
                              int max_cycles) {
  for (int cycle = 0; cycle < max_cycles; ++cycle) {
    bool any = false;
    for (int alpha = 0; alpha < L; ++alpha)
      any |= expand(data, smooth, H, W, L, alpha, labels);
    if (!any) break;
  }
  return labeling_energy(data, smooth, H, W, L, labels);
}

double season_grid_energy(const float *data, const float *smooth,
                          int H, int W, int L, const int32_t *labels) {
  return labeling_energy(data, smooth, H, W, L, labels);
}

}  // extern "C"
