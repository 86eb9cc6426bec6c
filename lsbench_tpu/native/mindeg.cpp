// Native minimum-degree ordering — the setup-path hot spot of the direct
// solver (the role cuSolver's csrsymamdHost plays, cusparse.c:72-74).
//
// Quotient-graph formulation (the AMD/MMD data structure): eliminated
// pivots become *elements* carrying their boundary list L_e; variables keep
// a variable-adjacency list A_v plus an element list E_v. Eliminating p
// merges A_p with the boundaries of its elements (which are absorbed), so
// cliques are never materialized — unlike the pure-Python fallback
// (ordering/amd.py), which inserts clique edges and is quadratic in
// practice. Degrees are exact exterior degrees, computed with a mark
// array, so the (degree, node) lexicographic tie-break — and therefore the
// permutation — matches the Python implementation bit-for-bit.
//
// C ABI for ctypes. Input: symmetrized adjacency (no self loops) in CSR.

#include <cstddef>
#include <cstdint>
#include <queue>
#include <vector>

extern "C" {

int lsb_min_degree(int64_t n, const int64_t *offs, const int32_t *cols,
                   int64_t *perm_out) {
  std::vector<std::vector<int32_t>> A(n), E(n), L(n);
  for (int64_t i = 0; i < n; ++i)
    A[i].assign(cols + offs[i], cols + offs[i + 1]);

  using Entry = std::pair<int64_t, int64_t>;  // (degree, node)
  std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;
  std::vector<int64_t> deg(n);
  for (int64_t i = 0; i < n; ++i) {
    deg[i] = (int64_t)A[i].size();
    heap.emplace(deg[i], i);
  }

  std::vector<char> eliminated(n, 0), absorbed(n, 0), in_lp(n, 0);
  std::vector<int64_t> mark(n, -1);
  int64_t stamp = 0, pos = 0;
  std::vector<int32_t> Lp;

  while (!heap.empty()) {
    auto [d, p] = heap.top();
    heap.pop();
    if (eliminated[p] || d != deg[p]) continue;  // stale entry
    eliminated[p] = 1;
    perm_out[pos++] = p;

    // Boundary L_p = (A_p ∪ ∪_{e∈E_p} L_e) \ {p} over live variables.
    ++stamp;
    mark[p] = stamp;
    Lp.clear();
    for (int32_t v : A[p])
      if (!eliminated[v] && mark[v] != stamp) {
        mark[v] = stamp;
        Lp.push_back(v);
      }
    for (int32_t e : E[p]) {
      if (absorbed[e]) continue;
      for (int32_t v : L[e])
        if (!eliminated[v] && mark[v] != stamp) {
          mark[v] = stamp;
          Lp.push_back(v);
        }
      absorbed[e] = 1;
      L[e].clear();
      L[e].shrink_to_fit();
    }
    A[p].clear();
    A[p].shrink_to_fit();
    E[p].clear();
    L[p] = Lp;
    in_lp[p] = 1;
    for (int32_t v : Lp) in_lp[v] = 1;

    // Update each boundary variable: prune its lists, recompute degree.
    for (int32_t v : Lp) {
      // A_v loses members of L_p ∪ {p} (now reached through element p)
      // and any eliminated stragglers.
      auto &av = A[v];
      std::size_t w = 0;
      for (int32_t u : av)
        if (!eliminated[u] && !in_lp[u]) av[w++] = u;
      av.resize(w);
      // E_v drops absorbed elements, gains p.
      auto &ev = E[v];
      w = 0;
      for (int32_t e : ev)
        if (!absorbed[e]) ev[w++] = e;
      ev.resize(w);
      ev.push_back((int32_t)p);
      // Exact exterior degree via a fresh mark pass.
      ++stamp;
      mark[v] = stamp;
      int64_t dv = 0;
      for (int32_t u : av)
        if (mark[u] != stamp) {
          mark[u] = stamp;
          ++dv;
        }
      for (int32_t e : ev)
        for (int32_t u : L[e])
          if (!eliminated[u] && mark[u] != stamp) {
            mark[u] = stamp;
            ++dv;
          }
      deg[v] = dv;
      heap.emplace(dv, (int64_t)v);
    }
    in_lp[p] = 0;
    for (int32_t v : Lp) in_lp[v] = 0;
  }
  return pos == n ? 0 : 1;
}

}  // extern "C"
