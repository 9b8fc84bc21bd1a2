// Exact transportation-problem solver (network simplex, MODI form).
//
// Solves  min sum_ij c_ij x_ij   s.t.  sum_j x_ij = s_i,  sum_i x_ij = d_j,
// x >= 0 integral (supplies/demands integral, sum s == sum d).
//
// Used by st_dadk_tpu/ops/kmeans_exact.py for the duplicate-site fast path
// of the reference-parity balanced k-means (KMeansConstrained semantics,
// reference stnf/models/st_interp.py:340-431): each Lloyd iteration's
// balanced assignment on u unique sites x k clusters is one transportation
// problem. The previous scipy-linprog column-generation route degenerated on
// skewed supplies (224 s for one u=803, k=81 assignment); this solver runs
// the same instance in milliseconds and warm-starts from the previous
// iteration's basis (supplies/caps unchanged across Lloyd iterations, only
// costs move, so the old basis stays primal-feasible).
//
// Basis = spanning tree over u+k nodes (u sources then k sinks) with
// u+k-1 basic cells. Pivoting: Dantzig rule (most negative reduced cost,
// one vectorizable scan of the u*k cost matrix per pivot), cycle found via
// tree parent pointers, leaving arc = min flow on the cycle's minus arcs.
// Degenerate pivots are allowed; cycling would need exact cost ties, which
// squared float distances do not generically produce — a pivot cap bounds
// the worst case and the Python caller falls back to the exact LP path if
// the cap is hit (status -1).
//
// Build: make -C native  (libstdadk_transport.so)

#include <cstdint>
#include <cstring>
#include <vector>
#include <limits>

namespace {

struct Tree {
    // node 0..u-1 = sources, u..u+k-1 = sinks; parent pointers rooted at 0
    std::vector<int32_t> parent;      // parent node, -1 at root
    std::vector<int32_t> depth;
    std::vector<double> pot;          // node potentials: red(i,j) = c - pi_i - pi_j
    std::vector<int32_t> head, nxt, adj_node;  // adjacency lists of basic arcs
};

}  // namespace

extern "C" {

// status: >=0 pivot count on success; -1 pivot cap hit; -2 bad input.
// flow, basis are u*k row-major in/out. warm!=0 reuses them as the start
// (must be a feasible tree basis from a previous call with the SAME
// supplies/demands).
int64_t stdadk_transport_simplex(
    int64_t u, int64_t k,
    const double* cost,
    const int64_t* supply, const int64_t* demand,
    int64_t* flow, uint8_t* basis,
    int64_t warm, int64_t max_pivots)
{
    const int64_t n = u + k;
    if (u <= 0 || k <= 0) return -2;
    int64_t ssum = 0, dsum = 0;
    for (int64_t i = 0; i < u; ++i) ssum += supply[i];
    for (int64_t j = 0; j < k; ++j) dsum += demand[j];
    if (ssum != dsum) return -2;

    if (!warm) {
        // Northwest-corner initial basis: staircase through the matrix is
        // always a spanning tree with exactly u+k-1 basic cells (the
        // simultaneous-exhaustion case advances only the row, leaving a
        // zero-flow basic cell in the next row).
        std::memset(flow, 0, sizeof(int64_t) * u * k);
        std::memset(basis, 0, sizeof(uint8_t) * u * k);
        std::vector<int64_t> s(supply, supply + u), d(demand, demand + k);
        int64_t i = 0, j = 0;
        while (i < u && j < k) {
            int64_t f = s[i] < d[j] ? s[i] : d[j];
            flow[i * k + j] = f;
            basis[i * k + j] = 1;
            s[i] -= f;
            d[j] -= f;
            if (i == u - 1 && j == k - 1) break;
            if (s[i] == 0 && i < u - 1) ++i;   // row exhausted (possibly both:
            else ++j;                          //  degenerate zero cell next)
        }
    }

    // build tree structure from basic cells
    Tree T;
    T.parent.assign(n, -1);
    T.depth.assign(n, 0);
    T.pot.assign(n, 0.0);
    auto rebuild_adj = [&]() {
        T.head.assign(n, -1);
        int64_t nb = 0;
        for (int64_t i = 0; i < u; ++i)
            for (int64_t j = 0; j < k; ++j) nb += basis[i * k + j];
        T.nxt.assign(2 * nb, -1);
        T.adj_node.assign(2 * nb, -1);
        int32_t e = 0;
        for (int64_t i = 0; i < u; ++i)
            for (int64_t j = 0; j < k; ++j)
                if (basis[i * k + j]) {
                    int32_t a = (int32_t)i, b = (int32_t)(u + j);
                    T.adj_node[e] = b; T.nxt[e] = T.head[a]; T.head[a] = e; ++e;
                    T.adj_node[e] = a; T.nxt[e] = T.head[b]; T.head[b] = e; ++e;
                }
        return nb;
    };
    // (re)root at node 0, compute parents/depths/potentials in one DFS
    std::vector<int32_t> stack;
    stack.reserve(n);
    auto reroot = [&]() -> bool {
        std::vector<uint8_t> seen(n, 0);
        T.parent[0] = -1; T.depth[0] = 0; T.pot[0] = 0.0;
        seen[0] = 1;
        stack.clear();
        stack.push_back(0);
        int64_t cnt = 1;
        while (!stack.empty()) {
            int32_t v = stack.back(); stack.pop_back();
            for (int32_t e = T.head[v]; e != -1; e = T.nxt[e]) {
                int32_t w = T.adj_node[e];
                if (seen[w]) continue;
                seen[w] = 1; ++cnt;
                T.parent[w] = v;
                T.depth[w] = T.depth[v] + 1;
                // basic arc (i,j): c_ij = pi_i + pi_j
                int64_t i = v < u ? v : w, j = v < u ? w - u : v - u;
                T.pot[w] = cost[i * k + j] - T.pot[v];
                stack.push_back(w);
            }
        }
        return cnt == n;   // basis must span all nodes
    };
    if (rebuild_adj() != n - 1 || !reroot()) return -2;

    std::vector<int32_t> path_i, path_j;  // cycle node lists
    path_i.reserve(n); path_j.reserve(n);

    int64_t pivots = 0;
    const double eps = 1e-11;
    while (true) {
        // entering arc: most negative reduced cost (vectorizable scan)
        double best = -eps;
        int64_t bi = -1, bj = -1;
        for (int64_t i = 0; i < u; ++i) {
            const double* ci = cost + i * k;
            const double pi = T.pot[i];
            // inner loop is a pure min-scan over k doubles -> SIMD
            double row_best = best;
            int64_t row_j = -1;
            for (int64_t j = 0; j < k; ++j) {
                double r = ci[j] - pi - T.pot[u + j];
                if (r < row_best) { row_best = r; row_j = j; }
            }
            if (row_j >= 0) { best = row_best; bi = i; bj = row_j; }
        }
        if (bi < 0) break;   // optimal
        // cap check AFTER the entering-arc scan: a basis that becomes
        // optimal on exactly the max_pivots-th pivot (or a warm start
        // already optimal with max_pivots == 0) is a solved instance,
        // not a cap hit
        if (pivots >= max_pivots) return -1;

        // cycle: tree path between bi and (u+bj), plus the entering arc.
        // Walk both endpoints up to their LCA, recording nodes.
        int32_t a = (int32_t)bi, b = (int32_t)(u + bj);
        path_i.clear(); path_j.clear();
        int32_t x = a, y = b;
        while (T.depth[x] > T.depth[y]) { path_i.push_back(x); x = T.parent[x]; }
        while (T.depth[y] > T.depth[x]) { path_j.push_back(y); y = T.parent[y]; }
        while (x != y) {
            path_i.push_back(x); x = T.parent[x];
            path_j.push_back(y); y = T.parent[y];
        }
        path_i.push_back(x);                       // LCA
        // full cycle node sequence: a ... lca ... b, then back to a via
        // the entering arc. Arcs alternate source-sink, so orientation
        // (+/-) alternates along the node sequence starting with + for
        // the entering arc (a,b).
        std::vector<int32_t> cyc;
        cyc.reserve(path_i.size() + path_j.size());
        for (auto v : path_i) cyc.push_back(v);
        for (auto it = path_j.rbegin(); it != path_j.rend(); ++it)
            cyc.push_back(*it);
        // cyc = [a, ..., lca, ..., b]; consecutive pairs are basic arcs.
        // The entering arc (a,b) closes the cycle and gets +delta; arcs
        // along the path alternate -, +, -, ... starting from a.
        int64_t delta = std::numeric_limits<int64_t>::max();
        int64_t leave_pos = -1;
        for (size_t p = 0; p + 1 < cyc.size(); ++p) {
            int32_t v = cyc[p], w = cyc[p + 1];
            int64_t i = v < u ? v : w, j = v < u ? w - u : v - u;
            if (p % 2 == 0) {  // minus arc
                int64_t f = flow[i * k + j];
                if (f < delta) { delta = f; leave_pos = (int64_t)p; }
            }
        }
        if (leave_pos < 0) return -2;  // cannot happen on a valid cycle

        // apply flow change
        flow[bi * k + bj] += delta;
        for (size_t p = 0; p + 1 < cyc.size(); ++p) {
            int32_t v = cyc[p], w = cyc[p + 1];
            int64_t i = v < u ? v : w, j = v < u ? w - u : v - u;
            flow[i * k + j] += (p % 2 == 0) ? -delta : delta;
        }
        // basis swap
        {
            int32_t v = cyc[leave_pos], w = cyc[leave_pos + 1];
            int64_t i = v < u ? v : w, j = v < u ? w - u : v - u;
            basis[i * k + j] = 0;
        }
        basis[bi * k + bj] = 1;
        // rebuild adjacency + potentials (O(u+k+nb); pivot scan dominates)
        if (rebuild_adj() != n - 1 || !reroot()) return -2;
        ++pivots;
    }
    return (int64_t)pivots;
}

}  // extern "C"
