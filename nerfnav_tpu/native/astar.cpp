// 6-connected grid A* — native core for planner warm starts.
//
// Capability parity: reference nav/quad_helpers.py:201-258 (host-Python A*
// with heapq). This is the framework's native runtime implementation (the
// reference keeps hot non-tensor code in C++/CUDA; our grid search is the
// analogous host-side hot path: ~8k cells expanded per plan, called per
// mission). Exposed through ctypes (nerfnav_tpu/native/__init__.py); the
// Python implementation in nav/astar.py remains the golden reference.
//
// Build: g++ -O3 -shared -fPIC -o libnerfnav.so astar.cpp

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>
#include <cmath>
#include <limits>

namespace {

struct Node {
  float f;
  float g;
  int idx;
  bool operator>(const Node& o) const { return f > o.f; }
};

inline float heuristic(int idx, int gx, int gy, int gz, int ny, int nz) {
  int x = idx / (ny * nz);
  int y = (idx / nz) % ny;
  int z = idx % nz;
  float dx = float(x - gx), dy = float(y - gy), dz = float(z - gz);
  return std::sqrt(dx * dx + dy * dy + dz * dz);
}

}  // namespace

extern "C" {

// Returns path length (cells, inclusive) written into out_path as flat
// indices, or -1 if unreachable, -2 on invalid input (occupied endpoints).
int astar3d(const uint8_t* occ, int nx, int ny, int nz, int sx, int sy, int sz,
            int gx, int gy, int gz, int* out_path, int max_len) {
  const int n = nx * ny * nz;
  const int start = (sx * ny + sy) * nz + sz;
  const int goal = (gx * ny + gy) * nz + gz;
  if (occ[start] || occ[goal]) return -2;

  std::vector<float> g_cost(n, std::numeric_limits<float>::infinity());
  std::vector<int> came(n, -1);
  std::vector<uint8_t> closed(n, 0);
  std::priority_queue<Node, std::vector<Node>, std::greater<Node>> open;

  g_cost[start] = 0.f;
  open.push({heuristic(start, gx, gy, gz, ny, nz), 0.f, start});

  const int dxs[6] = {-1, 1, 0, 0, 0, 0};
  const int dys[6] = {0, 0, -1, 1, 0, 0};
  const int dzs[6] = {0, 0, 0, 0, -1, 1};

  while (!open.empty()) {
    Node cur = open.top();
    open.pop();
    if (closed[cur.idx]) continue;
    closed[cur.idx] = 1;
    if (cur.idx == goal) {
      // reconstruct (reversed), then flip
      std::vector<int> rev;
      for (int c = goal; c != -1; c = came[c]) rev.push_back(c);
      int len = int(rev.size());
      if (len > max_len) return -3;
      for (int i = 0; i < len; ++i) out_path[i] = rev[len - 1 - i];
      return len;
    }
    int x = cur.idx / (ny * nz);
    int y = (cur.idx / nz) % ny;
    int z = cur.idx % nz;
    for (int k = 0; k < 6; ++k) {
      int xx = x + dxs[k], yy = y + dys[k], zz = z + dzs[k];
      if (xx < 0 || xx >= nx || yy < 0 || yy >= ny || zz < 0 || zz >= nz)
        continue;
      int nidx = (xx * ny + yy) * nz + zz;
      if (occ[nidx] || closed[nidx]) continue;
      float ng = cur.g + 1.f;
      if (ng < g_cost[nidx]) {
        g_cost[nidx] = ng;
        came[nidx] = cur.idx;
        open.push({ng + heuristic(nidx, gx, gy, gz, ny, nz), ng, nidx});
      }
    }
  }
  return -1;
}

}  // extern "C"
