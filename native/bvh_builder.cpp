// Binned-SAH BVH builder for ptsharp_tpu.
//
// The TPU-side traversal consumes flattened preorder arrays with skip links
// (see ptsharp_tpu/accel/traverse.py); this builder produces higher-quality
// trees than the Python Morton-LBVH fallback (surface-area-heuristic splits,
// ~20-30% fewer node visits per ray) and builds ~1M-triangle meshes in
// tens of milliseconds. Replaces the reference's recursive pointer k-d tree
// construction (Tree.cs:201-265) with a contiguous, cache-friendly,
// duplication-free build.
//
// C ABI (ctypes-friendly):
//   ptbvh_build(tri_bmin, tri_bmax, num_tris, leaf_size,
//               node_bmin, node_bmax, node_first, node_count, node_skip,
//               tri_order) -> node count (or -1 on error)
// Output arrays must have capacity 2 * num_tris nodes.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Aabb {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const Aabb &o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const Vec3 &p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float half_area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct BuildNode {
  Aabb box;
  int left = -1;   // child index in nodes vector; -1 = leaf
  int right = -1;
  int first = 0;   // leaf: first triangle in ordered list
  int count = 0;   // leaf: triangle count
};

constexpr int kNumBins = 16;

struct Builder {
  const float *tri_bmin;
  const float *tri_bmax;
  int leaf_size;
  std::vector<Aabb> boxes;
  std::vector<Vec3> centroids;
  std::vector<int> order;
  std::vector<BuildNode> nodes;

  Aabb tri_box(int t) const {
    Aabb b;
    b.lo = {tri_bmin[3 * t], tri_bmin[3 * t + 1], tri_bmin[3 * t + 2]};
    b.hi = {tri_bmax[3 * t], tri_bmax[3 * t + 1], tri_bmax[3 * t + 2]};
    return b;
  }

  int build(int begin, int end) {
    BuildNode node;
    Aabb cbox;  // centroid bounds
    for (int i = begin; i < end; ++i) {
      node.box.grow(boxes[order[i]]);
      cbox.grow(centroids[order[i]]);
    }
    int idx = (int)nodes.size();
    nodes.push_back(node);

    int n = end - begin;
    if (n <= leaf_size) {
      nodes[idx].first = begin;
      nodes[idx].count = n;
      return idx;
    }

    // choose axis = widest centroid extent
    float ext[3] = {cbox.hi.x - cbox.lo.x, cbox.hi.y - cbox.lo.y,
                    cbox.hi.z - cbox.lo.z};
    int axis = 0;
    if (ext[1] > ext[0]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    float lo = axis == 0 ? cbox.lo.x : (axis == 1 ? cbox.lo.y : cbox.lo.z);
    float width = ext[axis];
    if (width <= 1e-12f) {
      // degenerate spread: median split
      int mid = begin + n / 2;
      nodes[idx].left = build(begin, mid);
      nodes[idx].right = build(mid, end);
      return idx;
    }

    // binned SAH
    struct Bin {
      Aabb box;
      int count = 0;
    } bins[kNumBins];
    auto bin_of = [&](int t) {
      const Vec3 &c = centroids[t];
      float v = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
      int b = (int)((v - lo) / width * kNumBins);
      return std::min(std::max(b, 0), kNumBins - 1);
    };
    for (int i = begin; i < end; ++i) {
      int b = bin_of(order[i]);
      bins[b].box.grow(boxes[order[i]]);
      bins[b].count++;
    }
    // sweep for best split
    Aabb right_acc[kNumBins];
    Aabb acc;
    for (int b = kNumBins - 1; b > 0; --b) {
      acc.grow(bins[b].box);
      right_acc[b] = acc;
    }
    Aabb left_acc;
    int left_count = 0;
    float best_cost = FLT_MAX;
    int best_split = -1;
    for (int b = 0; b < kNumBins - 1; ++b) {
      left_acc.grow(bins[b].box);
      left_count += bins[b].count;
      int right_count = n - left_count;
      if (left_count == 0 || right_count == 0) continue;
      float cost = left_acc.half_area() * left_count +
                   right_acc[b + 1].half_area() * right_count;
      if (cost < best_cost) {
        best_cost = cost;
        best_split = b;
      }
    }

    int mid;
    if (best_split < 0) {
      mid = begin + n / 2;
      std::nth_element(order.begin() + begin, order.begin() + mid,
                       order.begin() + end, [&](int a, int b2) {
                         const Vec3 &ca = centroids[a];
                         const Vec3 &cb = centroids[b2];
                         float va = axis == 0 ? ca.x : (axis == 1 ? ca.y : ca.z);
                         float vb = axis == 0 ? cb.x : (axis == 1 ? cb.y : cb.z);
                         return va < vb;
                       });
    } else {
      auto it = std::partition(order.begin() + begin, order.begin() + end,
                               [&](int t) { return bin_of(t) <= best_split; });
      mid = (int)(it - order.begin());
      if (mid == begin || mid == end) mid = begin + n / 2;
    }

    nodes[idx].left = build(begin, mid);
    nodes[idx].right = build(mid, end);
    return idx;
  }
};

}  // namespace

extern "C" {

int ptbvh_build(const float *tri_bmin, const float *tri_bmax, int num_tris,
                int leaf_size, float *node_bmin, float *node_bmax,
                int *node_first, int *node_count, int *node_skip,
                int *tri_order) {
  if (num_tris <= 0 || leaf_size <= 0) return -1;
  Builder b;
  b.tri_bmin = tri_bmin;
  b.tri_bmax = tri_bmax;
  b.leaf_size = leaf_size;
  b.boxes.resize(num_tris);
  b.centroids.resize(num_tris);
  b.order.resize(num_tris);
  for (int t = 0; t < num_tris; ++t) {
    b.boxes[t] = b.tri_box(t);
    b.centroids[t] = {0.5f * (b.boxes[t].lo.x + b.boxes[t].hi.x),
                      0.5f * (b.boxes[t].lo.y + b.boxes[t].hi.y),
                      0.5f * (b.boxes[t].lo.z + b.boxes[t].hi.z)};
    b.order[t] = t;
  }
  b.nodes.reserve(2 * num_tris);
  b.build(0, num_tris);

  // flatten preorder with skip links; build() already emitted preorder
  // (parent before children, left subtree contiguous), so subtree sizes
  // give the skip targets directly.
  int n = (int)b.nodes.size();
  if (n > 2 * num_tris) return -1;
  // compute subtree sizes via reverse scan: a node's subtree is itself
  // plus children subtrees; children have higher indices (preorder).
  std::vector<int> size(n, 1);
  for (int i = n - 1; i >= 0; --i) {
    const BuildNode &nd = b.nodes[i];
    if (nd.left >= 0) size[i] = 1 + size[nd.left] + size[nd.right];
  }
  for (int i = 0; i < n; ++i) {
    const BuildNode &nd = b.nodes[i];
    node_bmin[3 * i] = nd.box.lo.x;
    node_bmin[3 * i + 1] = nd.box.lo.y;
    node_bmin[3 * i + 2] = nd.box.lo.z;
    node_bmax[3 * i] = nd.box.hi.x;
    node_bmax[3 * i + 1] = nd.box.hi.y;
    node_bmax[3 * i + 2] = nd.box.hi.z;
    node_first[i] = nd.left >= 0 ? 0 : nd.first;
    node_count[i] = nd.left >= 0 ? 0 : nd.count;
    node_skip[i] = i + size[i];
  }
  std::memcpy(tri_order, b.order.data(), sizeof(int) * num_tris);
  return n;
}

}  // extern "C"
