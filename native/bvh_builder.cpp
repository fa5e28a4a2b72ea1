// Native binned-SAH BVH builder.
//
// C++ implementation of the scene compiler's hot host path (the
// reference builds its mesh BVHs in C++ too, scene.cpp:435-599). Same
// algorithm and output contract as path_tracer_tpu/scene/bvh.py:
// 32 centroid bins per axis, prefix/suffix half-area sweeps, leaf
// whenever splitting costs at least as much as not splitting, forced
// median splits to cap leaves at max_leaf_faces, children at
// consecutive indices.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image):
//   int build_bvh(const float* tris, int face_count, int max_leaf_faces,
//                 float* node_min, float* node_max, int* node_a,
//                 int* node_b, int* face_order, int* out_node_count,
//                 int* out_depth);
// Caller allocates node arrays for the worst case (2 * face_count).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBins = 32;

struct Vec3 {
    float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}

inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

inline float half_area(const Vec3& lo, const Vec3& hi) {
    float dx = std::max(hi.x - lo.x, 0.0f);
    float dy = std::max(hi.y - lo.y, 0.0f);
    float dz = std::max(hi.z - lo.z, 0.0f);
    return dx * dy + dy * dz + dz * dx;
}

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Builder {
    const float* tris;  // (F, 3 verts, 3 comps)
    int max_leaf;
    std::vector<Vec3> tri_min, tri_max, centroid;
    std::vector<int> order;
    std::vector<Vec3> node_min, node_max;
    std::vector<int> node_a, node_b;
    int depth = 0;

    float component(const Vec3& v, int axis) const {
        return axis == 0 ? v.x : axis == 1 ? v.y : v.z;
    }

    void build(int node, int begin, int end, int level) {
        depth = std::max(depth, level);
        Vec3 lo = {kInf, kInf, kInf}, hi = {-kInf, -kInf, -kInf};
        for (int i = begin; i < end; i++) {
            lo = vmin(lo, tri_min[order[i]]);
            hi = vmax(hi, tri_max[order[i]]);
        }
        node_min[node] = lo;
        node_max[node] = hi;

        const int count = end - begin;
        float best_cost = kInf, best_pos = 0.0f;
        int best_axis = -1;

        for (int axis = 0; axis < 3; axis++) {
            float cmin = kInf, cmax = -kInf;
            for (int i = begin; i < end; i++) {
                float c = component(centroid[order[i]], axis);
                cmin = std::min(cmin, c);
                cmax = std::max(cmax, c);
            }
            if (cmin == cmax) continue;

            Vec3 bin_min[kBins], bin_max[kBins];
            int bin_count[kBins] = {0};
            for (int b = 0; b < kBins; b++) {
                bin_min[b] = {kInf, kInf, kInf};
                bin_max[b] = {-kInf, -kInf, -kInf};
            }
            const float scale = kBins / (cmax - cmin);
            for (int i = begin; i < end; i++) {
                int f = order[i];
                int b = std::min(
                    int(scale * (component(centroid[f], axis) - cmin)),
                    kBins - 1);
                bin_min[b] = vmin(bin_min[b], tri_min[f]);
                bin_max[b] = vmax(bin_max[b], tri_max[f]);
                bin_count[b]++;
            }

            float left_area[kBins - 1], right_area[kBins - 1];
            int left_count[kBins - 1], right_count[kBins - 1];
            Vec3 alo = {kInf, kInf, kInf}, ahi = {-kInf, -kInf, -kInf};
            int acc = 0;
            for (int i = 0; i < kBins - 1; i++) {
                acc += bin_count[i];
                if (bin_count[i]) {
                    alo = vmin(alo, bin_min[i]);
                    ahi = vmax(ahi, bin_max[i]);
                }
                left_count[i] = acc;
                left_area[i] = acc ? half_area(alo, ahi) : 0.0f;
            }
            alo = {kInf, kInf, kInf};
            ahi = {-kInf, -kInf, -kInf};
            acc = 0;
            for (int i = kBins - 2; i >= 0; i--) {
                acc += bin_count[i + 1];
                if (bin_count[i + 1]) {
                    alo = vmin(alo, bin_min[i + 1]);
                    ahi = vmax(ahi, bin_max[i + 1]);
                }
                right_count[i] = acc;
                right_area[i] = acc ? half_area(alo, ahi) : 0.0f;
            }
            const float interval = (cmax - cmin) / kBins;
            for (int i = 0; i < kBins - 1; i++) {
                float cost = left_count[i] * left_area[i]
                           + right_count[i] * right_area[i];
                if (cost < best_cost) {
                    best_cost = cost;
                    best_axis = axis;
                    best_pos = cmin + interval * (i + 1);
                }
            }
        }

        const bool must_split = count > max_leaf;
        const float no_split = count * half_area(lo, hi);
        if ((best_axis < 0 || best_cost >= no_split) && !must_split)
            return;  // leaf; node_a/node_b already hold the face range

        int split = begin;
        if (best_axis >= 0) {
            // Stable partition: left block then right block.
            auto mid = std::stable_partition(
                order.begin() + begin, order.begin() + end,
                [&](int f) {
                    return component(centroid[f], best_axis) < best_pos;
                });
            split = int(mid - order.begin());
        }
        if (split == begin || split == end) {
            if (!must_split) return;
            // Degenerate: median split along the largest extent.
            int axis = 0;
            Vec3 size = {hi.x - lo.x, hi.y - lo.y, hi.z - lo.z};
            if (size.y > size.x) axis = 1;
            if (component(size, 2) > component(size, axis)) axis = 2;
            std::stable_sort(order.begin() + begin, order.begin() + end,
                             [&](int a, int b) {
                                 return component(centroid[a], axis)
                                      < component(centroid[b], axis);
                             });
            split = begin + count / 2;
        }

        const int left = int(node_a.size());
        node_a[node] = left;
        node_b[node] = 0;
        node_min.resize(node_min.size() + 2);
        node_max.resize(node_max.size() + 2);
        node_a.push_back(begin);
        node_b.push_back(split);
        node_a.push_back(split);
        node_b.push_back(end);
        build(left, begin, split, level + 1);
        build(left + 1, split, end, level + 1);
    }
};

}  // namespace

extern "C" int build_bvh(const float* tris, int face_count,
                         int max_leaf_faces, float* out_node_min,
                         float* out_node_max, int* out_node_a,
                         int* out_node_b, int* out_face_order,
                         int* out_node_count, int* out_depth) {
    Builder b;
    b.tris = tris;
    b.max_leaf = max_leaf_faces;
    b.tri_min.resize(face_count);
    b.tri_max.resize(face_count);
    b.centroid.resize(face_count);
    b.order.resize(face_count);
    for (int f = 0; f < face_count; f++) {
        const float* p = tris + f * 9;
        Vec3 v0 = {p[0], p[1], p[2]};
        Vec3 v1 = {p[3], p[4], p[5]};
        Vec3 v2 = {p[6], p[7], p[8]};
        b.tri_min[f] = vmin(v0, vmin(v1, v2));
        b.tri_max[f] = vmax(v0, vmax(v1, v2));
        b.centroid[f] = {(v0.x + v1.x + v2.x) / 3.0f,
                         (v0.y + v1.y + v2.y) / 3.0f,
                         (v0.z + v1.z + v2.z) / 3.0f};
        b.order[f] = f;
    }
    b.node_min.resize(1);
    b.node_max.resize(1);
    b.node_a.push_back(0);
    b.node_b.push_back(face_count);
    if (face_count > 0) b.build(0, 0, face_count, 0);

    const int n = int(b.node_a.size());
    for (int i = 0; i < n; i++) {
        out_node_min[i * 3 + 0] = b.node_min[i].x;
        out_node_min[i * 3 + 1] = b.node_min[i].y;
        out_node_min[i * 3 + 2] = b.node_min[i].z;
        out_node_max[i * 3 + 0] = b.node_max[i].x;
        out_node_max[i * 3 + 1] = b.node_max[i].y;
        out_node_max[i * 3 + 2] = b.node_max[i].z;
        out_node_a[i] = b.node_a[i];
        out_node_b[i] = b.node_b[i];
    }
    std::memcpy(out_face_order, b.order.data(),
                face_count * sizeof(int));
    *out_node_count = n;
    *out_depth = b.depth;
    return 0;
}
