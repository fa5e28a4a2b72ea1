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

// --- SBVH: binned spatial splits (Stich et al. 2009, HPG) -------------
//
// Fragment-based builder for the world-flattened wide-BVH tables:
// architectural scenes (large thin floor/wall triangles) leave 2-3x on
// the table for pure object splits because child boxes overlap badly.
// A fragment is (face, clipped AABB); straddling fragments are split at
// the chosen plane by clipping the actual triangle polygon, duplicating
// the reference. Leaves may therefore reference a face whose full
// extent escapes the leaf bounds -- every (ray, face) intersection is
// still covered by some leaf containing it, which is all the traversal
// needs (hits found "early" are valid hits).
//
// Differences from the paper kept deliberately simple: no reference
// unsplitting (a straddler that cannot be split within the fragment
// budget goes wholly to the centroid side), spatial splits attempted
// whenever the best object split's child overlap exceeds alpha times
// the root area.

constexpr float kAlpha = 1e-5f;
// Spatial splits are only attempted on nodes with more than
// kSpatialMinCount fragments and above kSpatialMaxLevel; duplication
// on tiny or very deep nodes buys nothing and can chain into
// pathologically deep trees (measured: depth 1358 on a 3k-face
// walls+clutter scene without these guards, 38 with them).
constexpr int kSpatialMinCount = 9;
constexpr int kSpatialMaxLevel = 40;

struct SBuilder {
    const float* tris;  // (F, 9)
    int max_leaf;
    size_t max_frags;
    std::vector<Vec3> frag_min, frag_max;
    std::vector<int> frag_face;
    std::vector<Vec3> node_min, node_max;
    std::vector<int> node_a, node_b;
    std::vector<int> out_order;
    float root_area = 0.0f;
    int depth = 0;

    float component(const Vec3& v, int axis) const {
        return axis == 0 ? v.x : axis == 1 ? v.y : v.z;
    }

    // AABB of triangle `face` clipped to the axis slab [slab_lo,
    // slab_hi], intersected with box (bmin, bmax). False if empty.
    bool clip_tri(int face, int axis, float slab_lo, float slab_hi,
                  const Vec3& bmin, const Vec3& bmax,
                  Vec3* out_min, Vec3* out_max) const {
        const float* p = tris + face * 9;
        // Sutherland-Hodgman on one coordinate; <= 9 vertices.
        float poly[2][9][3];
        int n = 3;
        int cur = 0;
        for (int v = 0; v < 3; v++)
            for (int c = 0; c < 3; c++) poly[cur][v][c] = p[v * 3 + c];
        for (int side = 0; side < 2; side++) {
            const float bound = side == 0 ? slab_lo : slab_hi;
            const float sign = side == 0 ? 1.0f : -1.0f;
            int m = 0;
            int nxt = cur ^ 1;
            for (int v = 0; v < n; v++) {
                const float* a = poly[cur][v];
                const float* b = poly[cur][(v + 1) % n];
                const float da = sign * (a[axis] - bound);
                const float db = sign * (b[axis] - bound);
                if (da >= 0.0f) {
                    for (int c = 0; c < 3; c++) poly[nxt][m][c] = a[c];
                    m++;
                }
                if ((da > 0.0f && db < 0.0f) || (da < 0.0f && db > 0.0f)) {
                    const float t = da / (da - db);
                    for (int c = 0; c < 3; c++)
                        poly[nxt][m][c] = a[c] + t * (b[c] - a[c]);
                    m++;
                }
            }
            cur = nxt;
            n = m;
            if (n < 3) return false;
        }
        Vec3 lo = {kInf, kInf, kInf}, hi = {-kInf, -kInf, -kInf};
        for (int v = 0; v < n; v++) {
            Vec3 q = {poly[cur][v][0], poly[cur][v][1], poly[cur][v][2]};
            lo = vmin(lo, q);
            hi = vmax(hi, q);
        }
        lo = vmax(lo, bmin);
        hi = vmin(hi, bmax);
        if (lo.x > hi.x || lo.y > hi.y || lo.z > hi.z) return false;
        *out_min = lo;
        *out_max = hi;
        return true;
    }

    void emit_leaf(int node, const std::vector<int>& frags) {
        const int begin = int(out_order.size());
        for (int id : frags) out_order.push_back(frag_face[id]);
        node_a[node] = begin;
        node_b[node] = int(out_order.size());
    }

    void build(int node, std::vector<int>&& frags, int level) {
        depth = std::max(depth, level);
        Vec3 lo = {kInf, kInf, kInf}, hi = {-kInf, -kInf, -kInf};
        for (int id : frags) {
            lo = vmin(lo, frag_min[id]);
            hi = vmax(hi, frag_max[id]);
        }
        node_min[node] = lo;
        node_max[node] = hi;
        const int count = int(frags.size());

        // --- object split over fragment centroids --------------------
        float best_cost = kInf, best_pos = 0.0f;
        int best_axis = -1;
        for (int axis = 0; axis < 3; axis++) {
            float cmin = kInf, cmax = -kInf;
            for (int id : frags) {
                const float c = 0.5f * (component(frag_min[id], axis)
                                        + component(frag_max[id], axis));
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
            for (int id : frags) {
                const float c = 0.5f * (component(frag_min[id], axis)
                                        + component(frag_max[id], axis));
                const int b = std::min(int(scale * (c - cmin)), kBins - 1);
                bin_min[b] = vmin(bin_min[b], frag_min[id]);
                bin_max[b] = vmax(bin_max[b], frag_max[id]);
                bin_count[b]++;
            }
            Vec3 alo = {kInf, kInf, kInf}, ahi = {-kInf, -kInf, -kInf};
            int acc = 0;
            float left_area[kBins - 1];
            int left_count[kBins - 1];
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
            const float interval = (cmax - cmin) / kBins;
            for (int i = kBins - 2; i >= 0; i--) {
                acc += bin_count[i + 1];
                if (bin_count[i + 1]) {
                    alo = vmin(alo, bin_min[i + 1]);
                    ahi = vmax(ahi, bin_max[i + 1]);
                }
                const float cost = left_count[i] * left_area[i]
                                 + acc * (acc ? half_area(alo, ahi) : 0.0f);
                if (cost < best_cost) {
                    best_cost = cost;
                    best_axis = axis;
                    best_pos = cmin + interval * (i + 1);
                }
            }
        }

        // Child overlap of the best object split (decides whether the
        // spatial sweep is worth running at all).
        float overlap = 0.0f;
        if (best_axis >= 0) {
            Vec3 llo = {kInf, kInf, kInf}, lhi = {-kInf, -kInf, -kInf};
            Vec3 rlo = {kInf, kInf, kInf}, rhi = {-kInf, -kInf, -kInf};
            for (int id : frags) {
                const float c = 0.5f * (component(frag_min[id], best_axis)
                                        + component(frag_max[id], best_axis));
                if (c < best_pos) {
                    llo = vmin(llo, frag_min[id]);
                    lhi = vmax(lhi, frag_max[id]);
                } else {
                    rlo = vmin(rlo, frag_min[id]);
                    rhi = vmax(rhi, frag_max[id]);
                }
            }
            const Vec3 olo = vmax(llo, rlo);
            const Vec3 ohi = vmin(lhi, rhi);
            if (olo.x < ohi.x && olo.y < ohi.y && olo.z < ohi.z)
                overlap = half_area(olo, ohi);
        }

        // --- spatial split sweep -------------------------------------
        float best_scost = kInf, s_pos = 0.0f;
        int s_axis = -1;
        if (count > kSpatialMinCount && level < kSpatialMaxLevel
            && (best_axis < 0 || overlap > kAlpha * root_area)) {
            for (int axis = 0; axis < 3; axis++) {
                const float nlo = component(lo, axis);
                const float extent = component(hi, axis) - nlo;
                if (extent <= 0.0f) continue;
                const float scale = kBins / extent;
                Vec3 bin_min[kBins], bin_max[kBins];
                int entry[kBins] = {0}, exit_[kBins] = {0};
                for (int b = 0; b < kBins; b++) {
                    bin_min[b] = {kInf, kInf, kInf};
                    bin_max[b] = {-kInf, -kInf, -kInf};
                }
                for (int id : frags) {
                    const float fmin = component(frag_min[id], axis);
                    const float fmax = component(frag_max[id], axis);
                    int b0 = std::min(std::max(int(scale * (fmin - nlo)), 0),
                                      kBins - 1);
                    int b1 = std::min(std::max(int(scale * (fmax - nlo)), 0),
                                      kBins - 1);
                    entry[b0]++;
                    exit_[b1]++;
                    if (b0 == b1) {
                        bin_min[b0] = vmin(bin_min[b0], frag_min[id]);
                        bin_max[b0] = vmax(bin_max[b0], frag_max[id]);
                        continue;
                    }
                    for (int b = b0; b <= b1; b++) {
                        const float blo = nlo + extent * b / kBins;
                        const float bhi = nlo + extent * (b + 1) / kBins;
                        Vec3 cmin, cmax;
                        if (clip_tri(frag_face[id], axis,
                                     std::max(blo, fmin),
                                     std::min(bhi, fmax),
                                     frag_min[id], frag_max[id],
                                     &cmin, &cmax)) {
                            bin_min[b] = vmin(bin_min[b], cmin);
                            bin_max[b] = vmax(bin_max[b], cmax);
                        }
                    }
                }
                // A fragment spanning bins b0..b1 contributes bounds
                // to EVERY bin in between, so occupancy is judged by
                // the chopped bounds, not the entry/exit counters.
                Vec3 alo = {kInf, kInf, kInf}, ahi = {-kInf, -kInf, -kInf};
                int acc = 0;
                float left_area[kBins - 1];
                int left_count[kBins - 1];
                for (int i = 0; i < kBins - 1; i++) {
                    acc += entry[i];
                    if (bin_min[i].x != kInf) {
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
                    acc += exit_[i + 1];
                    if (bin_min[i + 1].x != kInf) {
                        alo = vmin(alo, bin_min[i + 1]);
                        ahi = vmax(ahi, bin_max[i + 1]);
                    }
                    const float cost = left_count[i] * left_area[i]
                                     + acc * (acc ? half_area(alo, ahi)
                                                  : 0.0f);
                    if (cost < best_scost) {
                        best_scost = cost;
                        s_axis = axis;
                        s_pos = nlo + extent * (i + 1) / kBins;
                    }
                }
            }
        }

        const bool must_split = count > max_leaf;
        const float no_split = count * half_area(lo, hi);
        const bool spatial = s_axis >= 0 && best_scost < best_cost;
        const float winning = spatial ? best_scost : best_cost;
        if ((best_axis < 0 && s_axis < 0)
            || (winning >= no_split && !must_split)) {
            emit_leaf(node, frags);
            return;
        }

        std::vector<int> left, right;
        bool done = false;
        if (spatial) {
            for (int id : frags) {
                const float fmin = component(frag_min[id], s_axis);
                const float fmax = component(frag_max[id], s_axis);
                if (fmax <= s_pos) {
                    left.push_back(id);
                } else if (fmin >= s_pos) {
                    right.push_back(id);
                } else if (frag_face.size() < max_frags) {
                    Vec3 lmin, lmax, rmin, rmax;
                    const bool has_l = clip_tri(
                        frag_face[id], s_axis, fmin, s_pos,
                        frag_min[id], frag_max[id], &lmin, &lmax);
                    const bool has_r = clip_tri(
                        frag_face[id], s_axis, s_pos, fmax,
                        frag_min[id], frag_max[id], &rmin, &rmax);
                    if (has_l && has_r) {
                        frag_min[id] = lmin;
                        frag_max[id] = lmax;
                        left.push_back(id);
                        const int nid = int(frag_face.size());
                        frag_face.push_back(frag_face[id]);
                        frag_min.push_back(rmin);
                        frag_max.push_back(rmax);
                        right.push_back(nid);
                    } else if (has_l) {
                        frag_min[id] = lmin;
                        frag_max[id] = lmax;
                        left.push_back(id);
                    } else if (has_r) {
                        frag_min[id] = rmin;
                        frag_max[id] = rmax;
                        right.push_back(id);
                    }
                } else {
                    // Fragment budget exhausted: whole fragment to the
                    // centroid side.
                    const float c = 0.5f * (fmin + fmax);
                    (c < s_pos ? left : right).push_back(id);
                }
            }
            // Progress guarantee: a spatial split that moves nothing
            // (every fragment clipped to one side) falls back to the
            // object split.
            done = !left.empty() && !right.empty();
            if (!done) {
                left.clear();
                right.clear();
            }
        }
        if (!done && best_axis >= 0) {
            for (int id : frags) {
                const float c = 0.5f * (component(frag_min[id], best_axis)
                                        + component(frag_max[id], best_axis));
                (c < best_pos ? left : right).push_back(id);
            }
        }
        if (left.empty() || right.empty()) {
            if (!must_split) {
                emit_leaf(node, frags);
                return;
            }
            // Degenerate: median split along the largest extent.
            int axis = 0;
            Vec3 size = {hi.x - lo.x, hi.y - lo.y, hi.z - lo.z};
            if (size.y > size.x) axis = 1;
            if (component(size, 2) > component(size, axis)) axis = 2;
            std::stable_sort(frags.begin(), frags.end(),
                             [&](int p, int q) {
                                 return component(frag_min[p], axis)
                                      + component(frag_max[p], axis)
                                      < component(frag_min[q], axis)
                                      + component(frag_max[q], axis);
                             });
            const size_t half = frags.size() / 2;
            left.assign(frags.begin(), frags.begin() + half);
            right.assign(frags.begin() + half, frags.end());
        }
        frags.clear();
        frags.shrink_to_fit();

        const int lchild = int(node_a.size());
        node_a[node] = lchild;
        node_b[node] = 0;
        node_min.resize(node_min.size() + 2);
        node_max.resize(node_max.size() + 2);
        node_a.push_back(0);
        node_b.push_back(0);
        node_a.push_back(0);
        node_b.push_back(0);
        build(lchild, std::move(left), level + 1);
        build(lchild + 1, std::move(right), level + 1);
    }
};

}  // namespace

extern "C" int build_sbvh(const float* tris, int face_count,
                          int max_leaf_faces, int max_frag_count,
                          float* out_node_min, float* out_node_max,
                          int* out_node_a, int* out_node_b,
                          int* out_face_order, int* out_node_count,
                          int* out_depth, int* out_frag_count) {
    SBuilder b;
    b.tris = tris;
    b.max_leaf = max_leaf_faces;
    b.max_frags = size_t(max_frag_count);
    b.frag_min.resize(face_count);
    b.frag_max.resize(face_count);
    b.frag_face.resize(face_count);
    std::vector<int> all(face_count);
    for (int f = 0; f < face_count; f++) {
        const float* p = tris + f * 9;
        Vec3 v0 = {p[0], p[1], p[2]};
        Vec3 v1 = {p[3], p[4], p[5]};
        Vec3 v2 = {p[6], p[7], p[8]};
        b.frag_min[f] = vmin(v0, vmin(v1, v2));
        b.frag_max[f] = vmax(v0, vmax(v1, v2));
        b.frag_face[f] = f;
        all[f] = f;
    }
    b.node_min.resize(1);
    b.node_max.resize(1);
    b.node_a.push_back(0);
    b.node_b.push_back(face_count);
    if (face_count > 0) {
        Vec3 lo = {kInf, kInf, kInf}, hi = {-kInf, -kInf, -kInf};
        for (int f = 0; f < face_count; f++) {
            lo = vmin(lo, b.frag_min[f]);
            hi = vmax(hi, b.frag_max[f]);
        }
        b.root_area = half_area(lo, hi);
        b.build(0, std::move(all), 0);
    }

    const int n = int(b.node_a.size());
    if (n > 2 * max_frag_count || int(b.out_order.size()) > max_frag_count)
        return 1;  // caller's buffers would overflow (cannot happen
                   // while leaves hold >= 1 fragment and the budget
                   // bounds the pool, but guard anyway)
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
    std::memcpy(out_face_order, b.out_order.data(),
                b.out_order.size() * sizeof(int));
    *out_node_count = n;
    *out_depth = b.depth;
    *out_frag_count = int(b.out_order.size());
    return 0;
}

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
