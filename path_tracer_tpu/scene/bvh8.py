"""Wide (8-ary) BVH over world-space triangles for the packet kernel.

The reference traverses a binary mesh BVH per SIMT thread
(/root/reference/src/scene/scene.glsl.inc:336-399) under a TLAS of
instances (:468-520). The TPU packet kernel pays a fixed scalar/fetch
cost per node *pop*, so the tree is reshaped for pop economy instead:

  * Instancing is flattened at compile time: every mesh instance's
    triangles are pre-transformed to world space and one BVH covers the
    whole scene (the TLAS's culling role is subsumed by the top of this
    tree, and per-instance ray transforms disappear from the kernel).
  * The binary SAH tree (native/bvh_builder.cpp) is collapsed into
    8-wide nodes: ~3x fewer pops, and one 128-lane node row holds all
    eight child boxes so a single fetch feeds the whole pop.
  * Leaves are 4-triangle blocks aligned to 128-lane rows, so a leaf
    pop is also a single row fetch. Subtrees of <= 4 faces collapse
    into one leaf (the binary builder's ~1.1-face leaves are far too
    fine for packet traversal, where all 1024 lanes test every
    triangle anyway).

Node row layout (one float32 row of 128 lanes per wide node):
  lanes  0..47  child AABBs, coordinate-major: lo_x[0..7], lo_y[0..7],
                lo_z[0..7], hi_x[0..7], hi_y[0..7], hi_z[0..7]
                (empty child slots get an inverted box +BIG/-BIG)
  lanes 48..55  per-child meta, stored as exact-integer float32:
                >= 0: wide index of an interior child
                <  0: -(tri_row * LEAF_ENC + face_count) for a leaf
                child of up to LEAF_MAX faces starting at row tri_row
  lane  64      traversal-order axis (0/1/2): children are pre-sorted
                by centroid along this axis at build time; the kernel
                picks push direction from the packet's mean direction
                sign (near-first traversal without per-ray sorting).

Triangle row layout (one float32 row per 4-triangle block; triangle k
at lane base 32*k):
  +0..8   p0 p1 p2 (world-space positions)
  +9..17  n0 n1 n2 (world-space unit vertex normals)
  +18..23 uv0 uv1 uv2
  +24     shape index (exact-integer float32)
Padding slots are degenerate (all zeros -> Moller-Trumbore det == 0).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np

BIG = 1.0e9            # box-miss sentinel; finite so slab math never NaNs
WIDE_WIDTH = 8
TRI_STRIDE = 32
TRIS_PER_ROW = 4
LEAF_MAX = 8           # triangles per leaf (LEAF_MAX/TRIS_PER_ROW rows)
LEAF_ENC = 32          # leaf meta = -(tri_row * LEAF_ENC + count)
META_LANE = 48
AXIS_LANE = 64


@dataclass
class WideBvh:
    nodes: np.ndarray      # (W, 128) float32
    tris: np.ndarray       # (R, 128) float32
    face_map: np.ndarray   # (R*4,) int32 -> input face index, -1 = padding
    num_nodes: int
    num_leaves: int


# --- Transposed (triangle-on-sublane) leaf layout for the v4 kernel -----
#
# The v4 kernel (ops/trace_wide_t.py) traces 128-ray sub-packets with
# triangles riding the SUBLANE axis: one (8, 128) op tests all 8 leaf
# triangles against all 128 rays. That needs leaf data laid out so the
# outer-product redistribution (lane i -> broadcast row i) yields
# (8, 128) tiles whose row k is triangle k's constant. Two rows per
# leaf:
#
# Geometry row (lanes, 8 consecutive lanes per field, one per tri):
#    0..23  p0.xyz      24..47 e1.xyz (p1-p0)    48..71 e2.xyz (p2-p0)
#   72..79  shape index 80..87 face slot (index into face_map)
# Attribute row:
#    0..71  n0.xyz n1.xyz n2.xyz   72..119 uv0.uv uv1.uv uv2.uv
#
# Leaf meta in the transposed nodes table encodes the ROW PAIR:
# -(pair_index * LEAF_ENC + count); geometry row = 2*pair_index.
GEOM_P0, GEOM_E1, GEOM_E2, GEOM_SHAPE, GEOM_FACE = 0, 24, 48, 72, 80
ATTR_N0, ATTR_N1, ATTR_N2, ATTR_UV = 0, 24, 48, 72


# --- Geometry-only leaf layout for the v5 kernel ------------------------
#
# Measured on-chip (tools/exp_pop_cost.py): the dominant per-pop cost is
# the lane->broadcast redistribution, so the v5 kernel (a) redistributes
# with static single-lane splats instead of the K=1 contraction and
# (b) keeps only what Moller-Trumbore needs in the hot table -- one
# 128-lane row holds a whole 8-triangle leaf (16-lane stride per tri:
# p0.xyz e1.xyz e2.xyz shape), one fetch per leaf pop. Vertex
# attributes (normals, uvs) move to a cold (slots, 16) side table in
# HBM, gathered ONCE per trace for the winning faces instead of being
# redistributed on every leaf pop:
#   [n0.xyz n1.xyz n2.xyz uv0.uv uv1.uv uv2.uv pad] per face slot.
GEOM5_STRIDE = 16
ATTR5_WIDTH = 16


def pack_wide_geom(wide: 'WideBvh',
                   tri_positions, tri_normals, tri_uvs, tri_shape):
    """Derive the v5 tables from a packed WideBvh.

    tri_* are in the CALLER's face order (wide.face_map indexes it).
    Returns (nodes_g, tris_g, attrs, face_map_g):
      nodes_g  (W, 128)  wide.nodes with leaf metas re-encoded
      tris_g   (L, 128)  one geometry row per leaf
      attrs    (L*8, 16) per-face-slot attribute rows (HBM side table)
      face_map_g (L*8,)  face slot -> caller face index (-1 padding)
    """
    tri_positions = np.asarray(tri_positions, np.float32)
    tri_normals = np.asarray(tri_normals, np.float32)
    tri_uvs = np.asarray(tri_uvs, np.float32)
    tri_shape = np.asarray(tri_shape, np.float32)

    nodes_g = wide.nodes.copy()
    metas = nodes_g[:, META_LANE:META_LANE + WIDE_WIDTH]
    leaf_mask = metas < 0.0
    u = -metas[leaf_mask]
    old_rows = (u // LEAF_ENC).astype(np.int64)
    counts = (u % LEAF_ENC).astype(np.int64)

    leaves = len(old_rows)
    tris_g = np.zeros((max(leaves, 1), 128), np.float32)
    attrs = np.zeros((max(leaves, 1) * 8, ATTR5_WIDTH), np.float32)
    face_map_g = np.full(max(leaves, 1) * 8, -1, np.int64)
    new_metas = np.empty(leaves, np.float32)
    for leaf, (row, count) in enumerate(zip(old_rows, counts)):
        g = tris_g[leaf]
        for k in range(count):
            src = wide.face_map[row * TRIS_PER_ROW + k]
            if src < 0:
                continue
            b = GEOM5_STRIDE * k
            p0, p1, p2 = tri_positions[src]
            g[b:b + 3] = p0
            g[b + 3:b + 6] = p1 - p0
            g[b + 6:b + 9] = p2 - p0
            g[b + 9] = tri_shape[src]
            slot = leaf * 8 + k
            attrs[slot, 0:9] = tri_normals[src].reshape(9)
            attrs[slot, 9:15] = tri_uvs[src].reshape(6)
            face_map_g[slot] = src
        new_metas[leaf] = np.float32(-(leaf * LEAF_ENC + count))

    metas[leaf_mask] = new_metas
    nodes_g[:, META_LANE:META_LANE + WIDE_WIDTH] = metas
    return nodes_g, tris_g, attrs, face_map_g.astype(np.int32)


def transpose_wide(wide: 'WideBvh',
                   tri_positions, tri_normals, tri_uvs, tri_shape):
    """Derive the v4 (transposed-leaf) tables from a packed WideBvh.

    tri_* are in the CALLER's face order (wide.face_map indexes it).
    Returns (nodes_t, tris_t): nodes_t is wide.nodes with leaf metas
    re-encoded for the two-row-per-leaf table; tris_t is (2*L, 128).
    """
    tri_positions = np.asarray(tri_positions, np.float32)
    tri_normals = np.asarray(tri_normals, np.float32)
    tri_uvs = np.asarray(tri_uvs, np.float32)
    tri_shape = np.asarray(tri_shape, np.float32)

    nodes_t = wide.nodes.copy()
    metas = nodes_t[:, META_LANE:META_LANE + WIDE_WIDTH]
    leaf_mask = metas < 0.0
    u = -metas[leaf_mask]
    old_rows = (u // LEAF_ENC).astype(np.int64)
    counts = (u % LEAF_ENC).astype(np.int64)

    pairs = len(old_rows)
    tris_t = np.zeros((max(2 * pairs, 2), 128), np.float32)
    new_metas = np.empty(pairs, np.float32)
    for pair, (row, count) in enumerate(zip(old_rows, counts)):
        g = tris_t[2 * pair]
        a = tris_t[2 * pair + 1]
        for k in range(count):
            slot = row * TRIS_PER_ROW + k
            src = wide.face_map[slot]
            if src < 0:
                continue
            p0, p1, p2 = tri_positions[src]
            g[GEOM_P0 + k:GEOM_P0 + 24:8] = p0
            g[GEOM_E1 + k:GEOM_E1 + 24:8] = p1 - p0
            g[GEOM_E2 + k:GEOM_E2 + 24:8] = p2 - p0
            g[GEOM_SHAPE + k] = tri_shape[src]
            g[GEOM_FACE + k] = np.float32(slot)
            n0, n1, n2 = tri_normals[src]
            a[ATTR_N0 + k:ATTR_N0 + 24:8] = n0
            a[ATTR_N1 + k:ATTR_N1 + 24:8] = n1
            a[ATTR_N2 + k:ATTR_N2 + 24:8] = n2
            for v in range(3):
                a[ATTR_UV + 16 * v + k] = tri_uvs[src, v, 0]
                a[ATTR_UV + 16 * v + 8 + k] = tri_uvs[src, v, 1]
        new_metas[pair] = np.float32(-(pair * LEAF_ENC + count))

    metas[leaf_mask] = new_metas
    nodes_t[:, META_LANE:META_LANE + WIDE_WIDTH] = metas
    return nodes_t, tris_t


def _subtree_face_ranges(a, b):
    """Per-node (face_lo, face_hi) of the contiguous face range each
    subtree spans. Children are allocated after their parent by both
    builders, so one reverse sweep suffices."""
    n = len(a)
    is_leaf = b > 0
    lo = np.zeros(n, np.int64)
    hi = np.zeros(n, np.int64)
    for i in range(n - 1, -1, -1):
        if is_leaf[i]:
            lo[i], hi[i] = a[i], b[i]
        else:
            lo[i] = min(lo[a[i]], lo[a[i] + 1])
            hi[i] = max(hi[a[i]], hi[a[i] + 1])
    return lo, hi


def collapse_bvh2(node_min, node_max, a, b, leaf_max=LEAF_MAX):
    """Collapse a binary BVH into wide-node records.

    Greedy top-down: each wide node starts from one binary subtree root
    and repeatedly expands its largest-surface-area member until it has
    8 members or none are expandable. Members whose subtree spans
    <= leaf_max contiguous faces become leaf children; the rest become
    interior children (recursively collapsed).

    Returns (children, axes) where children[w] is a list of
    ('leaf', face_lo, count) / ('node', wide_index) entries sorted by
    centroid along axes[w].
    """
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    a = np.asarray(a)
    b = np.asarray(b)
    flo, fhi = _subtree_face_ranges(a, b)
    count = fhi - flo

    size = np.maximum(node_max - node_min, 0.0)
    area = (size[:, 0] * size[:, 1] + size[:, 1] * size[:, 2]
            + size[:, 2] * size[:, 0])

    def leafable(n):
        return count[n] <= leaf_max

    children, axes = [], []
    queue = deque()

    def alloc(n):
        idx = len(children)
        children.append(None)
        axes.append(0)
        queue.append((idx, n))
        return idx

    if leafable(0):
        children.append([('leaf', int(flo[0]), int(count[0]), 0)]
                        if count[0] > 0 else [])
        axes.append(0)
        return children, axes

    alloc(0)
    while queue:
        w, root = queue.popleft()
        members = [root]
        while len(members) < WIDE_WIDTH:
            cands = [m for m in members if not leafable(m)]
            if not cands:
                break
            pick = max(cands, key=lambda m: area[m])
            members.remove(pick)
            members.extend((int(a[pick]), int(a[pick]) + 1))

        cent = 0.5 * (node_min[members] + node_max[members])
        axis = int(np.argmax(cent.max(axis=0) - cent.min(axis=0)))
        members.sort(key=lambda m: 0.5 * (node_min[m][axis] + node_max[m][axis]))
        entries = []
        for m in members:
            if leafable(m):
                entries.append(('leaf', int(flo[m]), int(count[m]), m))
            else:
                entries.append(('node', alloc(m), 0, m))
        children[w] = entries
        axes[w] = axis
    return children, axes


def pack_wide(children, axes, node_min, node_max,
              tri_positions, tri_normals, tri_uvs, tri_shape):
    """Pack collapsed wide nodes + re-blocked triangles into kernel rows.

    tri_* are in the binary BVH's permuted face order (the order the
    leaf face ranges index). Leaf faces are copied into fresh 4-aligned
    blocks so a leaf is always one row fetch.
    """
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    w = len(children)
    nodes = np.zeros((w, 128), np.float32)
    nodes[:, 0:24] = BIG          # lo of empty slots
    nodes[:, 24:48] = -BIG        # hi of empty slots
    nodes[:, AXIS_LANE] = np.asarray(axes, np.float32)

    face_map = []
    num_leaves = 0
    for widx, entries in enumerate(children):
        for c, entry in enumerate(entries):
            kind, p0, p1, m = entry
            if kind == 'leaf':
                num_leaves += 1
                tri_row = len(face_map) // TRIS_PER_ROW
                face_map.extend(range(p0, p0 + p1))
                face_map.extend([-1] * (-len(face_map) % TRIS_PER_ROW))
                meta = -(tri_row * LEAF_ENC + p1)
            else:
                meta = p0
            lo, hi = node_min[m], node_max[m]
            for ax in range(3):
                nodes[widx, 8 * ax + c] = lo[ax]
                nodes[widx, 24 + 8 * ax + c] = hi[ax]
            nodes[widx, META_LANE + c] = np.float32(meta)

    if not face_map:
        face_map = [-1] * TRIS_PER_ROW
    face_map = np.asarray(face_map, np.int32)
    rows = len(face_map) // TRIS_PER_ROW
    tris = np.zeros((rows, 128), np.float32)

    tri_positions = np.asarray(tri_positions, np.float32)  # (F, 3, 3)
    tri_normals = np.asarray(tri_normals, np.float32)      # (F, 3, 3)
    tri_uvs = np.asarray(tri_uvs, np.float32)              # (F, 3, 2)
    tri_shape = np.asarray(tri_shape, np.float32)          # (F,)

    valid = face_map >= 0
    src = face_map[valid]
    slot = np.nonzero(valid)[0]
    r = slot // TRIS_PER_ROW
    base = (slot % TRIS_PER_ROW) * TRI_STRIDE
    for v in range(3):
        for c in range(3):
            tris[r, base + 3 * v + c] = tri_positions[src, v, c]
            tris[r, base + 9 + 3 * v + c] = tri_normals[src, v, c]
    for v in range(3):
        for c in range(2):
            tris[r, base + 18 + 2 * v + c] = tri_uvs[src, v, c]
    tris[r, base + 24] = tri_shape[src]

    return WideBvh(nodes=nodes, tris=tris, face_map=face_map,
                   num_nodes=w, num_leaves=num_leaves)


def build_wide_bvh(tri_positions, tri_normals, tri_uvs, tri_shape,
                   leaf_max=LEAF_MAX):
    """World-space triangles -> packed wide BVH tables.

    tri_positions/tri_normals: (F, 3 verts, 3); tri_uvs: (F, 3, 2);
    tri_shape: (F,) shape index per face.
    """
    from .bvh import build_bvh_cached

    tri_positions = np.asarray(tri_positions, np.float32)
    bvh = build_bvh_cached(tri_positions)
    order = bvh.face_order
    children, axes = collapse_bvh2(bvh.node_min, bvh.node_max, bvh.a, bvh.b,
                                   leaf_max=leaf_max)
    wide = pack_wide(children, axes, bvh.node_min, bvh.node_max,
                     tri_positions[order],
                     np.asarray(tri_normals, np.float32)[order],
                     np.asarray(tri_uvs, np.float32)[order],
                     np.asarray(tri_shape, np.float32)[order])
    # Remap face_map back to the caller's face order for testability.
    valid = wide.face_map >= 0
    remapped = wide.face_map.copy()
    remapped[valid] = np.asarray(order, np.int64)[wide.face_map[valid]]
    wide.face_map = remapped
    return wide
