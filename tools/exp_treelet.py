"""Dynamic treelet re-binning: the experiment the oracle does NOT bound.

VERDICT round-4 weak-item 2: exp_oracle_key.py bounded STATIC
destination keys (sorting rays once, at round start, by final hit
leaf) and found them ~2x worse than the production frustum key -- but
a treelet queue re-bins rays DYNAMICALLY at treelet boundaries:
packets share their current subtree and never sweep a frustum on the
way to a destination. README round-4 presented that class as refuted
by the oracle; this experiment actually runs it.

Two-pass scheme simulated here (faithful packet semantics, numpy, on
REAL mid-flight rays captured by tools/capture_state.py):

  Phase A: production-sorted packets traverse the TOP of the tree
    (root down to a treelet frontier: maximal subtrees of <= Q node
    rows). Frontier children are not pushed; instead every ray whose
    OWN slab test passes dumps a continuation (ray, treelet).
  Re-bin: continuations sorted by (treelet, production ray key) and
    packed into fresh 3072-ray packets -- treelet-pure except at
    group boundaries, the dynamic analog of destination binning.
  Phase B: each packet traverses only its rays' treelets; rays of
    another treelet are masked (t = -inf) during a foreign treelet's
    traversal, as a real kernel would mask lanes.

Pops are counted with the kernel's cost model (one pop = one packet's
node visit, interior or leaf; leaf rows beyond the first cost
LEAF_ROW_COST). The simulator is validated against the on-chip
stats-mode counters for the production ordering (captured in the same
npz) before any comparison is trusted.

Cost model for the re-bin data motion (the scheme's tax): two packed
row gathers (7 fwd + 5 inv) over N_cont lanes at the measured
~5-18 ns/row-gather-index, plus one argsort -- reported alongside the
pop delta so the verdict is end-to-end, not kernel-only.

Run AFTER tools/capture_state.py; this tool itself is CPU-only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np

from path_tracer_tpu.scene.bvh8 import (
    BIG, GEOM5_STRIDE, LEAF_ROW_LIMIT, META_LANE, PERM_LANE)

INST_BASE = 1 << 22
PACKET = 3072
LEAF_ROW_COST = 0.5
# v6 kernel pop-cost model (tools/exp_pop_cost.py, README): ~455 cy
# fixed per pop; extra leaf rows ride at LEAF_ROW_COST of a pop.
CY_PER_POP = 455.0
CLOCK_GHZ = 0.94
# Packed row-gather cost per index over an under-cliff operand
# (tools/exp_waves3.py: ~10 ms net per (N, 8) gather at 2M lanes).
NS_PER_GATHER_INDEX = 5.0


class PacketSim:
    """Faithful numpy replica of the v6 packet traversal's pop count."""

    def __init__(self, nodes, tris, inst_rows, tlas_rows):
        self.nodes = nodes
        self.tris = tris
        self.inst_rows = inst_rows
        self.tlas_rows = int(tlas_rows)
        m = nodes[:, META_LANE:META_LANE + 8]
        self.meta = m
        self.is_leaf = m < 0

    def _slab(self, row, o, d, t):
        inv = 1.0 / np.where(np.abs(d) < 1e-8,
                             np.where(d >= 0, 1e-8, -1e-8), d)
        lo = row[0:24].reshape(3, 8)
        hi = row[24:48].reshape(3, 8)
        t0 = (lo[:, None, :] - o[:, :, None]) * inv[:, :, None]
        t1 = (hi[:, None, :] - o[:, :, None]) * inv[:, :, None]
        entry = np.minimum(t0, t1).max(axis=0)
        exit_ = np.maximum(t0, t1).min(axis=0)
        ok = (exit_ >= entry) & (exit_ > 0.0) & (entry < t[:, None])
        return ok, entry

    def _leaf_rows(self, meta):
        u = -meta
        count = int(u // LEAF_ROW_LIMIT)
        row = int(u % LEAF_ROW_LIMIT)
        return row, count, -(-count // 8)

    def _leaf_test(self, meta, o, d, t):
        row, count, nrows = self._leaf_rows(meta)
        best = t.copy()
        for r in range(nrows):
            lane = self.tris[row + r]
            for k in range(8):
                b = GEOM5_STRIDE * k
                n_ = lane[b:b + 3]
                d0 = lane[b + 3]
                gu, cu = lane[b + 4:b + 7], lane[b + 7]
                gv, cv = lane[b + 8:b + 11], lane[b + 11]
                nd = n_ @ d
                no = n_ @ o
                with np.errstate(divide='ignore', invalid='ignore'):
                    ft = (d0 - no) / nd
                    h = o + ft * d
                    fu = gu @ h + cu
                    fv = gv @ h + cv
                ok = (fu >= 0) & (fv >= 0) & (fu + fv <= 1.0) \
                    & (ft >= 0) & (ft < best)
                best = np.where(ok, ft, best)
        return best, nrows

    def _perm_for(self, widx, d):
        fwd = d.sum(axis=1) >= 0
        o = (int(~fwd[0]) << 2) | (int(~fwd[1]) << 1) | int(~fwd[2])
        packed = int(self.nodes[widx, PERM_LANE + o])
        return [(packed >> (3 * i)) & 7 for i in range(8)]

    def traverse(self, o, d, t, roots, mask=None, stats=None):
        """One packet against the given root entries.

        o/d: (3, R); t: (R,) updated in place semantics (returned).
        roots: stack seed (deepest pushed first is popped last).
        mask: optional (R,) bool -- inactive rays' t rides as -inf for
        box tests (they never extend the packet) but their real t is
        preserved. stats: dict accumulating pop classes.
        """
        t = t.copy()
        teff = t if mask is None else np.where(mask, t, -np.inf)
        cur_o, cur_d = o, d
        world = (o, d)
        stack = list(roots)
        while stack:
            v = stack.pop()
            if v >= INST_BASE:
                stats['inst'] += 1
                i = v - INST_BASE
                r = self.inst_rows[i]
                m = r[0:12].reshape(3, 4)
                cur_o = m[:, :3] @ world[0] + m[:, 3:4]
                cur_d = m[:, :3] @ world[1]
                stack.append(int(r[12]))
                continue
            if v >= 0:
                stats['interior'] += 1
                use_o, use_d = (world if v < self.tlas_rows
                                else (cur_o, cur_d))
                ok, entry = self._slab(self.nodes[v], use_o, use_d, teff)
                hit_child = ok.any(axis=0)
                perm = self._perm_for(v, use_d)
                for c in perm:
                    m = self.meta[v, c]
                    if hit_child[c] and m != 0:
                        stack.append(int(m) if m >= 0
                                     else -int(-m))
            else:
                stats['leaf'] += 1
                best, nrows = self._leaf_test(float(v), cur_o, cur_d, teff)
                upd = best < teff
                t = np.where(upd, best, t)
                teff = np.where(upd, best, teff)
                stats['leaf_rows'] += nrows
        return t


def subtree_rows(sim, root):
    """Node-row count of each mesh subtree (for the frontier cut)."""
    sizes = {}

    def walk(v):
        if v in sizes:
            return sizes[v]
        s = 1
        for c in range(8):
            m = sim.meta[v, c]
            if m > 0:
                s += walk(int(m))
        sizes[v] = s
        return s

    walk(root)
    return sizes


def cut_frontier(sim, root, budget):
    """Maximal subtrees of <= budget rows; returns (frontier set,
    frontier roots list)."""
    sizes = subtree_rows(sim, root)
    frontier = set()

    def walk(v):
        if sizes[v] <= budget and v != root:
            frontier.add(v)
            return
        for c in range(8):
            m = sim.meta[v, c]
            if m > 0:
                walk(int(m))

    walk(root)
    return frontier


def main():
    data = np.load('artifacts/state_viking.npz')
    o_all = data['origin']
    d_all = data['direction']
    key = data['key']
    n = o_all.shape[1]
    order = np.argsort(key, kind='stable')
    o_all, d_all = o_all[:, order], d_all[:, order]
    sim = PacketSim(data['nodes'], data['tris'], data['inst_rows'],
                    data['tlas_rows'])
    lanes = int(os.environ.get('PT_TREELET_LANES', n))
    lanes -= lanes % PACKET
    packets = lanes // PACKET
    # Subsample PACKETS uniformly across the sorted order, not a head
    # slice: pops/packet vary strongly along the key range (the head of
    # the sort is a dense bounce cluster -- a 24-packet head slice
    # overestimated whole-wavefront pops 2.8x vs the chip counters), so
    # stride sampling is what makes the x(n/lanes) validation against
    # the on-chip totals meaningful.
    if lanes < n:
        total_packets = n // PACKET
        picks = np.linspace(0, total_packets - 1, packets).round()
        picks = np.unique(picks.astype(np.int64))
        packets = len(picks)
        lanes = packets * PACKET
        idx = (picks[:, None] * PACKET
               + np.arange(PACKET)[None, :]).reshape(-1)
        o_all, d_all = o_all[:, idx], d_all[:, idx]
    else:
        o_all, d_all = o_all[:, :lanes], d_all[:, :lanes]
    print(f'# {lanes} lanes ({packets} packets); on-chip sorted pops: '
          f'interior {int(data["pops_interior"])} leaf '
          f'{int(data["pops_leaf"])} at {n} lanes', file=sys.stderr)

    # --- Production baseline (validates the simulator) -------------
    t0 = time.time()
    stats = dict(interior=0, leaf=0, inst=0, leaf_rows=0)
    t_out = np.full(lanes, 1.0e7, np.float32)
    for p in range(packets):
        sl = slice(p * PACKET, (p + 1) * PACKET)
        t_out[sl] = sim.traverse(o_all[:, sl], d_all[:, sl], t_out[sl],
                                 [0], stats=stats)
    pops = stats['interior'] + stats['leaf']
    scale = n / lanes
    print(f'# production sim: interior {stats["interior"]} leaf '
          f'{stats["leaf"]} (x{scale:.1f} -> '
          f'{stats["interior"]*scale:.0f}/{stats["leaf"]*scale:.0f} '
          f'vs chip) inst {stats["inst"]} [{time.time()-t0:.0f}s]',
          file=sys.stderr)
    prod_cost = (pops + LEAF_ROW_COST * max(
        stats['leaf_rows'] - stats['leaf'], 0)) * CY_PER_POP
    prod_ms = prod_cost / CLOCK_GHZ / 1e6

    # Mesh root + object transform (single instance).
    root = int(sim.inst_rows[0, 12])
    m = sim.inst_rows[0, 0:12].reshape(3, 4)
    oo_all = m[:, :3] @ o_all + m[:, 3:4]
    od_all = m[:, :3] @ d_all

    for budget in (int(x) for x in
                   os.environ.get('PT_TREELET_Q', '64,160').split(',')):
        frontier = cut_frontier(sim, root, budget)
        t0 = time.time()
        # Phase A: top-tree traversal, dumping per-ray continuations.
        stats_a = dict(interior=0, leaf=0, inst=0, leaf_rows=0)
        t_a = np.full(lanes, 1.0e7, np.float32)
        conts = []          # (treelet, ray_index) continuation dumps

        def traverse_top(p):
            sl = slice(p * PACKET, (p + 1) * PACKET)
            o, d = oo_all[:, sl], od_all[:, sl]
            t = t_a[sl].copy()
            stack = [root]
            while stack:
                v = stack.pop()
                if v >= 0:
                    stats_a['interior'] += 1
                    ok, entry = sim._slab(sim.nodes[v], o, d, t)
                    hit_child = ok.any(axis=0)
                    for c in sim._perm_for(v, d):
                        mt = sim.meta[v, c]
                        if not hit_child[c] or mt == 0:
                            continue
                        if mt > 0 and int(mt) in frontier:
                            rays = np.nonzero(ok[:, c])[0] + p * PACKET
                            conts.append((int(mt), rays))
                        elif mt > 0:
                            stack.append(int(mt))
                        else:
                            stack.append(-int(-mt))
                else:
                    stats_a['leaf'] += 1
                    best, nrows = sim._leaf_test(float(v), o, d, t)
                    t = np.minimum(t, best)
                    stats_a['leaf_rows'] += nrows
            t_a[sl] = t

        for p in range(packets):
            traverse_top(p)

        # Re-bin: sort continuations by (treelet, ray production rank)
        # and pack into fresh packets.
        if not conts:
            print(f'Q={budget}: no frontier continuations (budget covers '
                  f'the whole tree?)', flush=True)
            continue
        tl = np.concatenate([np.full(len(r), tid, np.int64)
                             for tid, r in conts])
        rid = np.concatenate([r for _, r in conts])
        bin_order = np.lexsort((rid, tl))
        tl, rid = tl[bin_order], rid[bin_order]
        n_cont = len(rid)

        # Phase B: treelet-grouped packets; within one packet, each
        # treelet's segment traverses with the other lanes masked.
        stats_b = dict(interior=0, leaf=0, inst=0, leaf_rows=0)
        t_b = t_a.copy()
        for p0 in range(0, n_cont, PACKET):
            seg_t = tl[p0:p0 + PACKET]
            seg_r = rid[p0:p0 + PACKET]
            for tid in np.unique(seg_t):
                srays = seg_r[seg_t == tid]
                o = oo_all[:, srays]
                d = od_all[:, srays]
                # Packet-pop accounting is per packet-node visit; the
                # masked foreign lanes change nothing here because the
                # sim only traverses the group's own treelet.
                t_new = sim.traverse(o, d, t_b[srays], [int(tid)],
                                     stats=stats_b)
                t_b[srays] = np.minimum(t_b[srays], t_new)

        pops_t = (stats_a['interior'] + stats_a['leaf']
                  + stats_b['interior'] + stats_b['leaf'])
        rows_extra = (stats_a['leaf_rows'] - stats_a['leaf']
                      + stats_b['leaf_rows'] - stats_b['leaf'])
        t_cost = (pops_t + LEAF_ROW_COST * max(rows_extra, 0)) * CY_PER_POP
        t_ms = t_cost / CLOCK_GHZ / 1e6
        # Re-bin tax: 12 row-gathers over n_cont lanes + argsort.
        motion_ms = n_cont * 12 * NS_PER_GATHER_INDEX / 1e6
        agree = float(np.mean(np.isclose(t_b, t_out, rtol=1e-4,
                                         atol=1e-5)))
        print(f'Q={budget:4d} frontier {len(frontier):4d} treelets  '
              f'conts/ray {n_cont/lanes:5.2f}  '
              f'popsA {stats_a["interior"]+stats_a["leaf"]:7d}  '
              f'popsB {stats_b["interior"]+stats_b["leaf"]:7d}  '
              f'total {pops_t:7d} vs prod {pops:7d} '
              f'({pops_t/pops:5.2f}x)  model ms {t_ms:6.1f}+'
              f'{motion_ms:5.1f} motion vs {prod_ms:6.1f}  '
              f't agree {agree:.5f}  [{time.time()-t0:.0f}s]',
              flush=True)


if __name__ == '__main__':
    main()
