"""Introspection tooling: spectrum curves and BVH structure dumps.

The reference editor has a live parametric-spectrum plot window
(/root/reference/src/application/imgui_main.cpp:901-924, graphing the
Jakob-Hanika uplift of any RGB color over 360-830 nm) and a
commented-out TLAS tree dump (PrintShapeNode, scene.cpp:1095-1113).
These are their headless equivalents, also reachable from the CLI:

    python -m path_tracer_tpu spectrum 0.2 0.5 0.8 [--png plot.png]
    python -m path_tracer_tpu bvhdump scene.json [--depth 4]
"""

from __future__ import annotations

import numpy as np

from ..core.constants import CIE_LAMBDA_MAX, CIE_LAMBDA_MIN


def spectrum_curve(rgb, samples=128):
    """The uplifted reflectance spectrum of an sRGB color.

    Returns (wavelengths_nm (S,), reflectance (S,)) -- the curve the
    reference plots (imgui_main.cpp:912-921 samples the parametric
    spectrum across the CIE range).
    """
    from ..core.spectrum import sample_parametric_spectrum
    from ..core.uplift import rgb_to_coefficients

    beta = np.asarray(rgb_to_coefficients(np.asarray(rgb, np.float32)))
    lam_nm = np.linspace(CIE_LAMBDA_MIN, CIE_LAMBDA_MAX, samples)
    values = np.asarray(sample_parametric_spectrum(
        beta.reshape(3, 1), lam_nm.astype(np.float32)[None, :]))[0]
    return lam_nm, values


def ascii_plot(xs, ys, width=72, height=16, label=''):
    """Terminal plot of a curve (y clipped to [0, 1])."""
    ys = np.clip(np.asarray(ys, np.float64), 0.0, 1.0)
    cols = np.linspace(0, len(xs) - 1, width).astype(int)
    rows = (ys[cols] * (height - 1) + 0.5).astype(int)
    grid = [[' '] * width for _ in range(height)]
    for c, r in enumerate(rows):
        grid[height - 1 - r][c] = '*'
    lines = [f'{label}'] if label else []
    lines.append('1.0 ' + '-' * width)
    lines += ['    |' + ''.join(row) for row in grid]
    lines.append('0.0 ' + '-' * width)
    lines.append(f'    {xs[0]:.0f} nm{"":{width - 12}}{xs[-1]:.0f} nm')
    return '\n'.join(lines)


def spectrum_report(rgb):
    """Round-trip check: RGB -> spectrum -> observed-under-D65 RGB."""
    from ..core.spectrum import (
        observe_parametric_spectrum_under_d65,
        xyz_to_srgb,
    )
    from ..core.uplift import rgb_to_coefficients

    rgb = np.asarray(rgb, np.float32)
    beta = np.asarray(rgb_to_coefficients(rgb))
    spectrum4 = np.concatenate([beta, [1.0]]).astype(np.float32)
    observed = np.asarray(xyz_to_srgb(observe_parametric_spectrum_under_d65(
        spectrum4[:, None])))[:, 0]
    lam, values = spectrum_curve(rgb)
    return dict(rgb=rgb.tolist(), beta=beta.tolist(),
                observed_rgb=observed.tolist(),
                roundtrip_error=float(np.abs(observed - rgb).max()),
                lambda_nm=lam, reflectance=values)


def plot_spectrum_png(rgb, path, samples=256):
    """Write a simple PNG line plot of the uplifted spectrum."""
    from .image import save_png

    lam, values = spectrum_curve(rgb, samples)
    w, h = samples, 160
    img = np.full((h, w, 3), 0.08, np.float32)
    ys = np.clip(values, 0.0, 1.0)
    for x in range(w):
        y = int((1.0 - ys[x]) * (h - 1))
        img[y, x] = [1.0, 1.0, 1.0]
        img[y:, x] = np.maximum(img[y:, x], np.asarray(rgb, np.float32) * 0.35)
    save_png(path, img)


def _packet_nodes(packed):
    """The node table the packet kernel actually traverses: the v6
    two-level table when built (TLAS + object-space mesh trees), else
    the v5 world-flattened one."""
    inst = np.asarray(packed.inst_nodes)
    if inst.shape[0] > 1:
        return inst
    return np.asarray(packed.wide_nodes_g)


def dump_wide_bvh(packed, max_depth=None, file=None):
    """Textual dump of the packet-kernel BVH (PrintShapeNode analog).

    Prints one line per wide node with bounds, child kinds and leaf
    sizes; the tree these rows describe is what the packet kernel
    traverses (ops/trace_inst.py / ops/trace_packet.py). In the v6
    table, metas >= INST_BASE are instance tags (TLAS leaves).
    """
    import sys

    from ..ops.trace_inst import INST_BASE
    from ..scene.bvh8 import AXIS_LANE, LEAF_ROW_LIMIT, META_LANE

    out = file or sys.stdout
    nodes = _packet_nodes(packed)

    def visit(w, depth):
        if max_depth is not None and depth > max_depth:
            return
        meta = nodes[w, META_LANE:META_LANE + 8]
        axis = int(nodes[w, AXIS_LANE])
        kids = []
        for c in range(8):
            m = meta[c]
            if m == 0.0:  # empty slot (node 0 is the root, never a child)
                continue
            if m >= INST_BASE:
                kids.append(('inst', int(m) - INST_BASE))
            elif m >= 0:
                kids.append(('node', int(m)))
            else:
                kids.append(('leaf', int(-m) % LEAF_ROW_LIMIT,
                             int(-m) // LEAF_ROW_LIMIT))
        lo = [nodes[w, 8 * ax:8 * ax + 8].min() for ax in range(3)]
        hi = [nodes[w, 24 + 8 * ax:24 + 8 * ax + 8].max() for ax in range(3)]
        pad = '  ' * depth
        print(f'{pad}node {w}: axis={"xyz"[axis]} '
              f'bounds=({lo[0]:.2f},{lo[1]:.2f},{lo[2]:.2f})..'
              f'({hi[0]:.2f},{hi[1]:.2f},{hi[2]:.2f}) '
              f'children={len(kids)}', file=out)
        for kid in kids:
            if kid[0] == 'leaf':
                print(f'{pad}  leaf @row {kid[1]}: {kid[2]} tris', file=out)
            elif kid[0] == 'inst':
                inst = np.asarray(packed.inst_rows)
                root = int(inst[kid[1], 12])
                print(f'{pad}  instance {kid[1]} -> mesh root {root}',
                      file=out)
                visit(root, depth + 1)
            else:
                visit(kid[1], depth + 1)

    visit(0, 0)


def bvh_statistics(packed):
    """Aggregate structure stats of the packet-kernel BVH."""
    from ..scene.bvh8 import LEAF_ROW_LIMIT, META_LANE

    nodes = _packet_nodes(packed)
    meta = nodes[:, META_LANE:META_LANE + 8]
    leaves = meta[meta < 0]
    counts = (-leaves).astype(np.int64) // LEAF_ROW_LIMIT
    interior_children = int((meta > 0).sum())
    return dict(
        wide_nodes=int(nodes.shape[0]),
        leaves=int(leaves.size),
        triangles=int(counts.sum()),
        mean_leaf_size=float(counts.mean()) if counts.size else 0.0,
        mean_fanout=float((interior_children + leaves.size)
                          / max(nodes.shape[0], 1)),
        tri_rows=int(max(np.asarray(packed.inst_tris).shape[0],
                         np.asarray(packed.wide_tris_g).shape[0])),
    )
