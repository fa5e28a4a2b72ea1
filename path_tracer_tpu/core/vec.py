"""Channels-first vector/spectrum math for TPU-friendly layouts.

Convention (the load-bearing TPU design decision of this framework):
per-lane quantities put the lane axis LAST --

    scalars:   (N,)
    vectors:   (3, N)
    spectra:   (4, N)   (hero-wavelength clusters)
    matrices:  (4, 4, N) when gathered per lane

so the minor (lane) dimension maps onto the TPU's 128-wide vector lanes
with zero padding. The naive (N, 3)/(N, 4) trailing-channel layout makes
XLA pad the channel dim to 128 lanes (a measured 42.7x memory and
bandwidth blowup inside the render loop). Trailing-axis broadcasting
also becomes free: `vector * scalar` and `jnp.where(mask, a, b)` with an
(N,) mask broadcast with no reshapes.

All helpers do component-row math (slices of the leading axis), which
XLA fuses into full-utilization (N,)-wide VPU ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def vec3(x, y, z):
    """Stack components into a (3, N) vector."""
    return jnp.stack(jnp.broadcast_arrays(x, y, z), axis=0)


def splat3(v, n):
    """(3,) constant -> (3, N)."""
    return jnp.broadcast_to(jnp.asarray(v, jnp.float32)[:, None], (3, n))


def dot(a, b):
    """(3, N) x (3, N) -> (N,)."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ], axis=0)


def length_sq(a):
    return dot(a, a)


def length(a):
    return jnp.sqrt(length_sq(a))


def normalize(a):
    return a * (1.0 / length(a))


def safe_normalize(a):
    """Normalize, returning +Z for degenerate vectors (common.glsl.inc:93-100)."""
    lsq = length_sq(a)
    bad = lsq < 1e-12
    inv = 1.0 / jnp.sqrt(jnp.where(bad, 1.0, lsq))
    unit_z = vec3(jnp.zeros_like(lsq), jnp.zeros_like(lsq), jnp.ones_like(lsq))
    return jnp.where(bad, unit_z, a * inv)


def max4(s):
    """(4, N) -> (N,) max over the spectral axis."""
    return jnp.max(s, axis=0)


def sum4(s):
    return jnp.sum(s, axis=0)


def transform_point(m, p):
    """Apply a matrix to (3, N) points. `m` is anything supporting
    m[i][j] scalar-or-(N,) component access: a (4, 4[, N]) array or a
    nested list of per-lane components (see take_matrix)."""
    return jnp.stack([
        m[i][0] * p[0] + m[i][1] * p[1] + m[i][2] * p[2] + m[i][3]
        for i in range(3)
    ], axis=0)


def transform_vector(m, v):
    """Apply the rotation/scale part of m (see transform_point) to (3, N)."""
    return jnp.stack([
        m[i][0] * v[0] + m[i][1] * v[1] + m[i][2] * v[2]
        for i in range(3)
    ], axis=0)


def transform_normal(n, m_inverse):
    """normalize(N^T * M_inv): rows index the *columns* of the inverse
    (common.glsl.inc:50-53)."""
    return safe_normalize(jnp.stack([
        m_inverse[0][i] * n[0] + m_inverse[1][i] * n[1] + m_inverse[2][i] * n[2]
        for i in range(3)
    ], axis=0))


# --- per-component gathers --------------------------------------------------
#
# XLA TPU gathers of multi-component slices force a layout in which the
# tiny component dim rides the 128-wide lane axis (measured 42x padding
# of every downstream buffer). All table gathers therefore go through
# these helpers: one gather per component row (slice size 1, no layout
# pressure), stacked afterwards so the lane axis stays minor.


# Tables at or below this many entries are "gathered" with a select
# chain instead of a real gather: M fused vector selects beat XLA's
# TPU gather lowering by orders of magnitude for small M.
SMALL_TABLE_MAX = 64


def take_1d(table, idx):
    """Gather a 1D table at (N,) indices, select-chain for small tables."""
    m = table.shape[0]
    if m <= SMALL_TABLE_MAX:
        out = jnp.broadcast_to(table[0], idx.shape)
        for k in range(1, m):
            out = jnp.where(idx == k, table[k], out)
        return out
    return jnp.take(table, idx)


def take_vec(table, idx):
    """Gather lanes from a (C, T) table -> (C, N) via per-row takes."""
    return jnp.stack([take_1d(table[c], idx) for c in range(table.shape[0])],
                     axis=0)


def take_matrix(table, idx):
    """Gather lanes from a (4, 4, S) matrix table -> nested [i][j] lists
    of (N,) components (consumed by the transform_* helpers)."""
    return [[take_1d(table[i, j], idx) for j in range(4)] for i in range(4)]
