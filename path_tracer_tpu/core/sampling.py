"""Vectorized random sampling: RNG, directions, vMF, HG, GGX.

TPU-native re-implementation of the device-side sampling toolbox of the
reference renderer (/root/reference/src/core/common.glsl.inc:187-354).
All quantities are channels-first (see core/vec.py): directions are
(3, N), GGX alphas (2, N), uniforms (N,). The RNG is a per-lane
counter-hash (the same recurrence the reference uses per GPU thread)
carried as a uint32 (N,) array, mapping 1:1 onto VPU integer lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import EPSILON, PI, TAU
from .vec import cross, dot, safe_normalize, vec3

# Re-exported for convenience (channels-first vector core).
from .vec import normalize  # noqa: F401


class Rng:
    """Stateful per-lane random stream over a uint32 state array.

    Mirrors the reference's Random()/Random0To1()
    (common.glsl.inc:189-203). Mutates its `state` member as numbers are
    drawn; the final state must be threaded out of any jitted function
    that wants to continue the stream.
    """

    def __init__(self, state):
        self.state = jnp.asarray(state, jnp.uint32)

    @staticmethod
    def seed(lane_index, frame_seed):
        """Seed like the reference scatter kernel (basic_scatter.glsl:314-318)."""
        lane = jnp.asarray(lane_index, jnp.uint32)
        s = jnp.asarray(frame_seed, jnp.uint32)
        return Rng(lane * jnp.uint32(65537) + s * jnp.uint32(277803737))

    def next_u32(self):
        s = self.state * jnp.uint32(747796405) + jnp.uint32(2891336453)
        self.state = s
        shift = (s >> jnp.uint32(28)) + jnp.uint32(4)
        w = ((s >> shift) ^ s) * jnp.uint32(277803737)
        return (w >> jnp.uint32(22)) ^ w

    def uniform(self):
        """Uniform float32 in [0, 1)."""
        return self.next_u32().astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def compute_tangent_vector(normal):
    """Arbitrary tangent for a (3, N) normal (common.glsl.inc:113-117)."""
    use_x = jnp.abs(normal[0]) < 0.9
    one = jnp.ones_like(normal[0])
    zero = jnp.zeros_like(normal[0])
    v = jnp.where(use_x, vec3(one, zero, zero), vec3(zero, one, zero))
    return safe_normalize(cross(v, normal))


def coordinate_frame(z):
    """Orthonormal frame (x, y) completing (3, N) unit z
    (common.glsl.inc:120-125). Left-handed like the reference:
    y = cross(x, z)."""
    x = compute_tangent_vector(z)
    y = cross(x, z)
    return x, y


def random_point_on_disk(rng: Rng):
    """Uniform point on the unit disk; returns (2, N)."""
    r = jnp.sqrt(rng.uniform())
    theta = rng.uniform() * TAU
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)


def random_direction(rng: Rng):
    """Uniform direction on the unit sphere; returns (3, N)."""
    z = 2.0 * rng.uniform() - 1.0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TAU * rng.uniform()
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def random_von_mises_fisher(rng: Rng, kappa, mu=None):
    """Sample a vMF distribution with concentration kappa; (3, N).

    mu: optional (3, N) mean direction; +Z if omitted. Matches
    RandomVonMisesFisher (common.glsl.inc:228-247).
    """
    kappa = jnp.asarray(kappa, jnp.float32)
    xi = rng.uniform()
    safe_kappa = jnp.maximum(kappa, 1e-6)
    z = 1.0 + (1.0 / safe_kappa) * jnp.log(xi + (1.0 - xi) * jnp.exp(-2.0 * safe_kappa))
    z = jnp.clip(z, -1.0, 1.0)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = rng.uniform() * TAU
    local = vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)
    if mu is None:
        return local
    mu_x, mu_y = coordinate_frame(mu)
    return safe_normalize(local[0] * mu_x + local[1] * mu_y + local[2] * mu)


def von_mises_fisher_pdf(kappa, mu, direction):
    """vMF PDF (common.glsl.inc:249-254). mu/direction (3, N) -> (N,)."""
    kappa = jnp.asarray(kappa, jnp.float32)
    cos_theta = dot(mu, direction)
    safe_kappa = jnp.maximum(kappa, EPSILON)
    c = safe_kappa / (2.0 * PI * (1.0 - jnp.exp(-2.0 * safe_kappa)))
    pdf = c * jnp.exp(safe_kappa * (cos_theta - 1.0))
    return jnp.where(kappa < EPSILON, 1.0 / (4.0 * PI), pdf)


def sample_direction_hg(anisotropy, u1, u2):
    """Henyey-Greenstein phase sample (common.glsl.inc:259-276); (3, N)
    in the frame whose +Z is the incident direction.

    Note: reproduces the reference's convention exactly, in which the
    sampled mean cosine is -anisotropy relative to +Z (the reference
    negates the textbook inverse CDF; preserved for output parity).
    """
    g = jnp.asarray(anisotropy, jnp.float32)
    iso_z = 1.0 - 2.0 * u1
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1.0, g)
    s = (1.0 - g_safe * g_safe) / (1.0 + g_safe - 2.0 * g_safe * u1)
    aniso_z = -(1.0 + g_safe * g_safe - s * s) / (2.0 * g_safe)
    z = jnp.clip(jnp.where(jnp.abs(g) < 1e-3, iso_z, aniso_z), -1.0, 1.0)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = u2 * TAU
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


# --- GGX microfacet model with anisotropic roughness ----------------------


def ggx_roughness_alpha(roughness, anisotropy):
    """2D GGX alpha (common.glsl.inc:281-288); returns (2, N)."""
    r = jnp.asarray(roughness, jnp.float32)
    s = 1.0 - jnp.asarray(anisotropy, jnp.float32)
    alpha_x = r * r * jnp.sqrt(2.0 / (1.0 + s * s))
    alpha_y = s * alpha_x
    return jnp.stack([alpha_x, alpha_y], axis=0)


def ggx_smith_g1(direction, alpha):
    """Smith G1 for anisotropic GGX (common.glsl.inc:294-301).

    direction: (3, N) in tangent space, alpha: (2, N) -> (N,).
    """
    dx2 = direction[0] * direction[0]
    dy2 = direction[1] * direction[1]
    dz2 = direction[2] * direction[2]
    dz_safe = jnp.maximum(dz2, EPSILON)
    tan_term = (alpha[0] * alpha[0] * dx2 + alpha[1] * alpha[1] * dy2) / dz_safe
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_term))
    return jnp.where(dz2 < EPSILON, 0.0, g1)


def ggx_visible_normal(direction, alpha, u1, u2):
    """Heitz VNDF sampling of the GGX distribution (common.glsl.inc:306-346).

    direction: (3, N) view in tangent space, alpha: (2, N) -> (3, N).
    """
    vz = safe_normalize(vec3(alpha[0] * direction[0],
                             alpha[1] * direction[1],
                             direction[2]))

    len_sq = vz[0] * vz[0] + vz[1] * vz[1]
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(len_sq, 1e-20))
    zero = jnp.zeros_like(len_sq)
    one = jnp.ones_like(len_sq)
    vx = jnp.where(len_sq > 0.0,
                   vec3(-vz[1] * inv_len, vz[0] * inv_len, zero),
                   vec3(one, zero, zero))
    vy = cross(vz, vx)

    r = jnp.sqrt(u1)
    phi = TAU * u2
    s = 0.5 * (1.0 + vz[2])
    tx = r * jnp.cos(phi)
    ty = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - tx * tx)) + s * r * jnp.sin(phi)
    tz = jnp.sqrt(jnp.maximum(0.0, 1.0 - tx * tx - ty * ty))

    n = tx * vx + ty * vy + tz * vz
    return safe_normalize(vec3(alpha[0] * n[0], alpha[1] * n[1],
                               jnp.maximum(0.0, n[2])))


def ggx_distribution(normal, alpha):
    """Anisotropic GGX NDF D(m) (common.glsl.inc:349-354); (N,)."""
    inv_ax = 1.0 / alpha[0]
    inv_ay = 1.0 / alpha[1]
    b = (normal[0] * normal[0] * inv_ax * inv_ax
         + normal[1] * normal[1] * inv_ay * inv_ay
         + normal[2] * normal[2])
    return 1.0 / (PI * alpha[0] * alpha[1] * b * b)
