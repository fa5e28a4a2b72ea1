"""Closed-form radiometric anchors.

The bench goldens compare the TPU render against this repo's own CPU
portable path; these tests anchor both against EXTERNAL truth --
closed-form transport solutions and published optics definitions -- so
"matches the reference within MC noise" does not rest on self-goldens
(the Vulkan reference cannot run in this environment).

Tolerances are DERIVED, not tuned:

* Russian roulette at termination probability q gives each per-round
  deposit a survival factor 1/(1-q) per extra bounce; for the one-
  bounce closed forms below the per-sample relative variance is
  bounded by q/(1-q) (a single RR trial at weight 1/(1-q)) plus the
  hero-wavelength spectral variance of a near-flat uplifted spectrum
  (measured < 0.02 rel on gray cards in test_spectrum). With N
  averaged samples the mean's sigma is sqrt(var)/sqrt(N); asserts sit
  at >= 5 sigma.
* Quadrature anchors state their grid-resolution error bound inline.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from path_tracer_tpu import Scene, Transform, render_scene
from path_tracer_tpu.core.constants import (
    MATERIAL_TYPE_BASIC_DIFFUSE,
    MATERIAL_TYPE_OPENPBR,
)
from path_tracer_tpu.scene.model import (
    ENTITY_TYPE_CAMERA,
    ENTITY_TYPE_CUBE,
    ENTITY_TYPE_PLANE,
)

TERMINATION_Q = 0.05


def _img(scene, rounds, w=24, h=12, seed=0):
    return np.asarray(render_scene(scene, width=w, height=h,
                                   spp_rounds=rounds, seed=seed))


@pytest.mark.slow
def test_infinite_plane_albedo_ratio():
    """An infinite Lambertian plane of albedo rho under a uniform sky of
    radiance L has exact outgoing radiance rho * L (the plane sees only
    sky, every bounce leaves upward): pixel(plane) / pixel(sky) == rho,
    term by term in the spectral estimator.

    Sample budget: the ratio averages ~140 plane pixels x ~25 samples
    each (3500 samples) and ~90 sky pixels; per-sample rel sigma <=
    sqrt(q/(1-q) + 0.02^2) ~ 0.23, so sigma_mean ~ 0.23/sqrt(3500) =
    0.004 -- the 0.03 gate is ~7 sigma, plus margin for the uplifted
    0.5-gray spectrum's residual non-flatness (< 1% rel,
    test_spectrum)."""
    rho = 0.5

    def view(pitch, rounds):
        scene = Scene()
        mat = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE,
                                    base_color=np.full(3, rho, np.float32))
        scene.create_entity(ENTITY_TYPE_PLANE, material=mat)
        cam = scene.create_entity(
            ENTITY_TYPE_CAMERA,
            transform=Transform(position=[0, 0, 1.0],
                                rotation=[pitch, 0, 0]))
        cam.pinhole.field_of_view_in_degrees = 40.0
        scene.root.skybox_brightness = 1.0
        return _img(scene, rounds=rounds, w=24, h=12, seed=2)

    plane = view(0.0, rounds=400).mean()       # straight down: all plane
    sky = view(np.pi, rounds=120).mean()       # straight up: all sky
    assert sky > 0.05
    assert abs(plane / sky - rho) < 0.03, (plane, sky, plane / sky)


@pytest.mark.slow
def test_two_plate_view_factor_box():
    """Two large parallel slabs, gap g << side s: the top slab's
    downward face is a Lambertian emitter of radiance Le with zero
    albedo, the bottom is diffuse with albedo rho, the sky is black.
    The infinite-plate radiosity solution truncates after one
    reflection (the emitter absorbs everything back): looking DOWN
    from the gap sees rho * Le, looking UP sees Le, so down/up == rho
    with geometric view-factor error O((g/s)^2) = (1/40)^2 < 0.1%.

    Budget: ~288 pixels x ~12 samples per view (3400 samples),
    sigma_mean ~ 0.004; gate at 0.04 covers 5 sigma + view-factor
    truncation + the emitter's cosine-weighted edge leakage."""
    le = 4.0
    rho = 0.5
    g, s = 1.0, 40.0

    def view(pitch):
        # Fresh scene per view (render_scene compiles from scratch),
        # camera in the middle of the gap looking straight up or down.
        scene = Scene()
        emit = scene.create_material(
            MATERIAL_TYPE_OPENPBR, name='emitter',
            base_color=np.zeros(3, np.float32), base_weight=0.0,
            specular_weight=0.0, emission_color=np.ones(3, np.float32),
            emission_luminance=le)
        diff = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE,
                                     name='card',
                                     base_color=np.full(3, rho, np.float32))
        scene.create_entity(
            ENTITY_TYPE_CUBE, material=emit, name='top',
            transform=Transform(position=[0, 0, g + 0.1],
                                scale=[s, s, 0.1], scale_is_uniform=False))
        scene.create_entity(
            ENTITY_TYPE_CUBE, material=diff, name='bottom',
            transform=Transform(position=[0, 0, -0.1],
                                scale=[s, s, 0.1], scale_is_uniform=False))
        scene.root.skybox_brightness = 0.0
        cam = scene.create_entity(
            ENTITY_TYPE_CAMERA,
            transform=Transform(position=[0, 0, g / 2],
                                rotation=[pitch, 0, 0]))
        cam.pinhole.field_of_view_in_degrees = 30.0
        return _img(scene, rounds=220, w=24, h=12, seed=3)

    up = view(np.pi)        # +z: the emitting underside
    down = view(0.0)        # -z: the diffuse card
    u = up[4:8, 8:16].mean()
    d = down[4:8, 8:16].mean()
    assert u > 0.05, u
    assert abs(d / u - rho) < 0.04, (d, u, d / u)


def test_cauchy_ior_matches_abbe_definition():
    """cauchy_empirical_ior must satisfy the PUBLISHED Abbe-number
    definition it is fit from: V_d = (n_d - 1) / (n_F - n_C) at the
    Fraunhofer d/F/C lines (587.56 / 486.13 / 656.27 nm), and n must
    be monotonically decreasing in wavelength (normal dispersion).
    Tolerance: the two-term Cauchy fit reproduces its own defining
    lines to float32 rounding; 1e-3 on V is ~100x that."""
    from path_tracer_tpu.core.optics import cauchy_empirical_ior

    for base_ior, abbe in ((1.45, 30.0), (1.52, 64.2), (1.7, 25.0)):
        n_d = float(cauchy_empirical_ior(base_ior, abbe, jnp.float32(587.56)))
        n_f = float(cauchy_empirical_ior(base_ior, abbe, jnp.float32(486.13)))
        n_c = float(cauchy_empirical_ior(base_ior, abbe, jnp.float32(656.27)))
        v = (n_d - 1.0) / (n_f - n_c)
        assert abs(v - abbe) / abbe < 1e-3, (base_ior, abbe, v)
        assert n_f > n_d > n_c
        assert abs(n_d - base_ior) < 5e-3


def test_dispersion_angle_matches_snell():
    """Scene-free refraction check: the deviation of a ray refracted at
    a flat interface at the F and C lines must match Snell's law with
    the Cauchy n(lambda) -- the closed-form a prism spectrometer would
    measure. Uses the same cos_theta_refracted the translucent BSDF
    uses. Tolerance: pure float32 trig, 1e-5 rad."""
    from path_tracer_tpu.core.optics import (
        cauchy_empirical_ior, cos_theta_refracted)

    theta_i = np.deg2rad(40.0)
    for lam in (486.13, 656.27):
        n = float(cauchy_empirical_ior(1.52, 40.0, jnp.float32(lam)))
        eta = 1.0 / n  # outside -> inside
        # The reference's sign convention (common.glsl.inc:379-390):
        # the refracted cosine is measured against the same normal and
        # carries the OPPOSITE sign of the incident cosine.
        ct = float(cos_theta_refracted(jnp.float32(eta),
                                       jnp.float32(np.cos(theta_i))))
        theta_t = np.arccos(-ct)
        snell = np.arcsin(np.sin(theta_i) / n)
        assert abs(theta_t - snell) < 1e-5, (lam, theta_t, snell)


def test_vmf_pdf_normalizes_on_quadrature_grid():
    """von_mises_fisher_pdf must integrate to 1 over the sphere. A
    512 x 1024 latitude-longitude product grid integrates a kappa<=50
    vMF (max gradient ~kappa) with midpoint error < kappa * (pi/512)^2
    ~ 2e-3; assert at 5e-3."""
    from path_tracer_tpu.core.sampling import von_mises_fisher_pdf

    nt, np_ = 512, 1024
    theta = (np.arange(nt) + 0.5) * np.pi / nt
    phi = (np.arange(np_) + 0.5) * 2 * np.pi / np_
    st, ct = np.sin(theta), np.cos(theta)
    dirs = np.stack([
        np.outer(st, np.cos(phi)),
        np.outer(st, np.sin(phi)),
        np.broadcast_to(ct[:, None], (nt, np_)),
    ]).reshape(3, -1)
    w = np.repeat(st, np_) * (np.pi / nt) * (2 * np.pi / np_)
    mu = np.asarray([0.3, -0.5, 0.81])
    mu = mu / np.linalg.norm(mu)
    for kappa in (0.0, 2.0, 50.0):
        pdf = np.asarray(von_mises_fisher_pdf(
            jnp.float32(kappa), jnp.asarray(mu, jnp.float32)[:, None],
            jnp.asarray(dirs, jnp.float32)))
        total = float((pdf * w).sum())
        assert abs(total - 1.0) < 5e-3, (kappa, total)


def test_vmf_sampler_resultant_length_identity():
    """The mean resultant length of vMF samples must match the exact
    identity A(kappa) = coth(kappa) - 1/kappa (the brute-force check of
    the sampler against the distribution it claims). With N = 2^17
    samples the component-wise CLT sigma is <= 1/sqrt(N) ~ 0.0028;
    assert at 5 sigma = 0.014."""
    from path_tracer_tpu.core.sampling import Rng, random_von_mises_fisher

    n = 1 << 17
    rng = Rng.seed(jnp.arange(n, dtype=jnp.uint32), 123)
    mu = np.asarray([0.0, 0.0, 1.0], np.float32)
    for kappa in (1.0, 8.0, 40.0):
        d = np.asarray(random_von_mises_fisher(
            rng, jnp.float32(kappa), jnp.asarray(mu)[:, None]))
        r = d.mean(axis=1)
        a_exp = 1.0 / np.tanh(kappa) - 1.0 / kappa
        assert abs(np.linalg.norm(r) - a_exp) < 0.014, (kappa, r)
        # And it points along mu.
        assert r[2] / np.linalg.norm(r) > 0.999
