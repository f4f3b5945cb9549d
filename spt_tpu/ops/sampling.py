"""BRDF math and direction sampling, batched over lanes.

Faithful re-expressions of the reference's shading math:

- Cook-Torrance GGX evaluation: Material::evaluateBRDF (Material.cpp:84-117)
  with the unified alpha = clamp(roughness, 0.02, 1)^2 semantics shared
  between CPU and GPU.
- GGX NDF half-vector sampling: ggx_sample_half_vector
  (device_programs.cu:183-211).
- GGX VNDF (Heitz 2014) sampling: Material::evaluateSample
  (Material.cpp:119-234) — the better sampler the reference implemented but
  never wired in (SURVEY.md §5 quirk 6); we expose it as first-class.
- Cosine hemisphere sampling: device_programs.cu:134-143 / wf_math.h:51-72.
- Schlick Fresnel: scalar-ior form (wf_math.h:93-100) and F0-vector form
  (device_programs.cu:175-181).

All functions take/return arrays with an arbitrary leading batch shape.
"""

from __future__ import annotations

import jax.numpy as jnp

from spt_tpu.ops import math3d as m3

PI = 3.14159265358979323846

# gradient-safe sqrt(max(x, 0)) — see math3d.safe_sqrt for why
safe_sqrt = m3.safe_sqrt


# --- Fresnel -----------------------------------------------------------------

def fresnel_schlick(cos_vh: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
    """F0-vector Schlick (device_programs.cu:175-181). f0: (..., 3)."""
    m = 1.0 - jnp.clip(cos_vh, 0.0, 1.0)
    m5 = (m * m) * (m * m) * m
    return f0 + (1.0 - f0) * m5[..., None]


def fresnel_schlick_ior(cos_theta: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    """Scalar Schlick with r0 from ior (wf_math.h:93-100)."""
    r0 = (1.0 - ior) / (1.0 + ior)
    r0 = r0 * r0
    x = 1.0 - jnp.clip(cos_theta, 0.0, 1.0)
    return r0 + (1.0 - r0) * x * x * x * x * x


def fresnel_schlick_eta(cos_i: jnp.ndarray, eta_i: jnp.ndarray, eta_t: jnp.ndarray) -> jnp.ndarray:
    """R0 from the eta pair (the GPU dielectric branch, device_programs.cu:511-516)."""
    r0 = (eta_t - eta_i) / (eta_t + eta_i)
    r0 = r0 * r0
    m = 1.0 - jnp.clip(cos_i, 0.0, 1.0)
    return r0 + (1.0 - r0) * m * m * m * m * m


# --- GGX microfacet ----------------------------------------------------------

def roughness_to_alpha(roughness: jnp.ndarray) -> jnp.ndarray:
    """Perceptual roughness r in [0.02, 1] -> alpha = r^2 (Material.cpp:96-98)."""
    r = jnp.clip(roughness, 0.02, 1.0)
    return r * r


def d_ggx(cos_nh: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Trowbridge-Reitz NDF (Material.cpp:32-43 / device_programs.cu:155-162)."""
    cos_nh = jnp.maximum(cos_nh, 0.0)
    a2 = alpha * alpha
    denom = cos_nh * cos_nh * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def _g1_schlick(cos_x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    return cos_x / (cos_x * (1.0 - k) + k)


def g_smith_cpu(cos_nv: jnp.ndarray, cos_nl: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Smith G as Material::geometrySmith (Material.cpp:57-66):
    k derived from r = clamp(sqrt(alpha), 0.02, 1)."""
    r = jnp.clip(jnp.sqrt(jnp.maximum(alpha, 0.0)), 0.02, 1.0)
    k = (r + 1.0) * (r + 1.0) / 8.0
    return _g1_schlick(jnp.maximum(cos_nv, 0.0), k) * _g1_schlick(jnp.maximum(cos_nl, 0.0), k)


def g_smith_gpu(cos_nl: jnp.ndarray, cos_nv: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Smith G as the GPU smithGGX (device_programs.cu:164-173):
    k = (alpha+1)^2 / 8 — note it feeds alpha, not r; preserved as-is for
    throughput parity with the GPU metal branch."""
    a = alpha + 1.0
    k = a * a * 0.125
    return _g1_schlick(cos_nl, k) * _g1_schlick(cos_nv, k)


def evaluate_brdf(
    n: jnp.ndarray,
    v: jnp.ndarray,
    l: jnp.ndarray,
    base_color: jnp.ndarray,
    metallic: jnp.ndarray,
    roughness: jnp.ndarray,
    ior: jnp.ndarray,
) -> jnp.ndarray:
    """Cook-Torrance BRDF * NdotL — Material::evaluateBRDF (Material.cpp:84-117).

    Returns (kD * diffuse/pi + D*G*F / (4 NdotV NdotL + 1e-4)) * NdotL, with
    F0 = mix(((ior-1)/(ior+1))^2, baseColor, metallic) (Material.h:42-49) and
    diffuse = baseColor * (1 - metallic) (Material.h:52-54).
    """
    h = m3.safe_normalize(v + l)
    cos_nv = jnp.maximum(m3.dot(n, v), 0.0)
    cos_nl = jnp.maximum(m3.dot(n, l), 0.0)
    cos_hv = jnp.maximum(m3.dot(h, v), 0.0)
    cos_nh = jnp.maximum(m3.dot(n, h), 0.0)

    alpha = roughness_to_alpha(roughness)
    d = d_ggx(cos_nh, alpha)
    g = g_smith_cpu(cos_nv, cos_nl, alpha)

    f0_diel = ((ior - 1.0) / (ior + 1.0)) ** 2
    f0 = f0_diel[..., None] * (1.0 - metallic[..., None]) + base_color * metallic[..., None]
    f = fresnel_schlick(cos_hv, f0)

    specular = (d * g)[..., None] * f / (4.0 * cos_nv * cos_nl + 1e-4)[..., None]
    kd = 1.0 - f
    diffuse = base_color * (1.0 - metallic[..., None]) / PI
    return (kd * diffuse + specular) * cos_nl[..., None]


# --- Direction sampling ------------------------------------------------------

def cosine_hemisphere_local(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted local sample (z up) — device_programs.cu:134-143."""
    r = safe_sqrt(u1)
    phi = 2.0 * PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = safe_sqrt(1.0 - u1)
    return jnp.stack([x, y, z], axis=-1)


def cosine_sample(n: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """World-space cosine hemisphere sample around `n`
    (device_programs.cu:668-681; wf_math.h:51-72)."""
    local = cosine_hemisphere_local(u1, u2)
    t, b = m3.make_onb(n)
    return m3.safe_normalize(m3.from_onb(t, b, n, local))


def ggx_sample_half_vector(
    u1: jnp.ndarray, u2: jnp.ndarray, alpha: jnp.ndarray, n: jnp.ndarray
) -> jnp.ndarray:
    """GGX NDF half-vector sample (device_programs.cu:183-211):
    cosTheta = sqrt((1-u2) / (1 + (a^2-1) u2)), phi = 2 pi u1."""
    a2 = alpha * alpha
    phi = 2.0 * PI * u1
    denom = 1.0 + (a2 - 1.0) * u2
    cos_t = safe_sqrt((1.0 - u2) / denom)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    t, b = m3.make_onb(n)
    h = m3.from_onb(t, b, n, local)
    return m3.normalize_or(h, n)


def ggx_sample_vndf(
    u1: jnp.ndarray, u2: jnp.ndarray, alpha: jnp.ndarray, n: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Heitz-2014 visible-NDF half-vector sample (Material.cpp:145-199):
    stretch view, sample projected disk, unstretch.  Returns world-space H.
    """
    t, b = m3.make_onb(n)
    # View in local frame around n.
    vh = jnp.stack([m3.dot(v, t), m3.dot(v, b), m3.dot(v, n)], axis=-1)
    vh = m3.safe_normalize(vh)
    # Stretch.
    vs = jnp.stack([alpha * vh[..., 0], alpha * vh[..., 1], vh[..., 2]], axis=-1)
    vs = m3.safe_normalize(vs)
    # Basis around stretched view (Material.cpp:166-172).
    z_axis = jnp.zeros_like(vs).at[..., 2].set(1.0)
    t1 = m3.safe_normalize(m3.cross(z_axis, vs))
    t1 = jnp.where(
        (vs[..., 2] < 0.9999)[..., None],
        t1,
        jnp.zeros_like(vs).at[..., 0].set(1.0),
    )
    t2 = m3.cross(vs, t1)
    # Disk sample with projected-area correction (Material.cpp:174-185).
    r_disk = safe_sqrt(u1)
    phi = 2.0 * PI * u2
    p1 = r_disk * jnp.cos(phi)
    p2 = r_disk * jnp.sin(phi)
    s = 0.5 * (1.0 + vs[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vs
    # Unstretch (Material.cpp:191-193).
    h_local = jnp.stack(
        [alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(0.0, nh[..., 2])], axis=-1
    )
    h_local = m3.safe_normalize(h_local)
    # Back to world.
    h = m3.from_onb(t, b, n, h_local)
    return m3.safe_normalize(h)


# --- component-SoA (Vec3) forms — the hot-path variants ----------------------
# Same math as above, expressed over spt_tpu.ops.vec3.Vec3 lanes (see
# ops/vec3.py for the layout rationale).

from spt_tpu.ops import vec3 as v3  # noqa: E402  (deliberate tail import)


def fresnel_schlick_v(cos_vh: jnp.ndarray, f0: "v3.Vec3") -> "v3.Vec3":
    """F0-vector Schlick (device_programs.cu:175-181), Vec3 form."""
    m = 1.0 - jnp.clip(cos_vh, 0.0, 1.0)
    m5 = (m * m) * (m * m) * m
    return f0 + (1.0 - f0) * m5


def evaluate_brdf_v(
    n: "v3.Vec3",
    v: "v3.Vec3",
    l: "v3.Vec3",
    base_color: "v3.Vec3",
    metallic: jnp.ndarray,
    roughness: jnp.ndarray,
    ior: jnp.ndarray,
) -> "v3.Vec3":
    """Cook-Torrance BRDF * NdotL (Material.cpp:84-117), Vec3 form."""
    h = v3.safe_normalize(v + l)
    cos_nv = jnp.maximum(v3.dot(n, v), 0.0)
    cos_nl = jnp.maximum(v3.dot(n, l), 0.0)
    cos_hv = jnp.maximum(v3.dot(h, v), 0.0)
    cos_nh = jnp.maximum(v3.dot(n, h), 0.0)

    alpha = roughness_to_alpha(roughness)
    d = d_ggx(cos_nh, alpha)
    g = g_smith_cpu(cos_nv, cos_nl, alpha)

    f0_diel = ((ior - 1.0) / (ior + 1.0)) ** 2
    f0 = base_color * metallic + f0_diel * (1.0 - metallic)
    f = fresnel_schlick_v(cos_hv, f0)

    spec_scale = (d * g) / (4.0 * cos_nv * cos_nl + 1e-4)
    specular = f * spec_scale
    kd = 1.0 - f
    diffuse = base_color * ((1.0 - metallic) / PI)
    return (kd * diffuse + specular) * cos_nl


def cosine_sample_v(n: "v3.Vec3", u1: jnp.ndarray, u2: jnp.ndarray) -> "v3.Vec3":
    """Cosine hemisphere around n (device_programs.cu:668-681), Vec3 form."""
    r = safe_sqrt(u1)
    phi = 2.0 * PI * u2
    lx = r * jnp.cos(phi)
    ly = r * jnp.sin(phi)
    lz = safe_sqrt(1.0 - u1)
    t, b = v3.make_onb(n)
    return v3.safe_normalize(v3.from_onb(t, b, n, lx, ly, lz))


def ggx_sample_half_vector_v(
    u1: jnp.ndarray, u2: jnp.ndarray, alpha: jnp.ndarray, n: "v3.Vec3"
) -> "v3.Vec3":
    """GGX NDF half-vector (device_programs.cu:183-211), Vec3 form."""
    a2 = alpha * alpha
    phi = 2.0 * PI * u1
    denom = 1.0 + (a2 - 1.0) * u2
    cos_t = safe_sqrt((1.0 - u2) / denom)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    lx = sin_t * jnp.cos(phi)
    ly = sin_t * jnp.sin(phi)
    t, b = v3.make_onb(n)
    h = v3.from_onb(t, b, n, lx, ly, cos_t)
    return v3.normalize_or(h, n)


def ggx_sample_vndf_v(
    u1: jnp.ndarray, u2: jnp.ndarray, alpha: jnp.ndarray,
    n: "v3.Vec3", v: "v3.Vec3",
) -> "v3.Vec3":
    """Heitz-2014 VNDF sample (Material.cpp:145-199), Vec3 form."""
    t, b = v3.make_onb(n)
    vh = v3.safe_normalize(v3.Vec3(v3.dot(v, t), v3.dot(v, b), v3.dot(v, n)))
    vs = v3.safe_normalize(v3.Vec3(alpha * vh.x, alpha * vh.y, vh.z))
    z_axis = v3.Vec3(jnp.zeros_like(vs.x), jnp.zeros_like(vs.x), jnp.ones_like(vs.x))
    t1 = v3.safe_normalize(v3.cross(z_axis, vs))
    x_axis = v3.Vec3(jnp.ones_like(vs.x), jnp.zeros_like(vs.x), jnp.zeros_like(vs.x))
    t1 = v3.where(vs.z < 0.9999, t1, x_axis)
    t2 = v3.cross(vs, t1)
    r_disk = safe_sqrt(u1)
    phi = 2.0 * PI * u2
    p1 = r_disk * jnp.cos(phi)
    p2 = r_disk * jnp.sin(phi)
    s = 0.5 * (1.0 + vs.z)
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = t1 * p1 + t2 * p2 + vs * p3
    h_local = v3.safe_normalize(
        v3.Vec3(alpha * nh.x, alpha * nh.y, jnp.maximum(0.0, nh.z))
    )
    return v3.safe_normalize(v3.from_onb(t, b, n, h_local.x, h_local.y, h_local.z))
