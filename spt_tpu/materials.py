"""Material presets and the device-side SoA material table.

Replaces the reference's Material/MaterialManager pair (include/Material.h,
src/MaterialManager.cpp).  The preset library mirrors Materials::Gold..Light
(Material.h:99-148); the default table is MaterialManager's 9 presets
(MaterialManager.cpp:21-52) — note the Glass preset is *tagged*
MATERIAL_TYPE_DIELECTRIC there, unlike SceneBuilder's untagged glass; the
manager's list is what both reference backends actually shade with, so it is
our default too.

On TPU there is no SBT dispatch: `DeviceMaterials` is a (M, ...) SoA table and
a hit's material is a gather `table[mat_id]` (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

# NOTE: scene.desc is imported lazily inside functions — importing it here
# re-enters spt_tpu.scene.__init__ -> scene.flatten -> this module (a cycle
# that trips when spt_tpu.engine is imported before spt_tpu.scene).
MATERIAL_TYPE_PBR = 0
MATERIAL_TYPE_DIELECTRIC = 1


class DeviceMaterials(NamedTuple):
    """SoA material table (the TPU `DeviceMaterial[]`, LaunchParams.h:34-43 —
    plus the emission/transparency fields the GPU left unused, SURVEY.md §5
    quirks 2 and 7, which we wire in)."""

    base_color: jnp.ndarray    # (M, 3) raw albedo; diffuse derived at shade
    metallic: jnp.ndarray      # (M,)
    roughness: jnp.ndarray     # (M,)
    ior: jnp.ndarray           # (M,)
    mat_type: jnp.ndarray      # (M,) int32: 0 PBR, 1 DIELECTRIC
    emission: jnp.ndarray      # (M, 3)
    transparency: jnp.ndarray  # (M,) derived via Material::getTransparency()
    tex_id: jnp.ndarray        # (M,) int32 index into the scene texture
                               # table, -1 when the material is untextured

    @property
    def count(self) -> int:
        return self.base_color.shape[0]


# Device texture resolution: every baseColor texture is resampled to this
# square size.  64x64 = 4096 texels = four (8, 128) VMEM tiles, the unit the
# in-kernel sampler's tpu.dynamic_gather can address (ops/pallas_bounce).
TEX_RES = 64


def _resample_texture(img: np.ndarray, res: int = TEX_RES) -> np.ndarray:
    """(H, W, 3) -> (res, res, 3) by uniform-grid point sampling."""
    h, w = img.shape[0], img.shape[1]
    yi = np.minimum((np.arange(res) + 0.5) / res * h, h - 1).astype(np.int64)
    xi = np.minimum((np.arange(res) + 0.5) / res * w, w - 1).astype(np.int64)
    return img[yi][:, xi].astype(np.float32)


def build_texture_table(materials: Sequence["Material"]):
    """(tex_id (M,) int32, textures (n_tex, 4, 8, 128, 3) f32 | None).

    Texture layout is the kernel-addressable tiling of a TEX_RES^2 image:
    texel (ty, tx) -> flat = ty * TEX_RES + tx -> (flat >> 10, (flat >> 7)
    & 7, flat & 127).  The XLA sampler indexes the same layout."""
    tex_id = np.full(max(len(materials), 1), -1, np.int32)
    imgs = []
    for i, m in enumerate(materials):
        img = getattr(m, "base_color_texture", None)
        if img is None:
            continue
        tex_id[i] = len(imgs)
        t = _resample_texture(img).reshape(-1, 3)        # (4096, 3)
        imgs.append(t.reshape(4, 8, 128, 3))
    if not imgs:
        return jnp.asarray(tex_id), None
    return jnp.asarray(tex_id), jnp.asarray(np.stack(imgs), jnp.float32)


def build_device_materials(materials: Sequence["Material"]) -> DeviceMaterials:
    """Material list -> SoA table (MaterialManager::buildDeviceMaterials,
    MaterialManager.cpp:13-19, with derived transparency baked in)."""
    if len(materials) == 0:
        materials = [Material()]
    tex_id, _ = build_texture_table(materials)
    return DeviceMaterials(
        base_color=jnp.asarray(np.stack([m.base_color for m in materials]), jnp.float32),
        metallic=jnp.asarray(np.array([m.metallic for m in materials], np.float32)),
        roughness=jnp.asarray(np.array([m.roughness for m in materials], np.float32)),
        ior=jnp.asarray(np.array([m.ior for m in materials], np.float32)),
        mat_type=jnp.asarray(np.array([m.mat_type for m in materials], np.int32)),
        emission=jnp.asarray(np.stack([m.emission for m in materials]), jnp.float32),
        transparency=jnp.asarray(
            np.array([m.get_transparency() for m in materials], np.float32)
        ),
        tex_id=tex_id,
    )


def gather(table: DeviceMaterials, mat_id: jnp.ndarray) -> DeviceMaterials:
    """Per-lane material fetch with clamped ids (the GPU's defensive clamp,
    device_programs.cu:341-345)."""
    mid = jnp.clip(mat_id, 0, table.count - 1)
    return DeviceMaterials(
        base_color=table.base_color[mid],
        metallic=table.metallic[mid],
        roughness=table.roughness[mid],
        ior=table.ior[mid],
        mat_type=table.mat_type[mid],
        emission=table.emission[mid],
        transparency=table.transparency[mid],
        tex_id=table.tex_id[mid],
    )


# --- Preset library (Material.h:99-148) ---------------------------------------

def _material_cls():
    from spt_tpu.scene.desc import Material

    return Material


def gold() -> "Material":
    return _material_cls()([1.0, 0.71, 0.29], metallic=1.0, roughness=0.05)


def silver() -> "Material":
    return _material_cls()([0.95, 0.93, 0.88], metallic=1.0, roughness=0.02)


def copper() -> "Material":
    return _material_cls()([0.95, 0.64, 0.54], metallic=1.0, roughness=0.08)


def iron() -> "Material":
    return _material_cls()([0.56, 0.57, 0.58], metallic=1.0, roughness=0.3)


def plastic() -> "Material":
    return _material_cls()([0.8, 0.2, 0.2], metallic=0.0, roughness=0.4, ior=1.2)


def rubber() -> "Material":
    return _material_cls()([0.3, 0.3, 0.3], metallic=0.0, roughness=0.8, ior=1.1)


def glass() -> "Material":
    return _material_cls()([1.0, 1.0, 1.0], metallic=0.0, roughness=0.0, ior=1.5,
                           mat_type=MATERIAL_TYPE_DIELECTRIC)


def clear_glass() -> "Material":
    return _material_cls()([0.95, 0.98, 1.0], metallic=0.0, roughness=0.02,
                           ior=1.5, mat_type=MATERIAL_TYPE_DIELECTRIC)


def wood() -> "Material":
    return _material_cls()([0.4, 0.25, 0.1], metallic=0.0, roughness=0.7, ior=1.0)


def concrete() -> "Material":
    return _material_cls()([0.6, 0.6, 0.6], metallic=0.0, roughness=0.9, ior=1.0)


def light(color=(1.0, 1.0, 1.0), intensity: float = 5.0) -> "Material":
    return _material_cls()([0.0, 0.0, 0.0], metallic=0.0, roughness=1.0,
                           emission=np.asarray(color, np.float32) * intensity)


def default_materials() -> List["Material"]:
    """The 9-entry default table (MaterialManager.cpp:21-52):
    gold, silver, copper, iron, glass(DIELECTRIC), plastic, rubber, wood,
    concrete."""
    return [gold(), silver(), copper(), iron(), glass(),
            plastic(), rubber(), wood(), concrete()]


# --- component-SoA gather -----------------------------------------------------

from spt_tpu.ops.vec3 import Vec3  # noqa: E402
from typing import NamedTuple as _NT  # noqa: E402


class LaneMaterials(_NT):
    """Per-lane material parameters in Vec3/lane layout."""

    base_color: Vec3
    metallic: "jnp.ndarray"
    roughness: "jnp.ndarray"
    ior: "jnp.ndarray"
    mat_type: "jnp.ndarray"
    emission: Vec3
    transparency: "jnp.ndarray"
    tex_id: "jnp.ndarray"


def gather_v(table: DeviceMaterials, mat_id) -> LaneMaterials:
    """Per-lane material fetch, Vec3 layout (clamped ids,
    device_programs.cu:341-345)."""
    mid = jnp.clip(mat_id, 0, table.count - 1)
    bc = table.base_color[mid]
    em = table.emission[mid]
    return LaneMaterials(
        base_color=Vec3(bc[..., 0], bc[..., 1], bc[..., 2]),
        metallic=table.metallic[mid],
        roughness=table.roughness[mid],
        ior=table.ior[mid],
        mat_type=table.mat_type[mid],
        emission=Vec3(em[..., 0], em[..., 1], em[..., 2]),
        transparency=table.transparency[mid],
        tex_id=table.tex_id[mid],
    )
