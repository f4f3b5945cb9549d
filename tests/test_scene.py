"""Scene description, builders, flattening."""

import numpy as np

from spt_tpu import materials as mats
from spt_tpu.scene import (
    SceneDesc,
    build_cornell_box_scene,
    build_default_scene,
    build_test_triangle_scene,
    create_cube_mesh,
    create_ground_plane_mesh,
    create_sphere_mesh,
    flatten_scene,
)
from spt_tpu.scene.desc import Material, translate, scale


class TestPrimitives:
    def test_cube(self):
        cube = create_cube_mesh(3)
        assert cube.vertex_count == 8
        assert cube.triangle_count == 12
        assert cube.material_id == 3
        assert np.allclose(np.abs(cube.positions), 0.5)

    def test_ground_plane(self):
        g = create_ground_plane_mesh(10.0, 1)
        assert g.vertex_count == 4 and g.triangle_count == 2
        assert np.allclose(g.positions[:, 1], 0.0)
        assert np.allclose(g.normals, [0, 1, 0])

    def test_uv_sphere(self):
        s = create_sphere_mesh(stacks=8, slices=16, radius=2.0)
        assert s.vertex_count == 9 * 17
        assert s.triangle_count == 8 * 16 * 2
        r = np.linalg.norm(s.positions, axis=-1)
        np.testing.assert_allclose(r, 2.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(s.normals, axis=-1), 1.0, atol=1e-5)


class TestDefaultScene:
    def test_inventory(self):
        sc = build_default_scene()
        # SceneBuilder.cpp:9-123: 9 materials, 1 mesh, 8 spheres, 1 instance.
        assert len(sc.materials) == 9
        assert len(sc.meshes) == 1
        assert len(sc.spheres) == 8
        assert len(sc.instances) == 1
        assert sc.total_triangles == 12

    def test_material_table_matches_manager(self):
        # MaterialManager.cpp:21-52 ordering; Glass at index 4 is tagged.
        sc = build_default_scene()
        assert sc.materials[4].mat_type == 1
        np.testing.assert_allclose(sc.materials[0].base_color, [1.0, 0.71, 0.29])
        assert sc.materials[0].metallic == 1.0
        assert sc.materials[8].roughness == 0.9

    def test_sphere_layout(self):
        sc = build_default_scene()
        np.testing.assert_allclose(sc.spheres[0].center, [-3, 1, 0])
        assert sc.spheres[0].material_id == 0
        assert sc.spheres[7].material_id == 8

    def test_glass_cube_transform(self):
        sc = build_default_scene()
        dev = flatten_scene(sc)
        v0 = np.asarray(dev.tri_v0[:12])
        e1 = np.asarray(dev.tri_e1[:12])
        e2 = np.asarray(dev.tri_e2[:12])
        verts = np.concatenate([v0, v0 + e1, v0 + e2])
        # scale 1.5 centered at (0,1,2): extents ±0.75 around the center
        np.testing.assert_allclose(verts.min(0), [-0.75, 0.25, 1.25], atol=1e-6)
        np.testing.assert_allclose(verts.max(0), [0.75, 1.75, 2.75], atol=1e-6)
        assert np.all(np.asarray(dev.tri_mat[:12]) == 4)


class TestFlatten:
    def test_padding_is_inert(self):
        sc = build_test_triangle_scene()
        dev = flatten_scene(sc, pad_multiple=8)
        assert dev.num_triangles % 8 == 0
        assert dev.num_spheres % 8 == 0
        # padded triangles are degenerate, padded spheres radius 0
        pad_e1 = np.asarray(dev.tri_e1[2:])  # 2 real instances of 1 tri
        assert np.all(pad_e1 == 0.0)
        assert np.all(np.asarray(dev.sph_radius[1:]) == 0.0)

    def test_no_padding_by_default(self):
        sc = build_test_triangle_scene()
        dev = flatten_scene(sc)
        assert dev.num_triangles == 2   # exactly the two instances
        assert dev.num_spheres == 1

    def test_material_resolution_order(self):
        # instance override > mesh material > 0 (EmbreeBackend.cpp:51-57)
        sc = SceneDesc()
        sc.add_material(Material([1, 0, 0]))
        sc.add_material(Material([0, 1, 0]))
        sc.add_material(Material([0, 0, 1]))
        cube = create_cube_mesh(material_id=1)
        mid = sc.add_mesh(cube)
        sc.add_instance(mid)                     # -> mesh material 1
        sc.add_instance(mid, material_id=2)      # -> override 2
        dev = flatten_scene(sc)
        assert np.all(np.asarray(dev.tri_mat[:12]) == 1)
        assert np.all(np.asarray(dev.tri_mat[12:24]) == 2)

    def test_transform_bake(self):
        sc = SceneDesc()
        sc.add_material(Material())
        mid = sc.add_mesh(create_cube_mesh())
        xf = scale(translate(np.eye(4, dtype=np.float32), [10.0, 0.0, 0.0]), 2.0)
        sc.add_instance(mid, xf)
        dev = flatten_scene(sc)
        v0 = np.asarray(dev.tri_v0[:12])
        e1 = np.asarray(dev.tri_e1[:12])
        e2 = np.asarray(dev.tri_e2[:12])
        verts = np.concatenate([v0, v0 + e1, v0 + e2])
        np.testing.assert_allclose(verts.min(0), [9, -1, -1], atol=1e-6)
        np.testing.assert_allclose(verts.max(0), [11, 1, 1], atol=1e-6)


class TestMaterials:
    def test_derived_quantities(self):
        glass_like = Material([1, 1, 1], metallic=0.0, ior=1.5)
        assert glass_like.is_transparent()
        np.testing.assert_allclose(glass_like.get_transparency(), 0.5 / 0.7, rtol=1e-6)
        metal = Material([1, 1, 1], metallic=1.0, ior=1.5)
        assert not metal.is_transparent()
        assert metal.get_transparency() == 0.0

    def test_device_table(self):
        table = mats.build_device_materials(mats.default_materials())
        assert table.count == 9
        assert int(table.mat_type[4]) == 1      # glass tagged dielectric
        got = mats.gather(table, np.array([0, 4, 100]))  # clamped id
        np.testing.assert_allclose(np.asarray(got.base_color[0]), [1.0, 0.71, 0.29])
        assert int(got.mat_type[1]) == 1
        np.testing.assert_allclose(np.asarray(got.base_color[2]), [0.6, 0.6, 0.6])

    def test_emissive_preset(self):
        l = mats.light((1.0, 0.5, 0.25), 4.0)
        assert l.is_emissive()
        np.testing.assert_allclose(l.emission, [4.0, 2.0, 1.0])


class TestCornellBox:
    def test_builds_and_flattens(self):
        sc = build_cornell_box_scene()
        dev = flatten_scene(sc)
        assert dev.num_triangles >= 12
        assert dev.num_spheres >= 2
        em = np.asarray(dev.materials.emission)
        assert em.max() > 1.0  # has an emitter
