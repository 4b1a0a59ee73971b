"""Scene editing API tests (GUI object-edit / random-material parity)."""

import numpy as np

from tpt.materials import Material
from tpt.scene import (CuboidObject, SphereObject, demo_scene,
                       randomize_materials, update_cuboid, update_sphere)


def test_update_sphere():
    scene = demo_scene().build()
    m = Material.make((0.1, 0.2, 0.3), (0, 0, 0), (0, 0, 0), 0.5, 0.1, 1.2, 0.2, 0.0)
    s2 = update_sphere(scene, 5, position=(1.0, 2.0, 3.0), radius=2.5, material=m)
    np.testing.assert_allclose(np.asarray(s2.sphere_pos_radius)[5],
                               (1.0, 2.0, 3.0, 2.5))
    np.testing.assert_allclose(np.asarray(s2.sphere_material)[5], m.to_array())
    # untouched slots identical
    np.testing.assert_array_equal(np.asarray(s2.sphere_pos_radius)[:5],
                                  np.asarray(scene.sphere_pos_radius)[:5])


def test_update_cuboid_center_dimensions():
    scene = demo_scene().build()
    s2 = update_cuboid(scene, 2, position=(0, 0, 0), dimensions=(2, 4, 6))
    np.testing.assert_allclose(np.asarray(s2.cuboid_min)[2], (-1, -2, -3))
    np.testing.assert_allclose(np.asarray(s2.cuboid_max)[2], (1, 2, 3))
    # dimension-only edit preserves center
    s3 = update_cuboid(s2, 2, dimensions=(1, 1, 1))
    np.testing.assert_allclose(
        (np.asarray(s3.cuboid_min)[2] + np.asarray(s3.cuboid_max)[2]) / 2,
        (0, 0, 0), atol=1e-6)


def test_randomize_materials():
    b = demo_scene()
    rng = np.random.default_rng(42)
    before = [o.material for o in b.objects if isinstance(o, SphereObject)]
    n = randomize_materials(b, 36, SphereObject, rng)
    assert n == 36
    after = [o.material for o in b.objects if isinstance(o, SphereObject)]
    changed = sum(1 for x, y in zip(before, after) if x != y)
    assert changed == 36
    # cuboids untouched
    assert all(isinstance(o, (SphereObject, CuboidObject)) for o in b.objects)
    # clamp invariants hold on the random materials (src/Material.cs:26-29)
    for o in b.objects[:36]:
        m = o.material
        assert 0.0 <= m.specular_chance <= 1.0
        assert 0.0 <= m.refraction_chance <= 1.0 - m.specular_chance + 1e-6
        assert m.ior >= 1.0
    scene = b.build()  # still builds fine
    assert int(scene.num_spheres) == 48
