"""Scene model, material clamping, std140 round-trip, demo-scene constants."""

import numpy as np
import pytest

from tpt.materials import Material
from tpt.scene import (SceneBuilder, demo_scene, cornell_scene,
                       pack_std140, unpack_std140, STD140_TOTAL_FLOATS)
from tpt.config import MAX_SPHERES, MAX_CUBOIDS


def test_material_clamping():
    # src/Material.cs:26-29
    m = Material.make((1, 1, 1), (0, 0, 0), (0, 0, 0),
                      specular_chance=1.5, specular_roughness=0.3,
                      ior=0.5, refraction_chance=0.9, refraction_roughness=0.2)
    assert m.specular_chance == 1.0
    assert m.refraction_chance == 0.0  # clamped to 1 - spec
    assert m.ior == 1.0
    m2 = Material.make((1, 1, 1), (0, 0, 0), (0, 0, 0), 0.3, 0.0, 1.2, 0.9, 0.0)
    assert m2.refraction_chance == pytest.approx(0.7)


def test_edit_material_gui_clamp_semantics():
    # GameObjectProperties edits clamp the EDITED parameter against the
    # untouched one (src/Render/Gui.cs:190-206) — unlike the constructor,
    # which rewrites refraction to fit 1-spec (src/Material.cs:26-29)
    from tpt.materials import edit_material
    glass = Material.make((1, 1, 1), (0, 0, 0), (0, 0, 0), 0.0, 0.0,
                          1.1, 0.9, 0.0)
    m = edit_material(glass, specular_chance=0.5)
    assert m.specular_chance == pytest.approx(0.1)   # clamped to 1 - refr
    assert m.refraction_chance == pytest.approx(0.9)  # untouched
    m = edit_material(glass, refraction_chance=1.3)
    assert m.refraction_chance == pytest.approx(1.0)  # spec is 0 here
    # slider ranges (Gui.cs:196-209) and InputFloat3 passthrough
    m = edit_material(glass, ior=0.2, specular_roughness=-1.0,
                      albedo=(2.0, 3.0, 4.0))
    assert m.ior == 1.0 and m.specular_roughness == 0.0
    assert m.albedo == (2.0, 3.0, 4.0)
    with pytest.raises(TypeError):
        edit_material(glass, bogus=1.0)


def test_material_layout_roundtrip():
    m = Material.make((0.1, 0.2, 0.3), (1, 2, 3), (0.5, 0.6, 0.7),
                      0.25, 0.4, 1.33, 0.5, 0.9)
    a = m.to_array()
    assert a.shape == (16,)
    # std140 4-vec4 packing (src/Material.cs:36-51)
    np.testing.assert_allclose(a[0:3], (0.1, 0.2, 0.3), rtol=1e-6)
    assert a[3] == np.float32(0.25)
    np.testing.assert_allclose(a[4:7], (1, 2, 3))
    assert a[7] == np.float32(0.4)
    np.testing.assert_allclose(a[8:11], (0.5, 0.6, 0.7), rtol=1e-6)
    assert a[11] == np.float32(0.5)
    assert a[12] == np.float32(0.9)
    assert a[13] == np.float32(1.33)
    m2 = Material.from_array(a)
    assert m2 == Material.from_array(m2.to_array())


def test_demo_scene_counts_and_constants():
    b = demo_scene()
    assert len(b.spheres) == 48
    assert len(b.cuboids) == 7
    s = b.build()
    assert int(s.num_spheres) == 48
    assert int(s.num_cuboids) == 7
    spr = np.asarray(s.sphere_pos_radius)
    # first grid sphere at x=0,y=0 (src/MainWindow.cs:220)
    np.testing.assert_allclose(spr[0, :3], (-12.0, -11.2, -5.0), atol=1e-5)
    assert spr[0, 3] == np.float32(1.3)
    # grid material ramps: sphere (x=5,y=0) has spec chance 1.0
    smat = np.asarray(s.sphere_material)
    assert smat[5 * 6 + 0, 3] == np.float32(1.0)
    # red glass spheres at indices 36, 38, ...: refr 0.98, ior 1.05
    assert smat[36, 11] == np.float32(0.98)
    assert smat[36, 13] == np.float32(1.05)
    # absorbance ramp (1,2,3) * x/6
    np.testing.assert_allclose(smat[38, 8:11], np.array([1, 2, 3.0]) / 6, rtol=1e-5)
    # cuboids: area light emissive (0.917,0.945,0.513)*5 at slot 1
    cmat = np.asarray(s.cuboid_material)
    np.testing.assert_allclose(cmat[1, 4:7], np.array([0.917, 0.945, 0.513]) * 5, rtol=1e-5)
    # gold mirror wall: spec 1.0, roughness 0.19 at slot 4
    assert cmat[4, 3] == np.float32(1.0)
    assert cmat[4, 7] == np.float32(0.19)
    # floor cuboid min/max
    cmin = np.asarray(s.cuboid_min)
    cmax = np.asarray(s.cuboid_max)
    np.testing.assert_allclose(cmin[0], (-20.0, -12.5 - 0.0025, -22.5), atol=1e-5)
    np.testing.assert_allclose(cmax[0], (20.0, -12.5 + 0.0025, 2.5), atol=1e-5)


def test_std140_roundtrip():
    b = demo_scene()
    scene = b.build()
    buf = pack_std140(scene)
    assert buf.size == STD140_TOTAL_FLOATS
    assert buf.size * 4 == 26624  # reference UBO size (src/MainWindow.cs:200)
    scene2 = unpack_std140(buf, int(scene.num_spheres), int(scene.num_cuboids))
    np.testing.assert_array_equal(np.asarray(scene2.sphere_pos_radius),
                                  np.asarray(scene.sphere_pos_radius))
    np.testing.assert_array_equal(np.asarray(scene2.cuboid_min),
                                  np.asarray(scene.cuboid_min))
    np.testing.assert_array_equal(np.asarray(scene2.cuboid_material),
                                  np.asarray(scene.cuboid_material))
    # sphere slot i at byte offset 80*i; cuboid slot j at 80*256 + 96*j
    assert buf[20 * 3 + 3] == np.asarray(scene.sphere_pos_radius)[3, 3]
    cub0 = MAX_SPHERES * 20
    assert buf[cub0 + 4] == np.asarray(scene.cuboid_max)[0, 0]


def test_capacity_limits():
    b = SceneBuilder()
    m = Material.zero()
    for _ in range(MAX_SPHERES):
        b.add_sphere((0, 0, 0), 1.0, m)
    with pytest.raises(ValueError):
        b.add_sphere((0, 0, 0), 1.0, m)
    for _ in range(MAX_CUBOIDS):
        b.add_cuboid((0, 0, 0), (1, 1, 1), m)
    with pytest.raises(ValueError):
        b.add_cuboid((0, 0, 0), (1, 1, 1), m)


def test_cornell_scene():
    s = cornell_scene().build()
    assert int(s.num_spheres) == 4
    assert int(s.num_cuboids) == 0
