"""Material model.

Eight parameters with the reference's 4-vec4 GPU layout
(reference: src/Material.cs:36-51):

    lane  0..2  albedo.rgb        lane  3  specular_chance
    lane  4..6  emissive.rgb      lane  7  specular_roughness
    lane  8..10 absorbance.rgb    lane 11  refraction_chance
    lane 12 refraction_roughness  lane 13  ior   lanes 14,15 pad

Constructor clamping follows src/Material.cs:26-29:
  specular_chance  in [0, 1]
  refraction_chance in [0, 1 - specular_chance]
  ior >= 1
so diffuse = 1 - specular - refraction stays non-negative
(src/Material.cs:21).  Direct field writes in the reference bypass the clamp
(LoadScene builds some materials that way, src/MainWindow.cs:225-241), so the
:func:`raw` constructor skips clamping too.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

MATERIAL_WIDTH = 16  # floats per material (4 x vec4)

# lane indices
ALBEDO = slice(0, 3)
SPECULAR_CHANCE = 3
EMISSIVE = slice(4, 7)
SPECULAR_ROUGHNESS = 7
ABSORBANCE = slice(8, 11)
REFRACTION_CHANCE = 11
REFRACTION_ROUGHNESS = 12
IOR = 13

Vec3 = Tuple[float, float, float]


@dataclasses.dataclass
class Material:
    albedo: Vec3 = (1.0, 1.0, 1.0)
    emissive: Vec3 = (0.0, 0.0, 0.0)
    absorbance: Vec3 = (0.0, 0.0, 0.0)
    specular_chance: float = 0.0
    specular_roughness: float = 0.0
    ior: float = 1.0
    refraction_chance: float = 0.0
    refraction_roughness: float = 0.0

    @staticmethod
    def make(albedo, emissive, absorbance, specular_chance, specular_roughness,
             ior, refraction_chance, refraction_roughness) -> "Material":
        """Clamping constructor (src/Material.cs:19-31)."""
        spec = float(np.clip(specular_chance, 0.0, 1.0))
        return Material(
            albedo=tuple(map(float, albedo)),
            emissive=tuple(map(float, emissive)),
            absorbance=tuple(map(float, absorbance)),
            specular_chance=spec,
            specular_roughness=float(specular_roughness),
            ior=float(max(ior, 1.0)),
            refraction_chance=float(np.clip(refraction_chance, 0.0, 1.0 - spec)),
            refraction_roughness=float(refraction_roughness),
        )

    @staticmethod
    def zero() -> "Material":
        """Material.Zero: white albedo, everything else off (src/Material.cs:8)."""
        return Material.make((1.0, 1.0, 1.0), (0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                             0.0, 0.0, 1.0, 0.0, 0.0)

    def to_array(self) -> np.ndarray:
        """Flat 16-float GPU layout (src/Material.cs:36-51)."""
        out = np.zeros(MATERIAL_WIDTH, np.float32)
        out[ALBEDO] = self.albedo
        out[SPECULAR_CHANCE] = self.specular_chance
        out[EMISSIVE] = self.emissive
        out[SPECULAR_ROUGHNESS] = self.specular_roughness
        out[ABSORBANCE] = self.absorbance
        out[REFRACTION_CHANCE] = self.refraction_chance
        out[REFRACTION_ROUGHNESS] = self.refraction_roughness
        out[IOR] = self.ior
        return out

    @staticmethod
    def from_array(a) -> "Material":
        a = np.asarray(a, np.float32)
        return Material(
            albedo=tuple(a[ALBEDO].tolist()),
            emissive=tuple(a[EMISSIVE].tolist()),
            absorbance=tuple(a[ABSORBANCE].tolist()),
            specular_chance=float(a[SPECULAR_CHANCE]),
            specular_roughness=float(a[SPECULAR_ROUGHNESS]),
            ior=float(a[IOR]),
            refraction_chance=float(a[REFRACTION_CHANCE]),
            refraction_roughness=float(a[REFRACTION_ROUGHNESS]),
        )


def edit_material(m: Material, **params) -> Material:
    """Apply GUI-panel edits with the reference's per-edit clamp semantics
    (GameObjectProperties window, src/Render/Gui.cs:156-218).

    Unlike the constructor (src/Material.cs:26-29), which always rewrites
    refraction_chance to fit 1-spec, the panel clamps the *edited*
    parameter against the untouched one and leaves the other alone:

      specular_chance   -> clamp(v, 0, 1 - refraction_chance)  (Gui.cs:193)
      refraction_chance -> clamp(v, 0, 1 - specular_chance)    (Gui.cs:205)

    Roughnesses and IOR land in their slider ranges ([0,1] / [1,5],
    Gui.cs:196-201); the color triples (InputFloat3) are set verbatim.
    Edits apply sequentially in the order given.
    """
    for key, value in params.items():
        if key in ("albedo", "emissive", "absorbance"):
            value = tuple(map(float, value))
        elif key == "specular_chance":
            value = float(np.clip(value, 0.0, 1.0 - m.refraction_chance))
        elif key == "refraction_chance":
            value = float(np.clip(value, 0.0, 1.0 - m.specular_chance))
        elif key in ("specular_roughness", "refraction_roughness"):
            value = float(np.clip(value, 0.0, 1.0))
        elif key == "ior":
            value = float(np.clip(value, 1.0, 5.0))
        else:
            raise TypeError(f"unknown material parameter {key!r}")
        m = dataclasses.replace(m, **{key: value})
    return m


def random_material(rng: np.random.Generator) -> Material:
    """Random material a la Material.GetRndMaterial (src/Material.cs:54-58):
    20% chance emissive; spec/refr chances drawn in [0, 0.5)."""
    def v3():
        return tuple(rng.random(3).astype(float))

    emissive = v3() if rng.random() < 0.2 else (0.0, 0.0, 0.0)
    absorb = tuple(2.0 * c for c in v3())
    return Material.make(
        albedo=v3(), emissive=emissive, absorbance=absorb,
        specular_chance=rng.random() * 0.5,
        specular_roughness=rng.random(),
        ior=rng.random() + 1.0,
        refraction_chance=rng.random() * 0.5,
        refraction_roughness=rng.random(),
    )
