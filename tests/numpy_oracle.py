"""Independent scalar ground-truth path tracer in pure NumPy.

A deliberately naive, per-pixel Python transcription of the reference GLSL
integrator's *semantics* (res/shaders/PathTracing/compute.glsl) — including
its exact PCG stream, scan order, and branch-dependent draw counts — used as
the ground truth the JAX implementations must match.  It shares no code with
the `tpt` package.  Slow: use tiny images.

The two defined-behavior deviations documented in tpt.integrator are
mirrored here (TIR fallback to mirror reflection; guarded normalize).
"""

from __future__ import annotations

import math

import numpy as np

FLOAT_MAX = np.float32(3.4028235e38)
EPS = 0.001


class PCG:
    def __init__(self, seed: int):
        self.state = np.uint32(seed)

    def next_uint(self) -> int:
        with np.errstate(over="ignore"):
            s = self.state * np.uint32(747796405) + np.uint32(2891336453)
            shift = (s >> np.uint32(28)) + np.uint32(4)
            word = ((s >> shift) ^ s) * np.uint32(277803737)
            self.state = s
            return int((word >> np.uint32(22)) ^ word)

    def next_float(self) -> np.float32:
        return np.float32(np.float32(self.next_uint()) / np.float32(4294967296.0))


def normalize(v):
    n2 = float(v @ v)
    n2 = max(n2, 1e-20)
    return v / np.float32(math.sqrt(n2))


def reflect(i, n):
    return i - 2.0 * np.float32(i @ n) * n


def refract(i, n, eta):
    ndi = np.float32(i @ n)
    k = np.float32(1.0 - eta * eta * (1.0 - ndi * ndi))
    if k < 0.0:
        return np.zeros(3, np.float32), True
    return np.float32(eta) * i - (np.float32(eta) * ndi + np.float32(math.sqrt(k))) * n, False


def fresnel_schlick(cos_theta, n1, n2):
    r0 = (n1 - n2) / (n1 + n2)
    r0 *= r0
    return np.float32(r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5)


def cosine_sample_hemisphere(normal, rng: PCG):
    z = rng.next_float() * 2.0 - 1.0
    a = rng.next_float() * 2.0 * math.pi
    r = math.sqrt(max(1.0 - z * z, 0.0))
    x = r * math.cos(a)
    y = r * math.sin(a)
    return normalize(normal + np.array([x, y, z], np.float32))


def ray_sphere(o, d, c, radius):
    oc = o - c
    b = np.float32(d @ oc)
    cc = np.float32(oc @ oc) - np.float32(radius * radius)
    disc = b * b - cc
    if disc < 0.0:
        return None
    sq = np.float32(math.sqrt(disc))
    return -b - sq, -b + sq


def ray_cuboid(o, d, mn, mx):
    with np.errstate(divide="ignore", invalid="ignore"):
        t0s = (mn - o) / d
        t1s = (mx - o) / d
    tsm = np.minimum(t0s, t1s)
    tbg = np.maximum(t0s, t1s)
    t1 = np.float32(max(tsm[0], tsm[1], tsm[2], -FLOAT_MAX))
    t2 = np.float32(min(tbg[0], tbg[1], tbg[2], FLOAT_MAX))
    if t1 <= t2:
        return t1, t2
    return None


def sphere_normal(c, radius, p):
    return (p - c) / np.float32(radius)


def cuboid_normal(mn, mx, p):
    half = (mx - mn) * 0.5
    cs = p - (mx + mn) * 0.5
    n = np.zeros(3, np.float32)
    for ax in range(3):
        if abs(abs(cs[ax]) - half[ax]) <= EPS:
            n[ax] = math.copysign(1.0, cs[ax])
    return normalize(n)


class NumpyScene:
    """spheres: list of (center[3], radius, material dict);
    cuboids: list of (min[3], max[3], material dict).
    Material dict keys: albedo, emissive, absorb (np[3]);
    spec, spec_rough, refr, refr_rough, ior (floats)."""

    def __init__(self, spheres, cuboids):
        self.spheres = spheres
        self.cuboids = cuboids


def ray_trace(scene: NumpyScene, o, d):
    """The shader's order-dependent linear scan (compute.glsl:226-258)."""
    best_t = FLOAT_MAX
    hit = None
    for (c, radius, mat) in scene.spheres:
        r = ray_sphere(o, d, c, radius)
        if r is not None:
            t1, t2 = r
            if t2 > 0.0 and t1 < best_t:
                t = t2 if t1 < 0.0 else t1
                best_t = t
                p = o + d * t
                hit = dict(t=t, inside=(t == t2), mat=mat, pos=p,
                           normal=sphere_normal(c, radius, p))
    for (mn, mx, mat) in scene.cuboids:
        r = ray_cuboid(o, d, mn, mx)
        if r is not None:
            t1, t2 = r
            if t2 > 0.0 and t1 < best_t:
                t = t2 if t1 < 0.0 else t1
                best_t = t
                p = o + d * t
                hit = dict(t=t, inside=(t == t2), mat=mat, pos=p,
                           normal=cuboid_normal(mn, mx, p))
    return hit


def bsdf(ray_o, ray_d, hit, rng: PCG):
    mat = hit["mat"]
    n = hit["normal"]
    spec = float(mat["spec"])
    refr = float(mat["refr"])
    if spec > 0.0:
        n1 = mat["ior"] if hit["inside"] else 1.0
        n2 = 1.0 if hit["inside"] else mat["ior"]
        f = fresnel_schlick(float(-ray_d @ n), n1, n2)
        spec_new = spec + (1.0 - spec) * f
        diffuse = 1.0 - spec_new - refr
        refr = 1.0 - spec_new - diffuse
        spec = spec_new

    diffuse_ray = cosine_sample_hemisphere(n, rng)
    roll = rng.next_float()
    is_refractive = False
    if spec > roll:
        refl = reflect(ray_d, n)
        sr2 = np.float32(mat["spec_rough"] ** 2)
        new_d = normalize(refl + (diffuse_ray - refl) * sr2)
        p = spec
    elif spec + refr > roll:
        eta = mat["ior"] if hit["inside"] else 1.0 / mat["ior"]
        rdir, tir = refract(ray_d, n, eta)
        hemi = cosine_sample_hemisphere(-n, rng)
        rr2 = np.float32(mat["refr_rough"] ** 2)
        mixed = rdir + (hemi - rdir) * rr2
        if float(mixed @ mixed) > 1e-12:
            new_d = mixed / np.float32(math.sqrt(float(mixed @ mixed)))
        else:
            new_d = reflect(ray_d, n)
        p = refr
        is_refractive = True
    else:
        new_d = diffuse_ray
        p = 1.0 - spec - refr
    new_o = hit["pos"] + new_d * np.float32(EPS)
    return new_o, new_d, np.float32(max(p, EPS)), is_refractive


def radiance(scene, env_fn, o, d, ray_depth, rng: PCG):
    throughput = np.ones(3, np.float32)
    rad = np.zeros(3, np.float32)
    for _ in range(ray_depth):
        hit = ray_trace(scene, o, d)
        if hit is None:
            rad = rad + env_fn(d) * throughput
            break
        if hit["inside"]:
            hit["normal"] = -hit["normal"]
            throughput = throughput * np.exp(-hit["mat"]["absorb"] * hit["t"])
        o, d, p, is_refr = bsdf(o, d, hit, rng)
        rad = rad + hit["mat"]["emissive"] * throughput
        if not is_refr:
            throughput = throughput * hit["mat"]["albedo"]
        throughput = throughput / p
        pmax = float(throughput.max())
        if rng.next_float() > pmax:
            break
        throughput = throughput / np.float32(pmax)
    return rad


def render(scene, env_fn, inv_proj, inv_view, view_pos, width, height,
           frame, ray_depth, spp, focal_length, aperture):
    """Returns f32[height, width, 3], row 0 = bottom (GL order)."""
    inv_proj = np.asarray(inv_proj, np.float32)
    inv_view = np.asarray(inv_view, np.float32)
    view_pos = np.asarray(view_pos, np.float32)
    img = np.zeros((height, width, 3), np.float32)
    for y in range(height):
        for x in range(width):
            with np.errstate(over="ignore"):
                seed = (np.uint32(x) * np.uint32(1973)
                        + np.uint32(y) * np.uint32(9277)
                        + np.uint32(frame) * np.uint32(2699)) | np.uint32(1)
            rng = PCG(int(seed))
            irr = np.zeros(3, np.float32)
            for _ in range(spp):
                jx = rng.next_float()
                jy = rng.next_float()
                u = (x + jx) / width * 2.0 - 1.0
                v = (y + jy) / height * 2.0 - 1.0
                eye = inv_proj @ np.array([u, v, -1.0, 0.0], np.float32)
                eye[2], eye[3] = -1.0, 0.0
                d = normalize((inv_view @ eye)[:3])
                o = view_pos.copy()
                focal_point = o + d * np.float32(focal_length)
                angle = rng.next_float() * 2.0 * math.pi
                r = math.sqrt(rng.next_float())
                off = np.float32(aperture * 0.5) * np.array(
                    [math.cos(angle) * r, math.sin(angle) * r], np.float32)
                o = (inv_view @ np.array([off[0], off[1], 0.0, 1.0], np.float32))[:3]
                d = normalize(focal_point - o)
                irr += radiance(scene, env_fn, o, d, ray_depth, rng)
            img[y, x] = irr / np.float32(spp)
    return img


def scene_from_tpt(scene) -> NumpyScene:
    """Convert a tpt Scene pytree into this module's representation."""
    spr = np.asarray(scene.sphere_pos_radius)
    smat = np.asarray(scene.sphere_material)
    cmin = np.asarray(scene.cuboid_min)
    cmax = np.asarray(scene.cuboid_max)
    cmat = np.asarray(scene.cuboid_material)

    def mat(row):
        return dict(albedo=row[0:3], spec=float(row[3]), emissive=row[4:7],
                    spec_rough=float(row[7]), absorb=row[8:11],
                    refr=float(row[11]), refr_rough=float(row[12]),
                    ior=float(row[13]))

    ns = int(scene.num_spheres)
    nc = int(scene.num_cuboids)
    spheres = [(spr[i, :3].copy(), float(spr[i, 3]), mat(smat[i])) for i in range(ns)]
    cuboids = [(cmin[i].copy(), cmax[i].copy(), mat(cmat[i])) for i in range(nc)]
    return NumpyScene(spheres, cuboids)
