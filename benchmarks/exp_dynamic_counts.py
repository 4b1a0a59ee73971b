"""Static vs dynamic primitive-count kernels at 1080p (the scene-edit path).

Static counts bake the 55-iteration scan into the program (full unroll,
SMEM reads hoisted); dynamic counts read trip counts from SMEM so ONE
compilation serves any scene (the viewer's add/remove path would use it).
Quantifies the cliff the r4 verdict flagged as unmeasured.
"""
import json, sys, time
sys.path.insert(0, ".")

def main():
    import jax, jax.numpy as jnp, numpy as np
    assert jax.default_backend() == "tpu", jax.default_backend()
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt import CameraConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.kernels.trace import pallas_trace, pallas_trace_progressive

    W, H, F = 1920, 1080, 30
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, W, H)
    focal, ap = jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter)

    out = {}
    for name, counts in (("static", (48, 7)), ("dynamic", None)):
        def block(f0):
            res = pallas_trace_progressive(
                scene, inv_p, inv_v, jnp.int32(f0), focal, ap, width=W,
                height=H, ray_depth=13, spp=1, n_frames=F, counts=counts)
            return jnp.sum(res.ray_count)
        t0 = time.time(); int(block(0)); compile_s = time.time() - t0
        int(block(F))
        ts = []
        for i in range(5):
            t0 = time.time(); int(block((i + 2) * F))
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        out[name] = {"ms_per_frame": round(med / F * 1e3, 2),
                     "compile_s": round(compile_s, 1)}
        print(name, out[name], flush=True)
    out["dynamic_over_static"] = round(
        out["dynamic"]["ms_per_frame"] / out["static"]["ms_per_frame"], 2)
    with open("artifacts/dynamic_counts.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
