"""Backward-kernel store policy x tile-rows sweep at 1080p.

Times pallas_trace_grad alone (fixed cotangents) across
(half_stores, tile_rows) configurations.  r5 question: does halving the
per-bounce carry stores (recompute odd carries in the reverse sweep) or a
bigger grad tile beat the r4 default (full stores, 16 rows)?

Run on the real chip: python benchmarks/exp_bwd_stores.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu", jax.default_backend()
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt import CameraConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.kernels.trace_grad import pallas_trace_grad

    W, H = 1920, 1080
    ray_depth, spp, counts = 13, 1, (48, 7)
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, W, H)
    focal = jnp.float32(cam.focal_length)
    ap = jnp.float32(cam.aperture_diameter)
    rng = np.random.default_rng(5)
    g_rad = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    g_md = jnp.asarray(rng.normal(size=(spp, 3, H, W)).astype(np.float32))
    g_mt = jnp.asarray(rng.normal(size=(spp, 3, H, W)).astype(np.float32))

    out = {}
    ref = None
    for half in (False, True):
        for rows in (8, 16, 24, 32):
            key = f"half={half},rows={rows}"

            def run(i):
                d_scene, _ip, _iv, _f, d_ap = pallas_trace_grad(
                    scene, inv_p, inv_v, jnp.int32(0), focal, ap,
                    g_rad, g_md, g_mt, width=W, height=H,
                    ray_depth=ray_depth, spp=spp, counts=counts,
                    tile_rows=rows, half_stores=half, rr=False)
                # sync via scalar fetch; also returns a checksum
                return float(jnp.sum(d_scene.sphere_material)) + float(d_ap)

            try:
                chk = run(0)
                run(1)
                ts = []
                for i in range(5):
                    t0 = time.time()
                    run(i + 2)
                    ts.append(time.time() - t0)
                med = float(np.median(ts))
                out[key] = {"ms": round(med * 1e3, 1),
                            "checksum": round(chk, 4)}
                if ref is None:
                    ref = chk
                # all configs must produce the same gradients
                assert abs(chk - ref) < 1e-3 * max(abs(ref), 1.0), \
                    (key, chk, ref)
            except Exception as e:  # noqa: BLE001 — record and continue
                out[key] = {"error": str(e)[:200]}
            print(key, out[key], flush=True)

    with open("artifacts/bwd_stores_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
