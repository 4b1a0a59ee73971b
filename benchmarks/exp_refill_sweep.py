"""Sweep the refill block size (n_frames per launch) at 1080p.

Larger blocks amortize the straggler tail over more frames but pay more
per-iteration slot-flush selects (n_frames * 6 masked writes per
iteration) and a bigger VMEM miss buffer.  Reports ms/frame and Mrays/s
per block size; run on the real chip.
"""
import json, sys, time
sys.path.insert(0, ".")

def main():
    import jax, jax.numpy as jnp, numpy as np
    assert jax.default_backend() == "tpu", jax.default_backend()
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt import CameraConfig, demo_scene, init_accumulator
    from tpt.camera import camera_matrices
    from tpt.config import AtmosphereConfig
    from tpt.env import pack_block_table
    from tpt.kernels.render import progressive_frames
    from tpt.sky import compute_atmosphere

    width, height = 1920, 1080
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, width, height)
    env_table = pack_block_table(compute_atmosphere(AtmosphereConfig()))
    focal, ap = jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter)

    out = {}
    for chunk in (8, 16, 30, 45, 60):
        def block(accum, f0):
            return progressive_frames(
                accum, scene, env_table, inv_p, inv_v, jnp.int32(f0),
                focal, ap, width=width, height=height, ray_depth=13,
                spp=1, counts=(48, 7), n_frames=chunk, refill=True)
        acc = init_accumulator(height, width)
        for i in range(2):        # compile + warm
            acc, rays = block(acc, i * chunk)
            int(rays)
        times, rcs = [], []
        for i in range(2, 8):
            t0 = time.time()
            acc, rays = block(acc, i * chunk)
            r = int(rays)         # sync via scalar fetch (axon tunnel)
            times.append(time.time() - t0)
            rcs.append(r)
        med = float(np.median(times))
        out[chunk] = {"ms_per_frame": round(med / chunk * 1e3, 2),
                      "mrays": round(np.mean(rcs) / med / 1e6, 1)}
        print(chunk, out[chunk], flush=True)
    with open("artifacts/refill_sweep.json", "w") as f:
        json.dump(out, f, indent=1)

if __name__ == "__main__":
    main()
