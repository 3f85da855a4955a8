"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): 3DGS render FPS @800² — the reference's CUDA
diff-gaussian-rasterization path on A100 (ashawkey fork used at
`MVs_Algorithms/GaussianSplatting/main_3DGS_renderer.py:840-948`) renders
a typical optimized asset (~100k gaussians) at ≈120 FPS at 800²; that is
the vs_baseline denominator.

Also measured (stderr, human-readable): TripoSR 512² image → scene codes
wall-clock, and the fwd+bwd 3DGS training-step time that bounds per-asset
optimization throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_comfy3d")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FPS_800 = 120.0   # CUDA rasterizer on A100, ~100k gaussians @800²


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_gs_render(n_gauss=100_000, size=800, iters=20):
    from comfy3d_tpu.core.camera import Camera
    from comfy3d_tpu.core.gaussian import GaussianSplat
    from comfy3d_tpu.ops import gs_render

    splat = GaussianSplat.random(jax.random.PRNGKey(0), n_gauss,
                                 sh_degree=0, radius=0.8)
    # realistic asset: small splats, moderate opacity
    import dataclasses
    splat = dataclasses.replace(
        splat,
        scale_raw=jnp.full_like(splat.scale_raw, np.log(0.01)),
        opacity_raw=jnp.full_like(splat.opacity_raw, 1.0))
    cam = Camera.from_orbit(15.0, 30.0, 2.2, width=size, height=size)

    fn = jax.jit(lambda s: gs_render.render(
        s, cam, max_per_tile=1024, chunk=32)["image"])
    img = fn(splat)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(iters):
        img = fn(splat)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / iters
    log(f"[bench] 3DGS fwd {n_gauss} gaussians @{size}²: "
        f"{dt * 1000:.2f} ms = {1 / dt:.1f} FPS")
    return 1.0 / dt


def bench_triposr_forward():
    from comfy3d_tpu.models.triposr import TripoSRPipeline

    pipe = TripoSRPipeline.init_random()
    img = np.random.RandomState(0).rand(1, 512, 512, 3).astype(np.float32)
    codes = pipe.scene_codes(img)
    jax.block_until_ready(codes)
    t0 = time.perf_counter()
    for _ in range(5):
        codes = pipe.scene_codes(img)
    jax.block_until_ready(codes)
    dt = (time.perf_counter() - t0) / 5
    log(f"[bench] TripoSR 512² image → scene codes: {dt * 1000:.0f} ms")
    return dt


def main():
    dev = jax.devices()[0]
    log(f"[bench] device: {dev}")
    fps = bench_gs_render()
    try:
        bench_triposr_forward()
    except Exception as e:  # secondary metric must not kill the bench
        log(f"[bench] triposr forward failed: {e}")
    print(json.dumps({
        "metric": "3dgs_render_fps_800px_100k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS_800, 4),
    }))


if __name__ == "__main__":
    main()
