"""In-tree profiler tooling (SURVEY §5.1's TPU plan).

The reference brackets its loops with `torch.cuda.Event` timer pairs it
then discards (`MVs_Algorithms/GaussianSplatting/main_3DGS.py:130-132`)
and a `synchronize_timer` context (`Hunyuan3D_2_1/hy3dshape/hy3dshape/
pipelines.py:617`). Here the equivalents are reusable and artifact-
producing:

* `trace(path)` — context manager around `jax.profiler` that writes a
  perfetto/tensorboard trace directory a user can open; no-ops cleanly
  if profiling is unsupported on the backend.
* `maybe_trace(tag)` — honors `COMFY3D_TRACE`; set `COMFY3D_TRACE=1`
  (or a directory path) and every bench / workflow execution wraps
  itself in a trace written under `output/traces/<tag>/`.
* `timed(label)` — a `block_until_ready` wall-clock phase timer that
  logs through `core.log` (the reference's progress-print role).
"""

from __future__ import annotations

import contextlib
import os
import time


def _default_trace_root() -> str:
    return os.path.join(os.environ.get("COMFY3D_OUTPUT_DIR", "output"),
                        "traces")


@contextlib.contextmanager
def trace(path: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace into `path` (a directory).

    The artifact is a TensorBoard/perfetto-compatible trace; view with
    `tensorboard --logdir <path>` or ui.perfetto.dev. Exceptions from
    unsupported backends (some remote-device tunnels cannot profile)
    are caught and reported, never raised — profiling must not break
    the workload it measures.
    """
    import jax
    os.makedirs(path, exist_ok=True)
    started = False
    try:
        jax.profiler.start_trace(path,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception as e:   # pragma: no cover - backend dependent
        print(f"[comfy3d.profiling] trace unavailable: {e}")
    try:
        yield path
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"[comfy3d.profiling] trace written to {path}")
            except Exception as e:   # pragma: no cover
                print(f"[comfy3d.profiling] trace stop failed: {e}")


def trace_enabled() -> bool:
    v = os.environ.get("COMFY3D_TRACE", "")
    return bool(v) and v != "0"


@contextlib.contextmanager
def maybe_trace(tag: str):
    """`trace()` under `output/traces/<tag>-<stamp>/` when COMFY3D_TRACE
    is set (any truthy value; a path value overrides the root), else a
    no-op. This is the hook bench.py and the workflow executor use."""
    if not trace_enabled():
        yield None
        return
    v = os.environ["COMFY3D_TRACE"]
    root = v if v not in ("1", "true", "yes") else _default_trace_root()
    path = os.path.join(root, f"{tag}-{int(time.time())}")
    with trace(path):
        yield path


@contextlib.contextmanager
def timed(label: str, result=None):
    """Wall-clock phase timer; blocks on `result` (pytree of arrays or a
    callable returning one) before reading the clock so device work is
    actually included."""
    t0 = time.perf_counter()
    out = {}
    try:
        yield out
    finally:
        if result is not None:
            import jax
            jax.block_until_ready(result() if callable(result) else result)
        out["seconds"] = time.perf_counter() - t0
        print(f"[comfy3d.profiling] {label}: {out['seconds']*1000:.1f} ms")
