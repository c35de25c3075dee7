"""dfu3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of DFU3D.

Reference capabilities (see SURVEY.md): OpenPCDet-style 3D detection (CenterPoint first),
KITTI-protocol evaluation, nuScenes→KITTI conversion, and the DFU3D pseudo-box factory
(LiDAR-camera data-level fusion, noise suppression, L-shape box fitting, self-evolution).

This is a ground-up TPU-first design: static-shape mask-padded tensors, pure-functional
transforms, `jax.sharding.Mesh` data parallelism, and Pallas kernels for hot ops.
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compile_cache():
    """Point JAX at an on-disk compilation cache so repeated runs of the
    CLIs/benchmarks skip XLA recompiles (first compile of the 60k-voxel train
    step costs minutes over a tunneled chip). Opt out with
    DFU3D_NO_COMPILE_CACHE=1; override the location with
    JAX_COMPILATION_CACHE_DIR (which JAX itself also honors)."""
    if _os.environ.get("DFU3D_NO_COMPILE_CACHE"):
        return
    cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                      ".jax_cache"),
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every compile that takes >1 s (default only caches "big" ones)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
