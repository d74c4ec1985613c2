"""TPU-native oriented object detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the MMRotate-based
reference (goodmayonnaise/OrientedObjectDetection): rotated-box geometry,
rotated IoU/NMS kernels, the rotated detector zoo, DOTA/HRSC/SAR data
pipelines, huge-image tiling, and config-driven training/eval — designed for
TPU meshes (pjit data parallelism, static shapes, bf16 compute).
"""

__version__ = '0.1.0'

# Persistent XLA compilation cache (opt-IN via OODTPU_COMPILE_CACHE=1):
# detector programs are large, so caching compiled executables across
# processes cuts cold-start from minutes to seconds on CPU. NOTE: left off
# by default because the axon TPU plugin deadlocks when the persistent
# cache is enabled (verified empirically).
import os as _os

if _os.environ.get('OODTPU_COMPILE_CACHE'):
    import jax as _jax

    _cache_dir = _os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                 _os.path.expanduser('~/.cache/oodtpu_xla'))
    try:
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # older jax without these flags
        pass
