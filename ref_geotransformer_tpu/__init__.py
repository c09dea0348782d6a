"""TPU-native GeoTransformer: pairwise rigid point-cloud registration in JAX.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Haoqing-Wu/Ref-GeoTransformer (GeoTransformer, CVPR 2022 + Cordi diffusion
fork): KPConv-FPN hierarchical backbone over voxel-downsampled point
pyramids, geometric self/cross attention over superpoints, Sinkhorn
optimal-transport fine matching, and RANSAC-free local-to-global
weighted-Procrustes registration -- all with static shapes so the whole
pipeline (including voxel-grid subsampling and radius neighbor search,
which the reference implements as CPU C++ extensions) runs jitted on TPU.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache for every entry point (full-caps 3DMatch
# train-step compiles take >20 min cold; a disk cache makes warm starts
# survive fresh processes). Opt out with REF_GT_NO_COMPILE_CACHE=1; location
# knobs documented in utils/jax_utils.setup_compilation_cache.
import os as _os

try:
    from ref_geotransformer_tpu.utils.jax_utils import honor_platform_env as _hpe

    # $JAX_PLATFORMS must win even when a site plugin pinned the platform
    # list programmatically (see utils/jax_utils.honor_platform_env)
    _hpe()
except Exception:
    pass

if _os.environ.get("REF_GT_NO_COMPILE_CACHE") != "1":
    try:
        from ref_geotransformer_tpu.utils.jax_utils import setup_compilation_cache as _scc

        _scc()
    except Exception:  # never let a cache-dir problem break imports
        pass
del _os
