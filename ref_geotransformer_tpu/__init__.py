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
