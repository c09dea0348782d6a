from ref_geotransformer_tpu.ops.se3 import (
    apply_transform,
    apply_rotation,
    compose_transforms,
    get_transform_from_rotation_translation,
    get_rotation_translation_from_transform,
    inverse_transform,
    skew_symmetric_matrix,
    rodrigues_rotation_matrix,
    rodrigues_alignment_matrix,
)
from ref_geotransformer_tpu.ops.pairwise import pairwise_distance, masked_pairwise_distance
from ref_geotransformer_tpu.ops.vector_angle import vector_angle, rad2deg, deg2rad
from ref_geotransformer_tpu.ops.subsample import grid_subsample
from ref_geotransformer_tpu.ops.neighbors import radius_search, knn_search
from ref_geotransformer_tpu.ops.partition import (
    get_point_to_node_indices,
    point_to_node_partition,
    knn_partition,
    ball_query_partition,
)
from ref_geotransformer_tpu.ops.metrics import (
    relative_rotation_error,
    relative_translation_error,
    isotropic_transform_error,
    anisotropic_transform_error,
    modified_chamfer_distance,
    inlier_ratio,
    overlap_ratio,
    registration_rmse,
)
from ref_geotransformer_tpu.ops.index import masked_gather, index_select
