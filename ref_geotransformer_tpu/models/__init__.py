from ref_geotransformer_tpu.models.kpconv import (
    KPConv,
    ConvBlock,
    ResidualBlock,
    UnaryBlock,
    LastUnaryBlock,
    nearest_upsample,
    knn_interpolate,
    maxpool,
    global_avgpool,
)
from ref_geotransformer_tpu.models.norms import MaskedGroupNorm
from ref_geotransformer_tpu.models.backbone import KPConvFPN
from ref_geotransformer_tpu.models.embedding import (
    SinusoidalPositionalEmbedding,
    LearnablePositionalEmbedding,
    GeometricStructureEmbedding,
)
from ref_geotransformer_tpu.models.attention import (
    MultiHeadAttention,
    RPEMultiHeadAttention,
    PEMultiHeadAttention,
    AttentionLayer,
    RPEAttentionLayer,
    TransformerLayer,
    RPETransformerLayer,
    PETransformerLayer,
    TransformerEncoderLayer,
    TransformerDecoderLayer,
    TransformerEncoder,
    TransformerDecoder,
    RPEConditionalTransformer,
    PEConditionalTransformer,
    LRPEConditionalTransformer,
    VanillaConditionalTransformer,
)
from ref_geotransformer_tpu.models.correspondence import (
    extract_correspondences_from_scores,
    extract_correspondences_topk,
    node_correspondences_to_dense,
    patch_overlap_ratios,
    point_matching,
)
from ref_geotransformer_tpu.models.factory import (
    build_act_layer,
    build_norm_layer,
    build_dropout_layer,
    ConvBlock1d,
)
from ref_geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport
from ref_geotransformer_tpu.models.matching import superpoint_matching, superpoint_target_sample
from ref_geotransformer_tpu.models.procrustes import weighted_procrustes
from ref_geotransformer_tpu.models.registration import (
    get_node_correspondences,
    local_to_global_registration,
    compute_correspondence_matrix,
)
from ref_geotransformer_tpu.models.geotransformer import (
    GeoTransformer,
    GeometricTransformer,
    create_model,
    init_model_variables,
)
from ref_geotransformer_tpu.models.cordi import (
    Cordi,
    VarianceSchedule,
    DenoisingTransformer,
    SinusoidalTimeEmbedding,
    cordi_downsample,
    get_corr_from_matrix_topk,
)
from ref_geotransformer_tpu.models.losses import (
    circle_loss,
    weighted_circle_loss,
    coarse_matching_loss,
    fine_matching_loss,
    overall_loss,
    evaluate,
)
