"""GeoTransformer: full registration model assembly.

Ref parity: experiments/geotransformer.3dmatch.../model.py:19-212 (the
assembly is identical across experiments up to backbone depth / fine pyramid
level). Differences by design:

  * ref and src are separate padded clouds; the backbone runs once over the
    stacked (2, N, ...) pair via nn.vmap instead of the reference's
    concatenated "stack mode" tensor — same math, better MXU batching.
  * ground-truth node correspondences are a dense (M, N) overlap map
    (see models/registration.py) instead of a variable-length list.
  * coarse proposals / training targets / fine correspondences are all
    fixed-capacity index buffers with validity masks.
  * everything including local-to-global registration runs inside one jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ref_geotransformer_tpu.config import GeoTransformerConfig
from ref_geotransformer_tpu.models.attention import RPEConditionalTransformer
from ref_geotransformer_tpu.models.backbone import KPConvFPN
from ref_geotransformer_tpu.models.embedding import GeometricStructureEmbedding
from ref_geotransformer_tpu.models.matching import superpoint_matching, superpoint_target_sample
from ref_geotransformer_tpu.models.registration import (
    get_node_correspondences,
    local_to_global_registration,
)
from ref_geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport
from ref_geotransformer_tpu.ops.index import masked_gather
from ref_geotransformer_tpu.ops.partition import point_to_node_partition


class GeometricTransformer(nn.Module):
    """Geometric embedding + in_proj + RPE conditional transformer + out_proj
    (modules/geotransformer/geotransformer.py:75-155)."""

    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: tuple
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"
    use_pallas_embedding: object = None  # None = auto (TPU, inference)

    @nn.compact
    def __call__(self, ref_points, src_points, ref_feats, src_feats, ref_masks=None, src_masks=None):
        """All tensors batched (B, N, ...); masks (B, N) validity."""
        embed = GeometricStructureEmbedding(
            self.hidden_dim, self.sigma_d, self.sigma_a, self.angle_k, self.reduction_a,
            use_pallas=self.use_pallas_embedding, name="embedding"
        )
        ref_embeddings = embed(ref_points, ref_masks)
        src_embeddings = embed(src_points, src_masks)

        in_proj = nn.Dense(self.hidden_dim, name="in_proj")
        ref_feats = in_proj(ref_feats)
        src_feats = in_proj(src_feats)

        ref_feats, src_feats = RPEConditionalTransformer(
            self.blocks, self.hidden_dim, self.num_heads, name="transformer"
        )(ref_feats, src_feats, ref_embeddings, src_embeddings, masks0=ref_masks, masks1=src_masks)

        out_proj = nn.Dense(self.output_dim, name="out_proj")
        return out_proj(ref_feats), out_proj(src_feats)


class GeoTransformer(nn.Module):
    cfg: GeoTransformerConfig

    @nn.compact
    def __call__(self, data: Dict, training: bool = False) -> Dict:
        cfg = self.cfg
        fine_level = cfg.backbone.fine_level
        k_patch = cfg.model.num_points_in_patch

        ref, src = data["ref"], data["src"]
        transform = data.get("transform")

        ref_points_c, src_points_c = ref["points"][-1], src["points"][-1]
        ref_masks_c, src_masks_c = ref["masks"][-1], src["masks"][-1]
        ref_points_f, src_points_f = ref["points"][fine_level], src["points"][fine_level]
        ref_masks_f, src_masks_f = ref["masks"][fine_level], src["masks"][fine_level]

        output: Dict = {
            "ref_points_c": ref_points_c,
            "src_points_c": src_points_c,
            "ref_points_f": ref_points_f,
            "src_points_f": src_points_f,
            "ref_points": ref["points"][0],
            "src_points": src["points"][0],
            "ref_point_masks": ref["masks"][0],
            "src_point_masks": src["masks"][0],
            "ref_masks_f": ref_masks_f,
            "src_masks_f": src_masks_f,
        }

        # ---- 1. patch partition (model.py:98-108), gradient-free ----
        _, ref_node_masks, ref_node_knn_indices, ref_node_knn_masks = point_to_node_partition(
            ref_points_f, ref_points_c, k_patch, ref_masks_f, ref_masks_c
        )
        _, src_node_masks, src_node_knn_indices, src_node_knn_masks = point_to_node_partition(
            src_points_f, src_points_c, k_patch, src_masks_f, src_masks_c
        )
        ref_node_knn_points = masked_gather(ref_points_f, ref_node_knn_indices, fill_value=0.0)
        src_node_knn_points = masked_gather(src_points_f, src_node_knn_indices, fill_value=0.0)

        output["ref_node_masks"] = ref_node_masks
        output["src_node_masks"] = src_node_masks

        # ---- 2. GT node correspondences (model.py:110-121) ----
        if transform is not None:
            gt_overlap_map, gt_ambiguous_map = get_node_correspondences(
                ref_points_c,
                src_points_c,
                ref_node_knn_points,
                src_node_knn_points,
                transform,
                cfg.model.ground_truth_matching_radius,
                ref_masks=ref_node_masks,
                src_masks=src_node_masks,
                ref_knn_masks=ref_node_knn_masks,
                src_knn_masks=src_node_knn_masks,
                candidate_limit=cfg.capacities.gt_candidates,
            )
            output["gt_node_overlap_map"] = gt_overlap_map
            output["gt_node_ambiguous_map"] = gt_ambiguous_map

        # ---- 3. KPConv-FPN backbone over the stacked pair (model.py:127) ----
        backbone = nn.vmap(
            KPConvFPN,
            in_axes=0,
            out_axes=0,
            variable_axes={"params": None, "buffers": None},
            split_rngs={"params": False, "buffers": False},
            axis_name="pair_norm",
        )(
            cfg.backbone.input_dim,
            cfg.backbone.output_dim,
            cfg.backbone.init_dim,
            cfg.backbone.kernel_size,
            cfg.backbone.init_radius,
            cfg.backbone.init_sigma,
            cfg.backbone.group_norm,
            cfg.backbone.num_stages,
            cfg.backbone.fine_level,
            jnp.bfloat16 if cfg.backbone.dtype == "bfloat16" else None,
            norm_axis_name="pair_norm",
            activation_dtype=jnp.bfloat16 if cfg.backbone.act_dtype == "bfloat16" else None,
            name="backbone",
        )
        feats = jnp.stack([data["ref_feats"], data["src_feats"]], axis=0)  # (2, N0, C)
        stacked = jax.tree_util.tree_map(lambda r, s: jnp.stack([r, s], 0), ref, src)
        feats_list = backbone(feats, stacked)
        feats_c = feats_list[-1]  # (2, Nc, C_c)
        feats_f = feats_list[0]  # (2, Nf, C_f)
        ref_feats_c, src_feats_c = feats_c[0], feats_c[1]
        ref_feats_f, src_feats_f = feats_f[0], feats_f[1]

        # ---- 4. geometric transformer over superpoints (model.py:135-146) ----
        ref_h, src_h = GeometricTransformer(
            cfg.geotransformer.input_dim,
            cfg.geotransformer.output_dim,
            cfg.geotransformer.hidden_dim,
            cfg.geotransformer.num_heads,
            tuple(cfg.geotransformer.blocks),
            cfg.geotransformer.sigma_d,
            cfg.geotransformer.sigma_a,
            cfg.geotransformer.angle_k,
            cfg.geotransformer.reduction_a,
            use_pallas_embedding=None,  # auto on TPU; kernel has a custom VJP
            name="transformer",
        )(
            ref_points_c[None], src_points_c[None], ref_feats_c[None], src_feats_c[None],
            ref_masks_c[None], src_masks_c[None],
        )
        ref_feats_c = ref_h[0]
        src_feats_c = src_h[0]

        ref_feats_c_norm = ref_feats_c / jnp.maximum(
            jnp.linalg.norm(ref_feats_c, axis=1, keepdims=True), 1e-12
        )
        src_feats_c_norm = src_feats_c / jnp.maximum(
            jnp.linalg.norm(src_feats_c, axis=1, keepdims=True), 1e-12
        )
        output["ref_feats_c"] = ref_feats_c_norm
        output["src_feats_c"] = src_feats_c_norm
        output["ref_feats_f"] = ref_feats_f
        output["src_feats_f"] = src_feats_f

        # ---- 5. coarse proposal selection (model.py:154-160), gradient-free ----
        ref_node_corr_indices, src_node_corr_indices, node_corr_scores = superpoint_matching(
            jax.lax.stop_gradient(ref_feats_c_norm),
            jax.lax.stop_gradient(src_feats_c_norm),
            ref_node_masks,
            src_node_masks,
            cfg.coarse_matching.num_correspondences,
            cfg.coarse_matching.dual_normalization,
        )
        output["ref_node_corr_indices"] = ref_node_corr_indices
        output["src_node_corr_indices"] = src_node_corr_indices
        node_corr_masks = jnp.ones_like(node_corr_scores, bool)

        # ---- 6. training: replace proposals with sampled GT targets
        # (model.py:162-166) ----
        if training:
            assert transform is not None, "training requires the GT transform"
            rng = self.make_rng("target")
            ref_node_corr_indices, src_node_corr_indices, node_corr_scores, node_corr_masks = (
                superpoint_target_sample(
                    rng,
                    output["gt_node_overlap_map"],
                    cfg.coarse_matching.num_targets,
                    cfg.coarse_matching.overlap_threshold,
                )
            )
        output["node_corr_masks"] = node_corr_masks

        # ---- 7. patch gathering (model.py:169-185) ----
        ref_node_corr_knn_indices = ref_node_knn_indices[ref_node_corr_indices]  # (P, K)
        src_node_corr_knn_indices = src_node_knn_indices[src_node_corr_indices]
        ref_node_corr_knn_masks = jnp.logical_and(
            ref_node_knn_masks[ref_node_corr_indices], node_corr_masks[:, None]
        )
        src_node_corr_knn_masks = jnp.logical_and(
            src_node_knn_masks[src_node_corr_indices], node_corr_masks[:, None]
        )
        ref_node_corr_knn_points = ref_node_knn_points[ref_node_corr_indices]
        src_node_corr_knn_points = src_node_knn_points[src_node_corr_indices]

        ref_node_corr_knn_feats = masked_gather(ref_feats_f, ref_node_corr_knn_indices, fill_value=0.0)
        src_node_corr_knn_feats = masked_gather(src_feats_f, src_node_corr_knn_indices, fill_value=0.0)

        output["ref_node_corr_knn_points"] = ref_node_corr_knn_points
        output["src_node_corr_knn_points"] = src_node_corr_knn_points
        output["ref_node_corr_knn_masks"] = ref_node_corr_knn_masks
        output["src_node_corr_knn_masks"] = src_node_corr_knn_masks

        # ---- 8. optimal transport (model.py:188-191) ----
        matching_scores = jnp.einsum(
            "pnd,pmd->pnm", ref_node_corr_knn_feats, src_node_corr_knn_feats,
            preferred_element_type=jnp.float32,
        )
        matching_scores = matching_scores / ref_feats_f.shape[1] ** 0.5
        # training needs the differentiable lax.scan path; inference may use
        # the VMEM-resident Pallas loop (auto on TPU)
        matching_scores = LearnableLogOptimalTransport(
            cfg.model.num_sinkhorn_iterations,
            use_pallas=False if training else None,
            name="optimal_transport",
        )(matching_scores, ref_node_corr_knn_masks, src_node_corr_knn_masks)
        output["matching_scores"] = matching_scores

        # ---- 9. local-to-global registration (model.py:194-209), no grad ----
        lgr = local_to_global_registration(
            jax.lax.stop_gradient(ref_node_corr_knn_points),
            jax.lax.stop_gradient(src_node_corr_knn_points),
            ref_node_corr_knn_masks,
            src_node_corr_knn_masks,
            jax.lax.stop_gradient(matching_scores),
            jax.lax.stop_gradient(node_corr_scores),
            k=cfg.fine_matching.topk,
            acceptance_radius=cfg.fine_matching.acceptance_radius,
            mutual=cfg.fine_matching.mutual,
            confidence_threshold=cfg.fine_matching.confidence_threshold,
            use_dustbin=cfg.fine_matching.use_dustbin,
            use_global_score=cfg.fine_matching.use_global_score,
            correspondence_threshold=cfg.fine_matching.correspondence_threshold,
            correspondence_limit=cfg.capacities.correspondence_limit,
            num_refinement_steps=cfg.fine_matching.num_refinement_steps,
        )
        output["ref_corr_points"] = lgr.ref_corr_points
        output["src_corr_points"] = lgr.src_corr_points
        output["corr_scores"] = lgr.corr_scores
        output["corr_masks"] = lgr.corr_masks
        output["estimated_transform"] = lgr.estimated_transform

        return output


def create_model(cfg: GeoTransformerConfig) -> GeoTransformer:
    return GeoTransformer(cfg)


def init_model_variables(model: GeoTransformer, cfg: GeoTransformerConfig, rng: jax.Array):
    """Initialize params/buffers on a MINIMAL synthetic pair.

    Parameter shapes depend only on channel dims, never on point capacities,
    so initializing at tiny capacities avoids compiling the full-scale graph
    twice (init + forward) — full-scale jitted init costs minutes on TPU.
    The tiny capacities still satisfy every static top-k requirement
    (patch K, angle_k, num_correspondences <= M*N).
    """
    import numpy as np

    from ref_geotransformer_tpu.config import CapacityConfig
    from ref_geotransformer_tpu.data.pyramid import build_registration_inputs

    k = cfg.model.num_points_in_patch
    node_cap = max(32, int(np.ceil(np.sqrt(cfg.coarse_matching.num_correspondences))) + 1)
    fine_cap = max(2 * k, 2 * node_cap)
    caps = []
    for i in range(cfg.backbone.num_stages):
        if i == 0:
            caps.append(max(4 * fine_cap, 256))
        elif i == cfg.backbone.fine_level:
            caps.append(fine_cap)
        elif i == cfg.backbone.num_stages - 1:
            caps.append(node_cap)
        else:
            caps.append(max(fine_cap, node_cap))
    caps = tuple(caps)

    tiny_cfg = cfg.replace(
        capacities=CapacityConfig(
            points=caps,
            neighbor_limits=tuple(min(nl, c) for nl, c in zip(cfg.capacities.neighbor_limits, caps)),
            gt_candidates=min(cfg.capacities.gt_candidates, node_cap * node_cap),
            correspondence_limit=min(cfg.capacities.correspondence_limit, 1024),
            search_chunk=min(cfg.capacities.search_chunk, 256),
        )
    )
    tiny_model = GeoTransformer(tiny_cfg)

    np_rng = np.random.default_rng(0)
    pts = np_rng.uniform(-1.0, 1.0, (caps[0], 3)).astype(np.float32)
    masks = jnp.ones((caps[0],), bool)
    data = jax.jit(
        lambda p, m: build_registration_inputs(
            p,
            m,
            p,
            m,
            cfg.backbone.num_stages,
            cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius,
            tiny_cfg.capacities.neighbor_limits,
            caps,
            transform=jnp.eye(4),
            search_chunk=tiny_cfg.capacities.search_chunk,
        )
    )(jnp.asarray(pts), masks)
    p_rng, t_rng = jax.random.split(rng)
    return jax.jit(tiny_model.init)({"params": p_rng, "target": t_rng}, data)
