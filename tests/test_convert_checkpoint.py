"""Checkpoint-converter mapping tests (synthetic torch-style state dict)."""

import numpy as np

from ref_geotransformer_tpu.utils.convert_checkpoint import convert_state_dict


def test_core_mappings():
    rng = np.random.default_rng(0)
    sd = {
        "module.backbone.encoder1_1.KPConv.weights": rng.normal(size=(15, 1, 64)).astype(np.float32),
        "backbone.encoder1_1.KPConv.kernel_points": rng.normal(size=(15, 3)).astype(np.float32),
        "backbone.encoder1_1.norm.norm.weight": np.ones(64, np.float32),
        "backbone.encoder1_1.norm.norm.bias": np.zeros(64, np.float32),
        "backbone.decoder3.mlp.weight": rng.normal(size=(512, 1536)).astype(np.float32),
        "backbone.decoder3.mlp.bias": np.zeros(512, np.float32),
        "transformer.in_proj.weight": rng.normal(size=(256, 1024)).astype(np.float32),
        "transformer.in_proj.bias": np.zeros(256, np.float32),
        "transformer.transformer.layers.0.attention.attention.proj_q.weight": rng.normal(size=(256, 256)).astype(np.float32),
        "transformer.transformer.layers.0.attention.attention.proj_p.weight": rng.normal(size=(256, 256)).astype(np.float32),
        "transformer.transformer.layers.0.attention.attention.proj_p.bias": np.zeros(256, np.float32),
        "transformer.transformer.layers.0.attention.norm.weight": np.ones(256, np.float32),
        "transformer.transformer.layers.0.attention.norm.bias": np.zeros(256, np.float32),
        "optimal_transport.alpha": np.float32(1.0),
    }
    out = convert_state_dict(sd)
    params, buffers = out["params"], out["buffers"]

    # KPConv weights: layout preserved, DDP prefix stripped
    np.testing.assert_array_equal(
        params["backbone"]["encoder1_1"]["KPConv"]["weights"],
        sd["module.backbone.encoder1_1.KPConv.weights"],
    )
    # kernel points land in buffers
    assert buffers["backbone"]["encoder1_1"]["KPConv"]["kernel_points"].shape == (15, 3)
    # GroupNorm: doubled norm collapsed, weight -> scale
    assert params["backbone"]["encoder1_1"]["norm"]["scale"].shape == (64,)
    # Linear transposed
    assert params["backbone"]["decoder3"]["mlp"]["kernel"].shape == (1536, 512)
    np.testing.assert_array_equal(
        params["backbone"]["decoder3"]["mlp"]["kernel"], sd["backbone.decoder3.mlp.weight"].T
    )
    # layers.N -> layers_N, proj_p -> kernel/bias rewrite params
    attn = params["transformer"]["transformer"]["layers_0"]["attention"]["attention"]
    assert attn["proj_q"]["kernel"].shape == (256, 256)
    np.testing.assert_array_equal(attn["proj_p_kernel"],
                                  sd["transformer.transformer.layers.0.attention.attention.proj_p.weight"].T)
    assert attn["proj_p_bias"].shape == (256,)
    # LayerNorm under attention
    assert params["transformer"]["transformer"]["layers_0"]["attention"]["norm"]["scale"].shape == (256,)
    # sinkhorn alpha scalar
    assert params["optimal_transport"]["alpha"].shape == ()
    assert out["skipped"] == []
