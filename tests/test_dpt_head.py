"""DPT refinement head: shapes, fusion plumbing, torch-layout import."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dreamvla_tpu.models.dpt_head import DPTHead, import_dpt_head


def test_dpt_head_shapes():
    head = DPTHead(in_channels=64, features=16, out_channels=(8, 12, 16, 24))
    tokens = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 256, 64)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), [tokens] * 4, 16, 16)["params"]
    out = head.apply({"params": params}, [tokens] * 4, 16, 16)
    assert out.shape == (2, 1, 224, 224)
    o = np.asarray(out)
    assert np.isfinite(o).all() and (o >= 0).all() and (o <= 1).all()  # sigmoid


def test_dpt_import_covers_all_keys():
    import torch
    import torch.nn as nn

    feats, oc = 16, [8, 12, 16, 24]
    sd = {}
    for i, c in enumerate(oc):
        sd[f"projects.{i}.weight"] = torch.randn(c, 64, 1, 1)
        sd[f"projects.{i}.bias"] = torch.randn(c)
        sd[f"scratch.layer{i+1}_rn.weight"] = torch.randn(feats, c, 3, 3)
    sd["resize_layers.0.weight"] = torch.randn(oc[0], oc[0], 4, 4)
    sd["resize_layers.0.bias"] = torch.randn(oc[0])
    sd["resize_layers.1.weight"] = torch.randn(oc[1], oc[1], 2, 2)
    sd["resize_layers.1.bias"] = torch.randn(oc[1])
    sd["resize_layers.3.weight"] = torch.randn(oc[3], oc[3], 3, 3)
    sd["resize_layers.3.bias"] = torch.randn(oc[3])
    for i in range(1, 5):
        for u in ("resConfUnit1", "resConfUnit2"):
            for cconv in ("conv1", "conv2"):
                sd[f"scratch.refinenet{i}.{u}.{cconv}.weight"] = torch.randn(
                    feats, feats, 3, 3)
                sd[f"scratch.refinenet{i}.{u}.{cconv}.bias"] = torch.randn(feats)
        sd[f"scratch.refinenet{i}.out_conv.weight"] = torch.randn(feats, feats, 1, 1)
        sd[f"scratch.refinenet{i}.out_conv.bias"] = torch.randn(feats)
    sd["scratch.output_conv1.weight"] = torch.randn(feats // 2, feats, 3, 3)
    sd["scratch.output_conv1.bias"] = torch.randn(feats // 2)
    sd["scratch.output_conv2.0.weight"] = torch.randn(32, feats // 2, 3, 3)
    sd["scratch.output_conv2.0.bias"] = torch.randn(32)
    sd["scratch.output_conv2.2.weight"] = torch.randn(1, 32, 1, 1)
    sd["scratch.output_conv2.2.bias"] = torch.randn(1)
    sd = {k: v.numpy() for k, v in sd.items()}

    params, missing, unexpected = import_dpt_head(sd)
    assert not missing and not unexpected
    head = DPTHead(in_channels=64, features=feats, out_channels=tuple(oc))
    tokens = jnp.zeros((1, 256, 64))
    fresh = head.init(jax.random.PRNGKey(0), [tokens] * 4, 16, 16)["params"]
    # imported tree covers exactly the fresh structure
    fresh_paths = {jax.tree_util.keystr(p)
                   for p, _ in jax.tree_util.tree_flatten_with_path(fresh)[0]}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert fresh_paths == got_paths
    out = head.apply({"params": params}, [tokens] * 4, 16, 16)
    assert out.shape == (1, 1, 224, 224)


def test_model_with_dpt_head():
    from dreamvla_tpu.config import tiny_test
    from dreamvla_tpu.models.dreamvla import DreamVLA

    cfg, _ = tiny_test()
    cfg = dataclasses.replace(cfg, use_dpt_head=True)
    model = DreamVLA(cfg)
    rng = np.random.default_rng(0)
    b, s = 1, cfg.sequence_length
    inputs = dict(
        image_primary=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32),
        image_wrist=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32),
        state=jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32),
        text_features=jnp.asarray(rng.normal(size=(b, 512)), jnp.float32),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, mode="train",
                           train=False, **inputs)
    out = model.apply(variables, mode="train", train=False, **inputs)
    assert out.depth_pred.shape == (b * s, 2, cfg.pred_num, 1, 224, 224)
