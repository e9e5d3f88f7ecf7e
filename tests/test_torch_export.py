"""Exporter round-trip: flax params -> reference torch layout -> import ->
bitwise-identical tree (two-way checkpoint interop)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.utils import torch_import as ti
from dreamvla_tpu.utils.torch_export import export_dreamvla, save_reference_checkpoint


def init_params(cfg):
    model = DreamVLA(cfg)
    rng = np.random.default_rng(0)
    b, s = 1, cfg.sequence_length
    inputs = dict(
        image_primary=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32),
        image_wrist=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32),
        state=jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32),
        text_features=jnp.asarray(rng.normal(size=(b, 512)), jnp.float32),
        action_label=jnp.zeros((b, s, cfg.action_pred_steps, 7), jnp.float32),
    )
    return model.init({"params": jax.random.PRNGKey(1),
                       "diffusion": jax.random.PRNGKey(2)},
                      mode="train", train=False, **inputs)["params"]


def roundtrip(cfg):
    params = init_params(cfg)
    sd = export_dreamvla(params, cfg)
    tree, missing, unexpected = ti.import_dreamvla(sd, cfg)
    assert missing == [], missing[:8]
    assert unexpected == [], unexpected[:8]
    merged = ti.merge_params(params, tree)
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                                   - np.asarray(b, np.float32)).max()),
                         params, merged)
    worst = max(jax.tree.leaves(diffs))
    assert worst == 0.0, worst


def test_roundtrip_mlp_head():
    cfg, _ = tiny_test()
    roundtrip(cfg)


def test_roundtrip_dit_head():
    cfg, _ = tiny_test()
    roundtrip(dataclasses.replace(cfg, use_dit_head=True, dit_type="DiT-S"))


def test_reference_pth_loads_with_torch(tmp_path):
    import torch

    cfg, _ = tiny_test()
    params = init_params(cfg)
    path = str(tmp_path / "export.pth")
    save_reference_checkpoint(path, params, cfg, epoch=7)
    ckpt = torch.load(path, weights_only=False)
    assert ckpt["epoch"] == 7
    assert "module.transformer_backbone.h.0.attn.c_attn.weight" in ckpt["model_state_dict"]
    # and our own loader reads it straight back
    sd = ti.load_torch_state_dict(path)
    tree, missing, unexpected = ti.import_dreamvla(sd, cfg)
    assert missing == [] and unexpected == []
