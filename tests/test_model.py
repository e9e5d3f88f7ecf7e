"""End-to-end model tests on the tiny config: shapes, causality, DiT head."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.models.dit import ActionDiffusionHead
from dreamvla_tpu.utils.testing import cached_init, init_signature


@pytest.fixture(scope="module")
def tiny_inputs():
    cfg, _ = tiny_test()
    rng = np.random.default_rng(0)
    b, s = 2, cfg.sequence_length
    return dict(
        image_primary=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32),
        image_wrist=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32),
        state=jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32),
        text_features=jnp.asarray(rng.normal(size=(b, 512)), jnp.float32),
        action_label=jnp.asarray(
            rng.normal(size=(b, s, cfg.action_pred_steps, 7)), jnp.float32),
    )


def init_model(cfg, inputs):
    model = DreamVLA(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
            "mask": jax.random.PRNGKey(3)}
    variables = cached_init(
        model, lambda: model.init(rngs, mode="train", train=False, **inputs),
        init_signature("train", rngs, inputs))
    return model, variables


def test_mlp_head_forward_shapes(tiny_inputs):
    cfg, _ = tiny_test()
    model, variables = init_model(cfg, tiny_inputs)
    out = model.apply(variables, mode="train", train=False, **tiny_inputs)
    b, s, aps = 2, cfg.sequence_length, cfg.action_pred_steps
    assert out.arm_action.shape == (b, s, aps, 6)
    assert out.gripper_action.shape == (b, s, aps, 1)
    # 4 patches of 16x16x3 on a 32x32 image
    assert out.image_pred.shape == (b * s, 2, 1, 4, 16 * 16 * 3)
    assert out.depth_pred.shape == (b * s, 2, 1, 4, 16 * 16)
    assert np.isfinite(np.asarray(out.arm_action)).all()
    assert np.isfinite(np.asarray(out.image_pred)).all()
    assert (np.asarray(out.depth_pred) >= 0).all()  # ReLU'd depth
    # value ranges from tanh/sigmoid heads
    assert (np.abs(np.asarray(out.arm_action)) <= 1).all()
    g = np.asarray(out.gripper_action)
    assert ((g >= 0) & (g <= 1)).all()


def test_action_queries_ignore_b_tokens_of_other_steps(tiny_inputs):
    """Causality: with atten_only_obs the action features at step t depend
    only on that step's own A-block — changing frames at a *later* step must
    not change earlier action outputs."""
    cfg, _ = tiny_test()
    model, variables = init_model(cfg, tiny_inputs)
    out1 = model.apply(variables, mode="test", train=False, **tiny_inputs)
    mod = dict(tiny_inputs)
    imgs = np.asarray(mod["image_primary"]).copy()
    imgs[:, -1] += 10.0  # perturb the last timestep only
    mod["image_primary"] = jnp.asarray(imgs)
    out2 = model.apply(variables, mode="test", train=False, **mod)
    a1 = np.asarray(out1.action_features)
    a2 = np.asarray(out2.action_features)
    np.testing.assert_allclose(a1[:, :-1], a2[:, :-1], atol=1e-5)
    assert np.abs(a1[:, -1] - a2[:, -1]).max() > 1e-4  # last step did change


def test_dit_head_train_and_sample(tiny_inputs):
    cfg, _ = tiny_test()
    cfg = dataclasses.replace(cfg, use_dit_head=True, dit_type="DiT-S")
    model, variables = init_model(cfg, tiny_inputs)
    out = model.apply(
        variables, mode="train", train=False, **tiny_inputs,
        rngs={"diffusion": jax.random.PRNGKey(7)},
    )
    assert out.dit_loss.shape == ()
    assert np.isfinite(float(out.dit_loss))
    assert out.arm_action is None

    # test-mode sampling path
    out_t = model.apply(variables, mode="test", train=False, **tiny_inputs)
    z = out_t.action_features  # (b, s, aps, h)
    b, s, aps, h = z.shape
    head = ActionDiffusionHead(
        DreamVLA(cfg).action_diffusion_config(),
        __import__("dreamvla_tpu.models.dit", fromlist=["build_dit"]).build_dit(
            DreamVLA(cfg).action_diffusion_config()),
    )
    dit_params = variables["params"]["action_model"]
    samples = head.sample(
        dit_params, z.reshape(b * s, aps, h).astype(jnp.float32),
        jax.random.PRNGKey(11))
    assert samples.shape == (b * s, aps, 7)
    assert np.isfinite(np.asarray(samples)).all()


def test_share_query_channel_slices(tiny_inputs):
    cfg, _ = tiny_test()
    cfg = dataclasses.replace(cfg, share_query=True, dino_feat_pred=True,
                              sam_feat_pred=True)
    model, variables = init_model(cfg, tiny_inputs)
    out = model.apply(variables, mode="train", train=False, **tiny_inputs)
    b_s = 2 * cfg.sequence_length
    assert out.image_pred.shape == (b_s, 2, 1, 4, 768)
    assert out.dino_pred.shape == (b_s, 2, 1, 256, 768)
    assert out.sam_pred.shape == (b_s, 2, 1, 256, 256)
    # share_query appends only the shared obs tokens to the trunk
    assert cfg.total_query_tokens == cfg.num_obs_token


def test_train_mode_dropout_is_stochastic(tiny_inputs):
    cfg, _ = tiny_test()
    model, variables = init_model(cfg, tiny_inputs)
    o1 = model.apply(variables, mode="test", train=True, **tiny_inputs,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(variables, mode="test", train=True, **tiny_inputs,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(o1.arm_action) - np.asarray(o2.arm_action)).max() > 0


def test_dinosiglip_variant(tiny_inputs):
    cfg, _ = tiny_test()
    cfg = dataclasses.replace(
        cfg, use_dinosiglip=True, vision_patch_size=16,
        dino_dim=32, dino_depth=2, dino_heads=4, dino_pos_grid=2,
        siglip_dim=48, siglip_depth=3, siglip_heads=4, siglip_mlp=96)
    assert cfg.vision_width == 80 and cfg.cls_width == 32
    model, variables = init_model(cfg, tiny_inputs)
    out = model.apply(variables, mode="test", train=False, **tiny_inputs)
    b, s, aps = 2, cfg.sequence_length, cfg.action_pred_steps
    assert out.arm_action.shape == (b, s, aps, 6)
    assert np.isfinite(np.asarray(out.arm_action)).all()
    # both towers' params exist under the encoder
    enc = variables["params"]["vision_encoder"]
    assert "dino" in enc and "siglip" in enc
    assert "reg_token" in enc["dino"] and "cls_token" not in enc["siglip"]


def test_remat_trunk_grads(tiny_inputs):
    """cfg.remat wraps trunk blocks in jax.checkpoint; grads still flow."""
    cfg, _ = tiny_test()
    cfg = dataclasses.replace(cfg, remat=True)
    model, variables = init_model(cfg, tiny_inputs)

    def loss(params):
        out = model.apply({"params": params}, mode="train", train=False,
                          **tiny_inputs)
        return jnp.sum(out.arm_action ** 2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    gmax = max(jax.tree.leaves(jax.tree.map(
        lambda x: float(jnp.abs(x).max()), g["transformer_backbone"])))
    assert np.isfinite(gmax) and gmax > 0


def test_mae_masking_and_reconstruction_path():
    """Full MAE pretraining path: random masking keeps the right count,
    the decoder unshuffles correctly, and the masked-patch loss is finite."""
    from dreamvla_tpu.models.vit_mae import MaskedAutoencoderViT

    mae = MaskedAutoencoderViT(img_size=32, patch_size=16, embed_dim=32,
                               depth=1, num_heads=4, decoder_embed_dim=16,
                               decoder_depth=1, decoder_num_heads=4,
                               use_pallas=False)
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 32, 32)).astype(np.float32))
    variables = mae.init(jax.random.PRNGKey(0), imgs, 0.75,
                         rng=jax.random.PRNGKey(1))
    loss, pred, mask = mae.apply(variables, imgs, 0.75,
                                 rng=jax.random.PRNGKey(2))
    assert pred.shape == (2, 4, 16 * 16 * 3)
    m = np.asarray(mask)
    assert m.shape == (2, 4)
    np.testing.assert_array_equal(m.sum(axis=1), [3, 3])  # 75% of 4 masked
    assert np.isfinite(float(loss))


def test_flow_matching_head_train_and_sample(tiny_inputs):
    cfg, _ = tiny_test()
    cfg = dataclasses.replace(cfg, use_dit_head=True, use_fm=True,
                              dit_type="DiT-S")
    model, variables = init_model(cfg, tiny_inputs)
    out = model.apply(variables, mode="train", train=False, **tiny_inputs,
                      rngs={"diffusion": jax.random.PRNGKey(3)})
    assert np.isfinite(float(out.dit_loss))

    out_t = model.apply(variables, mode="test", train=False, **tiny_inputs)
    z = out_t.action_features
    b, s, aps, h = z.shape
    head = ActionDiffusionHead(
        DreamVLA(cfg).action_diffusion_config(),
        __import__("dreamvla_tpu.models.dit", fromlist=["build_dit"]).build_dit(
            DreamVLA(cfg).action_diffusion_config()))
    assert head.cfg.flow_matching
    samples = head.sample(variables["params"]["action_model"],
                          z.reshape(b * s, aps, h).astype(jnp.float32),
                          jax.random.PRNGKey(4))
    assert samples.shape == (b * s, aps, 7)
    assert np.isfinite(np.asarray(samples)).all()


def test_trunk_token_reorder_is_exact():
    """Reordered role-split trunk attention must reproduce the dense
    interleaved forward exactly (same params, both mask-flag styles)."""
    import dataclasses as dc

    from dreamvla_tpu.config import tiny_test

    for flags in (dict(), dict(atten_only_obs=True,
                               attn_robot_proprio_state=True)):
        cfg, _ = tiny_test()
        cfg = dc.replace(cfg, include_text_encoder=False, **flags)
        assert cfg.trunk_token_reorder and cfg.total_query_tokens > 0
        cfg_plain = dc.replace(cfg, trunk_token_reorder=False)
        rng = np.random.default_rng(0)
        b, s = 2, cfg.sequence_length
        inputs = dict(
            image_primary=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)),
                                      jnp.float32),
            image_wrist=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)),
                                    jnp.float32),
            state=jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32),
            text_features=jnp.asarray(rng.normal(size=(b, 512)), jnp.float32),
        )
        model_r = DreamVLA(cfg)
        model_p = DreamVLA(cfg_plain)
        variables = model_r.init({"params": jax.random.PRNGKey(0)},
                                 mode="test", train=False, **inputs)
        out_r = model_r.apply(variables, mode="test", train=False, **inputs)
        out_p = model_p.apply(variables, mode="test", train=False, **inputs)
        np.testing.assert_allclose(
            np.asarray(out_r.action_features, np.float32),
            np.asarray(out_p.action_features, np.float32),
            atol=1e-5, err_msg=str(flags))
        np.testing.assert_allclose(
            np.asarray(out_r.arm_action, np.float32),
            np.asarray(out_p.arm_action, np.float32), atol=1e-5)
