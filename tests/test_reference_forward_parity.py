"""Whole-model forward parity vs the ACTUAL reference (VERDICT r3 #2).

Loads identical weights into BOTH full models — the unmodified reference
DreamVLA (/root/reference/models/dreamvla_model.py:609-991) built via
utils/ref_shims at tiny trunk shapes, and the JAX DreamVLA — and runs both
forwards on the same fp32 inputs:

  * MLP-head config, train mode: the forward is deterministic end-to-end;
    every non-None member of the reference 10-tuple is compared (actions +
    image/depth/dino/sam/traj dream predictions).
  * DiT-head config, train mode: the dream predictions are compared; the
    DiT diffusion loss is compared with IDENTICAL noise/timesteps fed to
    both frameworks (torch.randn_like/randint patched on the reference
    side; the JAX head takes explicit noise/t), with the reference's
    cognition features captured and checked against ours first.
  * DiT-head config, test mode: sampled actions (DDIM-10, CFG 1.5, eta 0 —
    deterministic given the initial noise, dreamvla_model.py:944-975) with
    the same initial noise injected on both sides.

The frozen vision encoder (random-init MAE ViT-B, identical weights via
import_mae_vit inside import_dreamvla) is imported too, so the comparison
spans encoder -> resampler -> trunk -> decoders/heads. Text features are
computed once by the reference's (shimmed) clip and fed to the JAX model
as `text_features`; the real CLIP text encoder has its own import-parity
oracles (test_torch_parity.py, test_hf_oracles.py). The reference's
random patch-token permutation at mask_ratio=0 (vit_mae.py:157-182) is
harmless: the resampler's cross-attention is permutation-invariant over
media tokens and the CLS token is extracted before it.

Strongest closed-loop stand-in available here: the CALVIN/LIBERO
simulators are not installable in this environment.
"""

import os

import numpy as np
import pytest
import torch

from dreamvla_tpu.utils.ref_shims import REFERENCE_PATH, build_reference_model

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH),
    reason="reference checkout not available")

B, S, STEPS = 1, 3, 2

# Shared tiny-trunk shape set, identical to tests/test_reference_statedict
# (whose bitwise round-trip proves the two ctors agree on every param shape).
TINY = dict(
    sequence_length=S, num_resampler_query=3, num_obs_token_per_image=4,
    obs_pred=True, depth_pred=True, dino_feat_pred=True, sam_feat_pred=True,
    trajectory_pred=True, atten_only_obs=True, action_pred_steps=STEPS,
    transformer_layers=2, hidden_dim=64, transformer_heads=4,
    phase="finetune", track_label_patch_size=8)


def _jax_cfg(use_dit_head):
    from dreamvla_tpu.config import DreamVLAConfig

    return DreamVLAConfig(use_dit_head=use_dit_head, dit_type="DiT-S",
                          compute_dtype="float32", **TINY)


def _inputs():
    rng = np.random.default_rng(0)
    ip = rng.normal(size=(B, S, 3, 224, 224)).astype(np.float32)
    iw = rng.normal(size=(B, S, 3, 224, 224)).astype(np.float32)
    st = rng.normal(size=(B, S, 7)).astype(np.float32)
    st[..., 6] = rng.choice([-1.0, 1.0], size=(B, S))
    # same goal text at every timestep (the shim clip embeds token ids mod
    # 64; what matters is both frameworks see the same features)
    tt = np.broadcast_to(rng.integers(0, 64, size=(1, 1, 77)),
                         (B, S, 77)).astype(np.int64)
    al = rng.normal(size=(B, S, STEPS, 7)).astype(np.float32)
    return ip, iw, st, tt, al


def _build_pair(tmp_path_factory, use_dit_head):
    """(reference torch model in eval(), jax model, merged jax params)."""
    import jax

    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.utils.torch_import import import_dreamvla, merge_params

    mae_ckpt = tmp_path_factory.mktemp("ckpt") / "mae.pth"
    torch.save({"model": {}}, mae_ckpt)  # ctor loads strict=False
    torch.manual_seed(0)
    kw = dict(TINY)
    if use_dit_head:
        kw.update(use_dit_head=True, dit_type="DiT-S")
    ref = build_reference_model(str(mae_ckpt), **kw)
    ref.eval()  # parity runs with dropout off on both sides
    ref._init_model_type()  # the reference entry scripts do this too
    # (train.py:172, eval_calvin.py:109) before any forward
    # give the shimmed clip a non-zero text projection so the text path is
    # exercised with real values (its ctor zeros it)
    with torch.no_grad():
        ref.clip_model.text_projection.normal_(0.0, 0.05,
                                               generator=torch.Generator()
                                               .manual_seed(3))

    # full state dict INCLUDING the frozen vision encoder; the shim clip's
    # layout is not the real CLIP's, so its features are fed directly below
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in ref.named_parameters()
          if not k.startswith("clip_model.")}
    cfg = _jax_cfg(use_dit_head)
    tree, missing, unexpected = import_dreamvla(sd, cfg)
    assert missing == [], missing[:8]
    assert unexpected == [], unexpected[:8]

    model = DreamVLA(cfg)
    ip, iw, st, tt, al = _inputs()
    tf = _text_features(ref, tt)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)},
        image_primary=ip, image_wrist=iw, state=st, text_features=tf,
        action_label=al, mode="train", train=False)
    params = merge_params(variables["params"], tree)
    return ref, model, params


def _text_features(ref, tt):
    with torch.no_grad():
        feats = ref.clip_model.encode_text(
            torch.from_numpy(tt.reshape(B * S, 77)))
    return feats.numpy().astype(np.float32).reshape(B, S, -1)[:, 0]


@pytest.fixture(scope="module")
def pair_mlp(tmp_path_factory):
    return _build_pair(tmp_path_factory, use_dit_head=False)


@pytest.fixture(scope="module")
def pair_dit(tmp_path_factory):
    return _build_pair(tmp_path_factory, use_dit_head=True)


def _run_ref(ref, mode):
    ip, iw, st, tt, al = _inputs()
    with torch.no_grad():
        out = ref(torch.from_numpy(ip), torch.from_numpy(iw),
                  torch.from_numpy(st), torch.from_numpy(tt),
                  action_label=torch.from_numpy(al), mode=mode)
    return out  # the 10-tuple


def _run_mine(model, params, tf, mode):
    import jax

    ip, iw, st, tt, al = _inputs()
    return model.apply(
        {"params": params}, image_primary=ip, image_wrist=iw, state=st,
        text_features=tf, action_label=al, mode=mode, train=False,
        rngs={"diffusion": jax.random.PRNGKey(2)})


def _close(mine, ref_t, name, atol=3e-4):
    got = np.asarray(mine, np.float32)
    want = ref_t.detach().numpy().astype(np.float32).reshape(got.shape)
    np.testing.assert_allclose(got, want, atol=atol, rtol=0, err_msg=name)


def test_mlp_head_full_forward_parity(pair_mlp):
    ref, model, params = pair_mlp
    tf = _text_features(ref, _inputs()[3])
    r = _run_ref(ref, "train")
    m = _run_mine(model, params, tf, "train")
    # 10-tuple: arm, gripper, image, arm_state, gripper_state,
    # loss_arm_action, depth, traj, dino, sam  (dreamvla_model.py:991)
    assert r[3] is None and r[4] is None and r[5] is None
    _close(m.arm_action, r[0], "arm_action")
    _close(m.gripper_action, r[1], "gripper_action")
    _close(m.image_pred, r[2], "image_pred")
    _close(m.depth_pred, r[6], "depth_pred")
    _close(m.traj_pred, r[7], "traj_pred")
    _close(m.dino_pred, r[8], "dino_pred")
    _close(m.sam_pred, r[9], "sam_pred")


def test_dit_head_dream_preds_and_loss_parity(pair_dit):
    ref, model, params = pair_dit
    tf = _text_features(ref, _inputs()[3])
    rng = np.random.default_rng(1)
    n = 8 * B * S  # repeated_diffusion_steps x flattened batch
    fixed_noise = rng.normal(size=(n, STEPS, 7)).astype(np.float32)
    fixed_t = rng.integers(0, 100, size=(n,)).astype(np.int64)

    captured = {}
    orig_loss = ref.action_model.loss
    orig_randn_like, orig_randint = torch.randn_like, torch.randint

    def capture_loss(x, z):
        captured["x"], captured["z"] = x.detach(), z.detach()
        return orig_loss(x, z)

    try:
        ref.action_model.loss = capture_loss
        torch.randn_like = lambda x, **kw: torch.from_numpy(fixed_noise)
        torch.randint = (lambda low, high, size, **kw:
                         torch.from_numpy(fixed_t))
        r = _run_ref(ref, "train")
    finally:
        ref.action_model.loss = orig_loss
        torch.randn_like, torch.randint = orig_randn_like, orig_randint

    m = _run_mine(model, params, tf, "train")
    _close(m.image_pred, r[2], "image_pred")
    _close(m.depth_pred, r[6], "depth_pred")
    _close(m.traj_pred, r[7], "traj_pred")
    _close(m.dino_pred, r[8], "dino_pred")
    _close(m.sam_pred, r[9], "sam_pred")

    # cognition features entering the DiT match (reference repeats 8x,
    # dreamvla_model.py:930-933; ours tiles inside ActionDiffusionHead.loss)
    z_mine = np.asarray(m.action_features, np.float32).reshape(B * S, STEPS,
                                                               -1)
    _close(np.tile(z_mine, (8, 1, 1)), captured["z"], "cognition features")

    # DiT diffusion loss with identical noise/timesteps on both sides
    # (reference draws with torch RNG, action_model.py:59-60)
    from dreamvla_tpu.models.dit import ActionDiffusionHead, build_dit
    import jax

    ad = model.action_diffusion_config()
    head = ActionDiffusionHead(ad, build_dit(ad))
    labels = _inputs()[4].reshape(B * S, STEPS, 7)

    def dit_call(x_t, t, zz, drop_rng):
        # reference runs the net under eval() -> label dropout off
        return head.dit.apply({"params": params["action_model"]}, x_t, t, zz)

    loss = head.loss(dit_call, labels, z_mine, jax.random.PRNGKey(0),
                     noise=fixed_noise, t=fixed_t)
    ref_loss = float(r[0])
    assert abs(float(loss) - ref_loss) < 3e-4, (float(loss), ref_loss)


def test_dit_head_sampled_actions_parity(pair_dit):
    ref, model, params = pair_dit
    tf = _text_features(ref, _inputs()[3])
    rng = np.random.default_rng(2)
    fixed_noise = rng.normal(size=(B * S, STEPS, 7)).astype(np.float32)

    orig_randn = torch.randn
    try:
        torch.randn = lambda *a, **kw: torch.from_numpy(fixed_noise)
        r = _run_ref(ref, "test")
    finally:
        torch.randn = orig_randn

    m = _run_mine(model, params, tf, "test")
    z = np.asarray(m.action_features, np.float32).reshape(B * S, STEPS, -1)

    from dreamvla_tpu.models.dit import ActionDiffusionHead, build_dit
    import jax

    ad = model.action_diffusion_config()
    head = ActionDiffusionHead(ad, build_dit(ad))
    samples = np.asarray(head.sample(params["action_model"], z,
                                     jax.random.PRNGKey(0),
                                     noise=fixed_noise), np.float32)
    # reference: samples.unsqueeze(0)[..., :6] / [..., 6:]
    _close(samples[..., :6], r[0], "sampled arm actions", atol=1e-3)
    _close(samples[..., 6:], r[1], "sampled gripper actions", atol=1e-3)
