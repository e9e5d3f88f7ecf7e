"""DreamVLA top-level model (Flax).

Capability parity with reference `models/dreamvla_model.py` (class DreamVLA):
  * embeds CLIP text, proprio state (one-hot gripper), and two camera views
    through a frozen MAE ViT + perceiver resampler (ctor :193-231, forward
    :643-737);
  * appends learnable dream-query tokens (obs/depth/dino/sam/traj) and
    action-prediction tokens per timestep (:236-276, :739-757);
  * adds a learned per-timestep position embedding, LayerNorms, and runs the
    GPT-2 trunk under the block-structured mask (:758-790);
  * decodes each modality with a 2-block ViT decoder (:793-911);
  * predicts actions with an MLP (tanh arm / sigmoid gripper, :458-471,
    :923-926) or a DiT diffusion / flow-matching head (:927-987).

TPU design deltas (see module docstrings for specifics):
  * the attention mask is a function -> additive bias consumed by the Pallas
    flash kernel; the stochastic obs-drop uses jax.random under make_rng;
  * text is encoded once per sequence (the reference re-encodes the same
    tokens S times, dreamvla_model.py:646-653 — identical math);
  * frozen encoders are stop_gradient'ed pure calls; bf16 compute dtype with
    fp32 params everywhere;
  * all (B, S, views) leading dims are flattened so every matmul is one big
    MXU call; DiT sampling happens *outside* apply as a lax.scan (see
    `dreamvla_tpu.models.dit.ActionDiffusionHead.sample`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from dreamvla_tpu.config import DreamVLAConfig
from dreamvla_tpu.models.clip_text import CLIPTextEncoder
from dreamvla_tpu.models.decoders import ModalityDecoder
from dreamvla_tpu.models.dit import ActionDiffusionConfig, ActionDiffusionHead, build_dit
from dreamvla_tpu.models.gpt2 import GPT2Trunk
from dreamvla_tpu.models.resampler import PerceiverResampler
from dreamvla_tpu.models.vit_mae import MaskedAutoencoderViT
from dreamvla_tpu.ops.attention import BlockSplit, token_permutation
from dreamvla_tpu.ops.masks import MaskSpec, build_attention_bias, sample_obs_drop


@struct.dataclass
class DreamVLAOutputs:
    """Mirror of the reference forward's 10-tuple, as named fields."""

    arm_action: Optional[jnp.ndarray] = None  # (B,S,steps,6) MLP head
    gripper_action: Optional[jnp.ndarray] = None  # (B,S,steps,1)
    image_pred: Optional[jnp.ndarray] = None  # (B*S, 2, P, L, p*p*3)
    depth_pred: Optional[jnp.ndarray] = None  # (B*S, 2, P, L, p*p)
    dino_pred: Optional[jnp.ndarray] = None  # (B*S, 2, P, 256, 768)
    sam_pred: Optional[jnp.ndarray] = None  # (B*S, 2, P, 256, 256)
    traj_pred: Optional[jnp.ndarray] = None  # (B*S, V, P, L, C)
    dit_loss: Optional[jnp.ndarray] = None  # scalar (train, DiT head)
    action_features: Optional[jnp.ndarray] = None  # (B,S,steps,H) for DiT


class DreamVLA(nn.Module):
    cfg: DreamVLAConfig

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def setup(self):
        cfg = self.cfg
        h = cfg.hidden_dim
        dt = self.dtype

        # frozen encoders -------------------------------------------------
        if cfg.use_dinosiglip:
            from dreamvla_tpu.models.dinosiglip import DinoSigLIPEncoder

            self.vision_encoder = DinoSigLIPEncoder(
                dtype=dt,
                dino_kw=dict(img_size=cfg.image_size,
                             patch_size=cfg.vision_patch_size,
                             embed_dim=cfg.dino_dim, depth=cfg.dino_depth,
                             num_heads=cfg.dino_heads,
                             pos_grid=cfg.dino_pos_grid),
                siglip_kw=dict(img_size=cfg.image_size,
                               patch_size=cfg.vision_patch_size,
                               embed_dim=cfg.siglip_dim,
                               depth=cfg.siglip_depth,
                               num_heads=cfg.siglip_heads,
                               mlp_hidden=cfg.siglip_mlp),
            )
        else:
            self.vision_encoder = MaskedAutoencoderViT(
                img_size=cfg.image_size, patch_size=cfg.patch_size,
                embed_dim=cfg.vision_embed_dim, depth=cfg.vision_depth,
                num_heads=cfg.vision_heads, dtype=dt,
                scan_unroll=cfg.scan_unroll,
            )
        if cfg.include_text_encoder:
            self.text_encoder = CLIPTextEncoder(
                vocab_size=cfg.clip_vocab, width=cfg.clip_width,
                heads=cfg.clip_heads, layers=cfg.clip_layers,
                embed_dim=cfg.clip_embed_dim, dtype=dt)

        # projectors / state encoders --------------------------------------
        self.text_projector = nn.Dense(h, dtype=dt)
        self.arm_state_encoder = nn.Dense(h, dtype=dt)
        self.gripper_state_encoder = nn.Dense(h, dtype=dt)
        self.state_projector = nn.Dense(h, dtype=dt)
        self.perceiver_resampler = PerceiverResampler(
            dim=cfg.vision_width, depth=cfg.resampler_depth,
            num_latents=cfg.num_resampler_query, dtype=dt,
        )
        self.image_primary_projector = nn.Dense(h, dtype=dt)
        self.image_wrist_projector = nn.Dense(h, dtype=dt)
        self.cls_token_primary_projector = nn.Dense(h, dtype=dt)
        self.cls_token_wrist_projector = nn.Dense(h, dtype=dt)

        # learnable query tokens -------------------------------------------
        zeros = nn.initializers.zeros
        if cfg.action_pred_steps > 0:
            self.action_pred_token = self.param(
                "action_pred_token", zeros, (1, 1, cfg.action_pred_steps, h))
        if cfg.obs_pred:
            self.obs_tokens = self.param(
                "obs_tokens", zeros, (1, 1, cfg.num_obs_token, h))
        if not cfg.share_query:
            if cfg.depth_pred:
                self.depth_tokens = self.param(
                    "depth_tokens", zeros, (1, 1, cfg.num_depth_token, h))
            if cfg.dino_feat_pred:
                self.dino_feat_tokens = self.param(
                    "dino_feat_tokens", zeros, (1, 1, cfg.num_dino_token, h))
            if cfg.sam_feat_pred:
                self.sam_feat_tokens = self.param(
                    "sam_feat_tokens", zeros, (1, 1, cfg.num_sam_token, h))
            if cfg.trajectory_pred:
                self.trajectory_tokens = self.param(
                    "trajectory_tokens", zeros, (1, 1, cfg.num_traj_token, h))

        self.transformer_backbone_position_embedding = self.param(
            "transformer_backbone_position_embedding",
            nn.initializers.normal(0.02), (1, cfg.sequence_length, 1, h))
        self.embedding_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt)
        # role-split attention over reordered tokens (exact; ~2.7x fewer
        # attention FLOPs). cfg.trunk_token_reorder=False falls back to
        # dense flash over the interleaved layout.
        split = None
        if cfg.trunk_token_reorder and cfg.total_query_tokens > 0:
            split = BlockSplit(k=cfg.sequence_length, na=cfg.num_a,
                               nobs=cfg.total_query_tokens,
                               aps=cfg.action_pred_steps)
        self.transformer_backbone = GPT2Trunk(
            num_layers=cfg.transformer_layers, num_heads=cfg.transformer_heads,
            dropout=cfg.dropout, dtype=dt, remat=cfg.remat, split=split,
            scan_unroll=cfg.scan_unroll,
        )

        # dream decoders ----------------------------------------------------
        per = cfg.num_obs_token_per_image
        q_in = h // 4 if cfg.share_query else h
        fdec = cfg.fused_decoder_train
        if cfg.obs_pred:
            self.image_decoder = ModalityDecoder(
                num_query_tokens=per, num_mask_tokens=cfg.num_mask_tokens,
                out_dim=cfg.patch_size**2 * 3, hidden_dim=h, in_dim=q_in,
                fused=fdec, dtype=dt)
        if cfg.depth_pred:
            if cfg.use_dpt_head:
                from dreamvla_tpu.models.dpt_head import DPTHead

                # 256 tokens/slot feed the DPT head (dreamvla_model.py:369)
                self.depth_decoder = ModalityDecoder(
                    num_query_tokens=per, num_mask_tokens=256 * cfg.pred_num,
                    out_dim=cfg.patch_size**2, hidden_dim=h, in_dim=q_in,
                    return_features=True, fused=fdec, dtype=dt)
                self.dpt_head = DPTHead(in_channels=h, dtype=dt)
            else:
                self.depth_decoder = ModalityDecoder(
                    num_query_tokens=per, num_mask_tokens=cfg.num_mask_tokens,
                    out_dim=cfg.patch_size**2, hidden_dim=h, in_dim=q_in,
                    relu_out=True, fused=fdec, dtype=dt)
        if cfg.dino_feat_pred:
            self.dino_decoder = ModalityDecoder(
                num_query_tokens=per, num_mask_tokens=256 * cfg.pred_num,
                out_dim=768, hidden_dim=h, in_dim=q_in, fused=fdec, dtype=dt)
        if cfg.sam_feat_pred:
            self.sam_decoder = ModalityDecoder(
                num_query_tokens=per, num_mask_tokens=256 * cfg.pred_num,
                out_dim=256, hidden_dim=h, in_dim=q_in, sincos_pos=False,
                fused=fdec, dtype=dt)
        if cfg.trajectory_pred:
            if cfg.no_unshuffle:
                traj_masks = cfg.traj_grid**2 * cfg.pred_num
                traj_out = 2
            else:
                traj_masks = cfg.num_mask_tokens
                traj_out = (cfg.patch_size // cfg.track_label_patch_size) ** 2 * 2
            self.traj_decoder = ModalityDecoder(
                num_query_tokens=per, num_mask_tokens=traj_masks,
                out_dim=traj_out, hidden_dim=h, in_dim=h, fused=fdec, dtype=dt)

        # action head --------------------------------------------------------
        if cfg.use_dit_head:
            self.action_model = build_dit(self.action_diffusion_config(), dtype=dt)
        else:
            self.action_decoder_fc1 = nn.Dense(h // 2, dtype=dt)
            self.action_decoder_fc2 = nn.Dense(h // 2, dtype=dt)
            self.arm_action_head = nn.Dense(6, dtype=dt)
            self.gripper_action_head = nn.Dense(1, dtype=dt)

    # ------------------------------------------------------------------ util
    def action_diffusion_config(self) -> ActionDiffusionConfig:
        cfg = self.cfg
        return ActionDiffusionConfig(
            dit_type=cfg.dit_type, action_horizon=cfg.action_pred_steps,
            token_size=cfg.hidden_dim, flow_matching=cfg.use_fm,
        )

    def mask_spec(self) -> MaskSpec:
        cfg = self.cfg
        return MaskSpec(
            k=cfg.sequence_length, num_a=cfg.num_a,
            num_obs=cfg.total_query_tokens,
            action_pred_steps=cfg.action_pred_steps,
            atten_goal=cfg.atten_goal, atten_goal_state=cfg.atten_goal_state,
            atten_only_obs=cfg.atten_only_obs,
            attn_robot_proprio_state=cfg.attn_robot_proprio_state,
            mask_l_obs_ratio=cfg.mask_l_obs_ratio,
        )

    def encode_state(self, state):
        """state: (B, S, 7|8) -> (B, S, 1, H). Gripper is one-hot of
        (value >= 1) unless gripper_width feeds raw widths."""
        cfg = self.cfg
        arm = self.arm_state_encoder(state[..., :6].astype(self.dtype))
        if cfg.gripper_width:
            grip_in = state[..., 6:8].astype(self.dtype)
        else:
            grip_cls = (state[..., 6] >= 1).astype(jnp.int32)
            grip_in = jax.nn.one_hot(grip_cls, 2, dtype=self.dtype)
        grip = self.gripper_state_encoder(grip_in)
        emb = self.state_projector(jnp.concatenate([arm, grip], axis=-1))
        return emb[:, :, None, :]

    def encode_views(self, image_primary, image_wrist):
        """(B,S,3,H,W) x2 -> image tokens (B,S,2R,H), cls tokens (B,S,2,H)."""
        cfg = self.cfg
        b, s = image_primary.shape[:2]
        imgs = jnp.concatenate(
            [image_primary.reshape(b * s, *image_primary.shape[2:]),
             image_wrist.reshape(b * s, *image_wrist.shape[2:])], axis=0)
        if cfg.use_dinosiglip:
            patches, cls_vec = self.vision_encoder(imgs)
            patches = jax.lax.stop_gradient(patches)
            cls = jax.lax.stop_gradient(cls_vec)[:, None, :]
        else:
            feats, _, _ = self.vision_encoder.forward_encoder(imgs, mask_ratio=0.0)
            feats = jax.lax.stop_gradient(feats)  # frozen encoder
            cls, patches = feats[:, :1, :], feats[:, 1:, :]
        lat = self.perceiver_resampler(patches)  # (2BS, R, Dv)
        lat_p, lat_w = jnp.split(lat, 2, axis=0)
        cls_p, cls_w = jnp.split(cls, 2, axis=0)
        h = cfg.hidden_dim
        img_tokens = jnp.concatenate(
            [self.image_primary_projector(lat_p).reshape(b, s, -1, h),
             self.image_wrist_projector(lat_w).reshape(b, s, -1, h)], axis=2)
        cls_tokens = jnp.concatenate(
            [self.cls_token_primary_projector(cls_p).reshape(b, s, -1, h),
             self.cls_token_wrist_projector(cls_w).reshape(b, s, -1, h)], axis=2)
        return img_tokens, cls_tokens

    # ------------------------------------------------------------------ main
    def __call__(
        self,
        image_primary: jnp.ndarray,
        image_wrist: jnp.ndarray,
        state: jnp.ndarray,
        text_tokens: Optional[jnp.ndarray] = None,
        text_features: Optional[jnp.ndarray] = None,
        action_label: Optional[jnp.ndarray] = None,
        mode: str = "train",
        train: bool = False,
        trunk_pipeline=None,
    ) -> DreamVLAOutputs:
        img_tokens, cls_tokens = self.encode_views(image_primary, image_wrist)
        return self.forward_from_tokens(
            img_tokens, cls_tokens, state, text_tokens=text_tokens,
            text_features=text_features, action_label=action_label,
            mode=mode, train=train, trunk_pipeline=trunk_pipeline)

    def forward_from_tokens(
        self,
        img_tokens: jnp.ndarray,  # (B, S, 2R, H) projected resampler tokens
        cls_tokens: jnp.ndarray,  # (B, S, 2, H) projected cls tokens
        state: jnp.ndarray,
        text_tokens: Optional[jnp.ndarray] = None,
        text_features: Optional[jnp.ndarray] = None,
        action_label: Optional[jnp.ndarray] = None,
        mode: str = "train",
        train: bool = False,
        trunk_pipeline=None,
    ) -> DreamVLAOutputs:
        """Trunk + heads over precomputed per-frame vision tokens.

        Per-frame vision features are position-independent, so a closed-loop
        policy can cache them across env steps and encode only the newest
        frame (the reference re-encodes the whole history every step,
        eval_utils_calvin.py:114-134) — identical math, ~half the FLOPs.
        """
        cfg = self.cfg
        b, s = state.shape[:2]
        h = cfg.hidden_dim

        # text ---------------------------------------------------------------
        if text_features is None:
            if not cfg.include_text_encoder:
                raise ValueError("model built without text encoder; pass text_features")
            text_features = jax.lax.stop_gradient(self.text_encoder(text_tokens))
        text_emb = self.text_projector(text_features.astype(self.dtype))
        text_emb = jnp.broadcast_to(text_emb[:, None, None, :], (b, s, 1, h))

        state_emb = self.encode_state(state)

        # token assembly ------------------------------------------------------
        parts = [text_emb, state_emb, img_tokens, cls_tokens]
        if cfg.obs_pred:
            parts.append(jnp.broadcast_to(
                self.obs_tokens.astype(self.dtype), (b, s, cfg.num_obs_token, h)))
        if not cfg.share_query:
            if cfg.depth_pred:
                parts.append(jnp.broadcast_to(
                    self.depth_tokens.astype(self.dtype), (b, s, cfg.num_depth_token, h)))
            if cfg.dino_feat_pred:
                parts.append(jnp.broadcast_to(
                    self.dino_feat_tokens.astype(self.dtype), (b, s, cfg.num_dino_token, h)))
            if cfg.sam_feat_pred:
                parts.append(jnp.broadcast_to(
                    self.sam_feat_tokens.astype(self.dtype), (b, s, cfg.num_sam_token, h)))
            if cfg.trajectory_pred:
                parts.append(jnp.broadcast_to(
                    self.trajectory_tokens.astype(self.dtype), (b, s, cfg.num_traj_token, h)))
        if cfg.action_pred_steps > 0:
            parts.append(jnp.broadcast_to(
                self.action_pred_token.astype(self.dtype),
                (b, s, cfg.action_pred_steps, h)))
        x = jnp.concatenate(parts, axis=2)
        x = x + self.transformer_backbone_position_embedding.astype(self.dtype)
        x = x.reshape(b, s * cfg.tokens_per_step, h)

        # trunk ---------------------------------------------------------------
        spec = self.mask_spec()
        obs_drop = None
        if train and cfg.phase == "pretrain" and spec.mask_l_obs_ratio > 0:
            obs_drop = sample_obs_drop(self.make_rng("mask"), spec)
        bias = build_attention_bias(spec, obs_drop=obs_drop)
        x = self.embedding_layer_norm(x)
        if self.transformer_backbone.split is not None:
            # trunk runs in [A | dream-query | action] token order so the
            # role-split attention slices contiguously (the interleaved
            # layout's strided gathers cost more than the kernel itself);
            # everything else in the trunk is per-token, so permuting
            # around it is exact. See ops.attention.token_permutation.
            import numpy as np

            perm = token_permutation(self.transformer_backbone.split)
            inv = np.argsort(perm)
            # whole-block fused kernels: forward-only in test mode
            # (ops.gpt2_fused), differentiable with in-kernel dropout in
            # training mode (ops.gpt2_fused_train)
            fused = (cfg.fused_trunk_inference if not train
                     else cfg.fused_trunk_train)
            x = self.transformer_backbone(
                x[:, perm], bias=bias[perm][:, perm],
                deterministic=not train,
                fused=fused,
                pipeline=trunk_pipeline)[:, inv]
        else:
            x = self.transformer_backbone(x, bias=bias,
                                          deterministic=not train,
                                          pipeline=trunk_pipeline)
        x = x.reshape(b, s, cfg.tokens_per_step, h)

        out = DreamVLAOutputs()
        qs = cfg.num_a  # pred_token_start_idx
        per = cfg.num_obs_token_per_image

        def decode(decoder, tokens, n_tok, ch_slice):
            """slice queries -> (B*S*views, per, in) -> decoder -> reference
            view (B*S, views, pred_num, L/pred, out)."""
            views = n_tok // per
            q = tokens[..., ch_slice] if ch_slice else tokens
            q = q.reshape(b * s * views, per, q.shape[-1])
            p = decoder(q)
            return p.reshape(b * s, views, cfg.pred_num, -1, p.shape[-1])

        if mode == "train":
            cur = qs
            if cfg.obs_pred:
                sl = slice(0, h // 4) if cfg.share_query else None
                out = out.replace(image_pred=decode(
                    self.image_decoder, x[:, :, cur:cur + cfg.num_obs_token],
                    cfg.num_obs_token, sl))
                if not cfg.share_query:
                    cur += cfg.num_obs_token
            if cfg.depth_pred:
                sl = slice(h // 4, h // 2) if cfg.share_query else None
                if cfg.use_dpt_head:
                    q = x[:, :, cur:cur + cfg.num_depth_token]
                    q = q[..., sl] if sl else q
                    q = q.reshape(b * s * 2, per, q.shape[-1])
                    feats = self.depth_decoder(q)  # (N, per+256P, H)
                    grid = 16
                    maps = []
                    for i in range(cfg.pred_num):
                        # reference slices 256-token blocks from the decoder
                        # output head-on (dreamvla_model.py:833-834)
                        blk = feats[:, i * 256:(i + 1) * 256, :]
                        maps.append(self.dpt_head([blk] * 4, grid, grid))
                    dm = jnp.stack(maps, axis=1)  # (N, P, 1, H', W')
                    out = out.replace(depth_pred=dm.reshape(
                        (b * s, 2) + dm.shape[1:]))
                else:
                    out = out.replace(depth_pred=decode(
                        self.depth_decoder, x[:, :, cur:cur + cfg.num_depth_token],
                        cfg.num_depth_token, sl))
                if not cfg.share_query:
                    cur += cfg.num_depth_token
            if cfg.dino_feat_pred:
                sl = slice(h // 2, 3 * h // 4) if cfg.share_query else None
                out = out.replace(dino_pred=decode(
                    self.dino_decoder, x[:, :, cur:cur + cfg.num_dino_token],
                    cfg.num_dino_token, sl))
                if not cfg.share_query:
                    cur += cfg.num_dino_token
            if cfg.sam_feat_pred:
                sl = slice(3 * h // 4, h) if cfg.share_query else None
                out = out.replace(sam_pred=decode(
                    self.sam_decoder, x[:, :, cur:cur + cfg.num_sam_token],
                    cfg.num_sam_token, sl))
                if not cfg.share_query:
                    cur += cfg.num_sam_token
            if cfg.trajectory_pred:
                out = out.replace(traj_pred=decode(
                    self.traj_decoder, x[:, :, cur:cur + cfg.num_traj_token],
                    cfg.num_traj_token, None))
                cur += cfg.num_traj_token

        # actions ----------------------------------------------------------------
        if cfg.action_pred_steps > 0:
            a0 = qs + cfg.total_query_tokens
            act_feat = x[:, :, a0:a0 + cfg.action_pred_steps, :]
            out = out.replace(action_features=act_feat)
            if not cfg.use_dit_head:
                f = nn.relu(self.action_decoder_fc1(act_feat))
                f = nn.relu(self.action_decoder_fc2(f))
                out = out.replace(
                    arm_action=jnp.tanh(self.arm_action_head(f)),
                    gripper_action=nn.sigmoid(self.gripper_action_head(f)),
                )
            elif mode == "train":
                if action_label is None:
                    raise ValueError("DiT head training requires action_label")
                s_eff = cfg.sequence_length - cfg.atten_goal
                z = act_feat[:, :s_eff].reshape(b * s_eff, cfg.action_pred_steps, h)
                labels = action_label[:, :s_eff].reshape(
                    b * s_eff, cfg.action_pred_steps, -1)
                head = ActionDiffusionHead(self.action_diffusion_config(),
                                           self.action_model)

                def dit_call(x_t, t, zz, drop_rng):
                    return self.action_model(x_t, t, zz, train=True,
                                             drop_rng=drop_rng)

                loss = head.loss(dit_call, labels.astype(jnp.float32),
                                 z.astype(jnp.float32),
                                 self.make_rng("diffusion"))
                out = out.replace(dit_loss=loss)
        return out
