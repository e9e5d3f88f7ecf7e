"""Block-structured attention mask for the DreamVLA trunk — as a *function*.

The reference materialises an (L, L) additive mask as an `nn.Parameter` and
rebuilds it with host-side np.random every forward during pretrain
(`models/dreamvla_model.py:25-66, :286-298, :610-628`). Here the mask is a
pure function of a static `MaskSpec` plus an optional per-step obs-drop
boolean array drawn with `jax.random` — jit-safe, never a parameter, and
cheap to rebuild (it is a trace-time constant unless dropping is active).

Token layout per timestep block (K blocks total):
  A-part (num_a tokens): [text(1), state(1), img_primary(R), img_wrist(R),
                          cls_primary(1), cls_wrist(1)]
  B-part (num_b tokens): [obs/query tokens(num_obs), action tokens(aps)]

Visibility rules (same semantics and rule-application order as the
reference's `generate_attention_mask`):
  1. block-causal: queries in block i cannot see keys in blocks > i;
  2. B-part keys are invisible to everyone by default;
  3. action queries may see their own block's obs-query keys;
  4. `atten_only_obs`: action queries see *only* their own block's
     image/cls tokens (+ state if `attn_robot_proprio_state`) and their own
     obs-query keys, minus any randomly dropped obs keys;
  5. `atten_goal` g > 0 with `atten_goal_state`: obs queries of block i
     (i < K-g) may additionally see the *state* key of block i+g (a future
     key — intentional goal leakage during pretrain).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

NEG_INF = -1.0e9  # finite "minus infinity": safe in bf16 kernels post-softmax


@dataclasses.dataclass(frozen=True)
class MaskSpec:
    """Static description of the trunk token layout and visibility flags."""

    k: int  # number of timestep blocks (sequence_length)
    num_a: int  # non-learnable tokens per block: 1+1+2*R+2
    num_obs: int  # total dream-query tokens per block (all modalities)
    action_pred_steps: int
    atten_goal: int = 0
    atten_goal_state: bool = False
    atten_only_obs: bool = False
    attn_robot_proprio_state: bool = False
    mask_l_obs_ratio: float = 0.0

    @property
    def num_b(self) -> int:
        return self.num_obs + self.action_pred_steps

    @property
    def block(self) -> int:
        return self.num_a + self.num_b

    @property
    def seq_len(self) -> int:
        return self.block * self.k


def build_allowed_matrix(spec: MaskSpec) -> np.ndarray:
    """(L, L) bool matrix of the deterministic visibility rules (host-side)."""
    nb = spec.block
    L = spec.seq_len
    q = np.arange(L)
    qi, j = q // nb, q % nb  # block index, intra-block offset per position
    ki, kj = qi[None, :], j[None, :]  # key views (1, L)
    qi, qj = qi[:, None], j[:, None]  # query views (L, 1)

    na, nobs, aps = spec.num_a, spec.num_obs, spec.action_pred_steps

    # rule 1+2: causal over blocks, B-part keys hidden from everyone
    allowed = (ki <= qi) & (kj < na)

    is_action_q = (qj >= na + nobs) & (qj < na + nobs + aps)
    own_block = ki == qi
    key_is_own_obs = own_block & (kj >= na) & (kj < na + nobs)

    if nobs > 0 and aps > 0:
        # rule 3: action queries see their own obs-query keys
        allowed |= is_action_q & key_is_own_obs
        if spec.atten_only_obs:
            # rule 4: action queries see ONLY selected own-block keys
            vis = own_block & (kj >= 2) & (kj < na)  # images + cls
            vis |= key_is_own_obs
            if spec.attn_robot_proprio_state:
                vis |= own_block & (kj == 1)  # state token
            allowed = np.where(is_action_q, vis, allowed)

    if nobs > 0 and spec.atten_goal > 0 and spec.atten_goal_state:
        # rule 5: obs queries see the goal block's state key
        is_obs_q = (qj >= na) & (qj < na + nobs)
        goal_state_key = (ki == qi + spec.atten_goal) & (kj == 1)
        allowed |= is_obs_q & (qi < spec.k - spec.atten_goal) & goal_state_key

    return allowed


def build_attention_bias(
    spec: MaskSpec,
    obs_drop: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(L, L) additive attention bias (0 visible / NEG_INF hidden).

    obs_drop: optional (k, num_obs) bool; True drops that obs key from the
    *action queries* of the same block (reference `mask_l_obs_ratio` path,
    dreamvla_model.py:55-59). Only meaningful with `atten_only_obs`.
    """
    allowed = build_allowed_matrix(spec)
    bias = jnp.where(jnp.asarray(allowed), 0.0, NEG_INF).astype(dtype)
    if obs_drop is not None and spec.num_obs > 0 and spec.action_pred_steps > 0:
        nb, na, nobs, aps = spec.block, spec.num_a, spec.num_obs, spec.action_pred_steps
        j = np.arange(spec.seq_len) % nb
        qi = np.arange(spec.seq_len) // nb
        action_rows = (j >= na + nobs) & (j < na + nobs + aps)
        obs_cols = (j >= na) & (j < na + nobs)
        # (L,) -> per-position (block, obs-slot) lookups into obs_drop
        col_drop = jnp.where(
            jnp.asarray(obs_cols),
            obs_drop[qi, np.where(obs_cols, j - na, 0)],
            False,
        )  # (L,) dropped keys
        same_block = np.equal.outer(qi, qi)
        hit = jnp.asarray(action_rows)[:, None] & jnp.asarray(same_block) & col_drop[None, :]
        bias = jnp.where(hit, NEG_INF, bias)
    return bias


def sample_obs_drop(rng, spec: MaskSpec) -> jnp.ndarray | None:
    """Draw the per-block obs-drop pattern; exactly
    floor(mask_l_obs_ratio*num_obs) keys dropped per block, without
    replacement (reference uses np.random.choice(replace=False))."""
    import jax

    count = int(spec.mask_l_obs_ratio * spec.num_obs)
    if count <= 0:
        return None
    noise = jax.random.uniform(rng, (spec.k, spec.num_obs))
    ranks = jnp.argsort(jnp.argsort(noise, axis=-1), axis=-1)
    return ranks < count
