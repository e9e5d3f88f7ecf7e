"""Golden tests for the trunk attention-mask rules.

The oracle below is a direct loop transcription of the *documented rule
order* of the reference `generate_attention_mask`
(models/dreamvla_model.py:25-66), kept deliberately naive so any vectorised
mistake in dreamvla_tpu.ops.masks shows up.
"""

import numpy as np
import pytest

from dreamvla_tpu.ops.masks import (
    MaskSpec,
    NEG_INF,
    build_allowed_matrix,
    build_attention_bias,
    sample_obs_drop,
)

INF = float("inf")


def oracle_mask(K, num_a, num_obs, aps, atten_goal=0, atten_goal_state=False,
                atten_only_obs=False, attn_robot_proprio_state=False,
                drop=None):
    num_b = num_obs + aps
    L = (num_a + num_b) * K
    m = np.zeros((L, L))
    for i in range(K):
        s = i * (num_a + num_b)
        e = s + num_a + num_b
        m[s:e, e:] = -INF
        m[:, s + num_a : e] = -INF
        if num_obs > 0 and aps:
            m[s + num_a + num_obs : s + num_a + num_obs + aps,
              s + num_a : s + num_a + num_obs] = 0.0
        if num_obs > 0 and atten_only_obs and aps:
            rows = slice(s + num_a + num_obs, s + num_a + num_obs + aps)
            m[rows] = -INF
            m[rows, s + 2 : s + num_a] = 0.0
            m[rows, s + num_a : s + num_a + num_obs] = 0.0
            if attn_robot_proprio_state:
                m[rows, s + 1 : s + 2] = 0.0
            if drop is not None:
                for num in np.where(drop[i])[0]:
                    m[rows, s + num_a + num] = -INF
        if num_obs > 0 and atten_goal:
            if i < K - atten_goal:
                pe = (i + atten_goal) * (num_a + num_b)
                if atten_goal_state:
                    m[s + num_a : s + num_a + num_obs, pe + 1 : pe + 2] = 0.0
    return m


CONFIGS = [
    # (K, num_a, num_obs, aps, goal, goal_state, only_obs, proprio)
    (3, 6, 4, 2, 0, False, False, False),
    (4, 6, 4, 2, 0, False, True, False),
    (4, 6, 4, 2, 0, False, True, True),
    (5, 6, 4, 2, 2, True, True, True),
    (5, 6, 4, 2, 2, False, True, True),  # atten_goal without goal_state: no-op
    (3, 6, 0, 2, 0, False, False, False),  # no obs tokens at all
    (2, 6, 4, 0, 0, False, False, False),  # no action tokens
    (14, 36, 18, 3, 4, True, True, True),  # canonical CALVIN pretrain shape
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_allowed_matrix_matches_oracle(cfg):
    K, na, nobs, aps, goal, goal_state, only_obs, proprio = cfg
    spec = MaskSpec(k=K, num_a=na, num_obs=nobs, action_pred_steps=aps,
                    atten_goal=goal, atten_goal_state=goal_state,
                    atten_only_obs=only_obs,
                    attn_robot_proprio_state=proprio)
    got = build_allowed_matrix(spec)
    want = oracle_mask(K, na, nobs, aps, goal, goal_state, only_obs, proprio) == 0.0
    np.testing.assert_array_equal(got, want)


def test_bias_values():
    spec = MaskSpec(k=2, num_a=6, num_obs=4, action_pred_steps=2,
                    atten_only_obs=True)
    bias = np.asarray(build_attention_bias(spec))
    allowed = build_allowed_matrix(spec)
    assert set(np.unique(bias[allowed])) == {0.0}
    assert set(np.unique(bias[~allowed])) == {NEG_INF}


def test_obs_drop_matches_oracle():
    import jax

    spec = MaskSpec(k=3, num_a=6, num_obs=8, action_pred_steps=2,
                    atten_only_obs=True, attn_robot_proprio_state=True,
                    mask_l_obs_ratio=0.5)
    drop = sample_obs_drop(jax.random.PRNGKey(0), spec)
    assert drop.shape == (3, 8)
    assert np.all(np.sum(np.asarray(drop), axis=1) == 4)  # exactly 50% per block
    bias = np.asarray(build_attention_bias(spec, obs_drop=drop))
    want = oracle_mask(3, 6, 8, 2, atten_only_obs=True,
                       attn_robot_proprio_state=True, drop=np.asarray(drop))
    np.testing.assert_array_equal(bias == 0.0, want == 0.0)


def test_no_fully_masked_query_rows():
    # every query must see at least one key or softmax NaNs out
    for cfg in CONFIGS:
        K, na, nobs, aps, goal, goal_state, only_obs, proprio = cfg
        spec = MaskSpec(k=K, num_a=na, num_obs=nobs, action_pred_steps=aps,
                        atten_goal=goal, atten_goal_state=goal_state,
                        atten_only_obs=only_obs,
                        attn_robot_proprio_state=proprio)
        allowed = build_allowed_matrix(spec)
        assert allowed.any(axis=1).all()
