"""Orbax checkpoint round-trip, resume, retention, and finetune surgery."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.parallel.train_step import create_train_state
from dreamvla_tpu.train.checkpoints import (finetune_surgery,
                                            restore_checkpoint,
                                            save_checkpoint)
from dreamvla_tpu.utils.testing import (cached_train_state,
                                        make_synthetic_batch)


def make_state(cfg, tcfg, seed=0):
    model = DreamVLA(cfg)
    batch = make_synthetic_batch(cfg, tcfg, batch=1)
    state, tx, _ = cached_train_state(model, tcfg, batch, seed,
                                      total_steps=10)
    return state


def test_save_restore_roundtrip(tmp_path):
    cfg, tcfg = tiny_test()
    state = make_state(cfg, tcfg)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path), epoch=3, state=state)
    fresh = make_state(cfg, tcfg, seed=1)
    restored, resume_epoch = restore_checkpoint(str(tmp_path), fresh)
    assert resume_epoch == 4
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.params["text_projector"]["kernel"]),
        np.asarray(state.params["text_projector"]["kernel"]))
    # frozen encoder was stripped at save: fresh values kept
    np.testing.assert_allclose(
        np.asarray(restored.params["vision_encoder"]["cls_token"]),
        np.asarray(fresh.params["vision_encoder"]["cls_token"]))


def test_delete_previous_retention(tmp_path):
    cfg, tcfg = tiny_test()
    state = make_state(cfg, tcfg)
    save_checkpoint(str(tmp_path), 0, state)
    save_checkpoint(str(tmp_path), 1, state, delete_previous=True)
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str(tmp_path)) as mgr:
        assert mgr.all_steps() == [1]  # previous deleted, newest kept


def test_resave_same_epoch_keeps_latest_state(tmp_path):
    """Regression (advisor r4, high): orbax CheckpointManager.save() at an
    existing step silently returns False, so without the delete-before-save
    in save_checkpoint the SECOND save of an epoch (mid-epoch
    --save_every_iter, SIGTERM preemption, or the end-of-epoch save after a
    mid-epoch one) was dropped and resume restored stale state. Two saves
    into the same epoch must restore the LATER state."""
    cfg, tcfg = tiny_test()
    state = make_state(cfg, tcfg)
    state_a = state.replace(step=jnp.asarray(10, jnp.int32))
    save_checkpoint(str(tmp_path), epoch=3, state=state_a, mid_epoch=True,
                    delete_previous=True)
    mutated = dict(state.params)
    mutated["text_projector"] = {
        k: v + 1.0 for k, v in state.params["text_projector"].items()}
    state_b = state.replace(step=jnp.asarray(25, jnp.int32), params=mutated)
    # second mid-epoch save at the same step key (same epoch)
    save_checkpoint(str(tmp_path), epoch=3, state=state_b, mid_epoch=True,
                    delete_previous=True)
    # and the end-of-epoch save, again at step key 3
    save_checkpoint(str(tmp_path), epoch=3, state=state_b)
    fresh = make_state(cfg, tcfg, seed=1)
    restored, resume_epoch = restore_checkpoint(str(tmp_path), fresh)
    assert resume_epoch == 4  # end-of-epoch save won: epoch 3 completed
    assert int(restored.step) == 25
    np.testing.assert_allclose(
        np.asarray(restored.params["text_projector"]["kernel"]),
        np.asarray(state_b.params["text_projector"]["kernel"]))


def test_finetune_surgery_resets_and_truncates():
    cfg, tcfg = tiny_test()  # sequence_length 3
    pre_cfg = dataclasses.replace(cfg, sequence_length=5)
    pre_tcfg = dataclasses.replace(tcfg, window_size=8)
    pre = make_state(pre_cfg, pre_tcfg).params
    fresh = make_state(cfg, tcfg, seed=1).params
    merged = finetune_surgery(
        pre, fresh, sequence_length=cfg.sequence_length,
        reset_obs_token=True, reset_action_decoder=True)
    # pos emb truncated 5 -> 3 and copied
    np.testing.assert_allclose(
        np.asarray(merged["transformer_backbone_position_embedding"]),
        np.asarray(pre["transformer_backbone_position_embedding"][:, :3]))
    # reset subtrees keep fresh values
    np.testing.assert_allclose(np.asarray(merged["obs_tokens"]),
                               np.asarray(fresh["obs_tokens"]))
    np.testing.assert_allclose(
        np.asarray(merged["arm_action_head"]["kernel"]),
        np.asarray(fresh["arm_action_head"]["kernel"]))
    # non-reset subtrees import from pretrain
    np.testing.assert_allclose(
        np.asarray(merged["transformer_backbone"]["h_0"]["ln_1"]["scale"]),
        np.asarray(pre["transformer_backbone"]["h_0"]["ln_1"]["scale"]))


def test_mid_epoch_save_resumes_same_epoch(tmp_path):
    """Preemption-safety: a --save_every_iter checkpoint written DURING
    epoch 3 must make auto-resume re-enter epoch 3 (records last COMPLETED
    epoch = 2), not skip its remainder; step/opt continuity preserved."""
    cfg, tcfg = tiny_test()
    state = make_state(cfg, tcfg)
    state = state.replace(step=jnp.asarray(41, jnp.int32))
    save_checkpoint(str(tmp_path), epoch=3, state=state, mid_epoch=True)
    fresh = make_state(cfg, tcfg, seed=1)
    restored, resume_epoch = restore_checkpoint(str(tmp_path), fresh)
    assert resume_epoch == 3  # the interrupted epoch, not 4
    assert int(restored.step) == 41
    np.testing.assert_allclose(
        np.asarray(restored.params["text_projector"]["kernel"]),
        np.asarray(state.params["text_projector"]["kernel"]))
