"""CALVIN ABC-D closed-loop benchmark driver.

Capability parity with reference `eval_calvin.py` + `utils/eval_utils_calvin.py`:
the official 1000-sequence x 5-subtask protocol (EP_LEN=360), frozen
`assets/eval_sequences.json`, per-subtask rollouts against calvin_env's
PlayTable sim with the task oracle, sequence sharding across hosts, and
result aggregation (success-rate per chain position + average rollout
length).

The simulator stack (calvin_env, pybullet, hydra task oracle) is imported
lazily — this module is importable without them; the policy side only needs
a `PolicyWrapper`. Multi-host sharding uses jax process_index/count instead
of torch.distributed ranks, and result gathering is a host-side
`multihost_utils.process_allgather` on the padded result vector (replaces
gather_object, eval_utils_calvin.py:213-214).
"""

from __future__ import annotations

import json
import os
from collections import Counter
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

EP_LEN = 360
NUM_SEQUENCES = 1000
ASSETS = Path(__file__).resolve().parents[2] / "assets"


def load_eval_sequences(path: Optional[str] = None):
    with open(path or ASSETS / "eval_sequences.json") as f:
        return json.load(f)


def count_success(results: Sequence[int]) -> List[float]:
    counter = Counter(results)
    return [sum(counter[j] for j in reversed(range(i, 6))) / len(results)
            for i in range(1, 6)]


def rollout(env, policy, task_oracle, subtask: str, lang: str) -> bool:
    """<=360 env steps of one language subtask (eval_utils_calvin.py:243-296)."""
    obs = env.get_obs()
    policy.reset()
    start_info = env.get_info()
    planned: List[np.ndarray] = []
    for step in range(EP_LEN):
        action = policy.step(obs, lang, step)
        if len(planned) == 0:
            if action.shape == (7,):
                planned.append(action)
            else:
                planned.extend(list(action))
        action = planned.pop(0)
        obs, _, _, info = env.step(action)
        if task_oracle.get_task_info_for_set(start_info, info, {subtask}):
            return True
    return False


def evaluate_sequence(env, policy, task_oracle, initial_state, sequence,
                      val_annotations, diverse_inst=False, seq_idx=-1,
                      reset: bool = False) -> int:
    """reset=True re-resets the env to the sequence's initial condition
    before every subtask (reference --reset, eval_utils_calvin.py:232-236)."""
    from calvin_agent.evaluation.multistep_sequences import (
        get_env_state_for_initial_condition)

    robot_obs, scene_obs = get_env_state_for_initial_condition(initial_state)
    env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
    successes = 0
    for i, subtask in enumerate(sequence):
        if reset and i > 0:
            env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
        if diverse_inst:
            lang = val_annotations[seq_idx][i]
        else:
            lang = val_annotations[subtask][0]
        lang = lang.split("\n")[0].replace("’", "'")
        if rollout(env, policy, task_oracle, subtask, lang):
            successes += 1
        else:
            return successes
    return successes


class _SlotState:
    """Per-env progress through one eval sequence (chain of 5 subtasks)."""

    def __init__(self, seq_idx, initial_state, sequence):
        self.seq_idx = seq_idx
        self.initial_state = initial_state
        self.sequence = list(sequence)
        self.subtask_i = 0
        self.successes = 0
        self.step = 0
        self.start_info = None
        self.lang = None
        self.done = False


def evaluate_sequences_batched(envs, policy, task_oracle, work,
                               val_annotations, diverse_inst: bool = False,
                               ep_len: int = EP_LEN):
    """Run the 5-subtask chain protocol over K envs with ONE batched policy.

    envs: K simulator instances; policy: BatchedPolicyWrapper-compatible
    (reset_slot / set_goal / step(obs_list, timesteps)); work: list of
    (seq_idx, initial_state, sequence) items (consumed as slots free up).
    Returns {seq_idx: successes}. Protocol semantics per slot match the
    sequential driver (rollout cap 360, chain stops at first failure).
    """
    from calvin_agent.evaluation.multistep_sequences import (
        get_env_state_for_initial_condition)

    k = len(envs)
    queue = list(work)[::-1]  # pop() takes from the front of `work`
    slots = [None] * k
    obs = [None] * k
    results = {}

    def annotation(slot):
        if diverse_inst:
            lang = val_annotations[slot.seq_idx][slot.subtask_i]
        else:
            lang = val_annotations[slot.sequence[slot.subtask_i]][0]
        return lang.split("\n")[0].replace("’", "'")

    def begin_rollout(i, new_sequence: bool):
        slot = slots[i]
        if new_sequence:
            robot_obs, scene_obs = get_env_state_for_initial_condition(
                slot.initial_state)
            envs[i].reset(robot_obs=robot_obs, scene_obs=scene_obs)
        slot.lang = annotation(slot)
        slot.step = 0
        policy.reset_slot(i)
        policy.set_goal(i, slot.lang)
        obs[i] = envs[i].get_obs()
        slot.start_info = envs[i].get_info()

    def load_next(i):
        if queue:
            slots[i] = _SlotState(*queue.pop())
            begin_rollout(i, new_sequence=True)
        else:
            slots[i] = None

    for i in range(k):
        load_next(i)

    from concurrent.futures import ThreadPoolExecutor

    def step_env(i, actions):
        if slots[i] is None:
            return None
        return envs[i].step(actions[i])

    # with-block (not a bare ExitStack): an exception in the rollout loop
    # must still join the worker threads (eval/libero.py does the same)
    with ThreadPoolExecutor(max_workers=k) as pool:
        while any(s is not None for s in slots):
            steps = np.asarray([s.step if s else 0 for s in slots])
            # idle/never-filled slots feed a placeholder obs; actions discarded
            fallback = next(o for o in obs if o is not None)
            obs_list = [o if o is not None else fallback for o in obs]
            actions = policy.step(obs_list, steps)
            # sims step concurrently (PyBullet physics releases the GIL); the
            # host would otherwise serialise K env.step calls per policy step
            stepped = list(pool.map(lambda i: step_env(i, actions), range(k)))
            for i in range(k):
                slot = slots[i]
                if slot is None:
                    continue
                o, _, _, info = stepped[i]
                obs[i] = o
                slot.step += 1
                subtask = slot.sequence[slot.subtask_i]
                if task_oracle.get_task_info_for_set(slot.start_info, info,
                                                     {subtask}):
                    slot.successes += 1
                    slot.subtask_i += 1
                    if slot.subtask_i >= len(slot.sequence):
                        results[slot.seq_idx] = slot.successes
                        load_next(i)
                    else:
                        begin_rollout(i, new_sequence=False)
                elif slot.step >= ep_len:
                    results[slot.seq_idx] = slot.successes
                    load_next(i)
    return results


def evaluate_policy(policy, dataset_path: str, calvin_conf_path: str,
                    diverse_inst: bool = False, reset: bool = False,
                    num_sequences: int = NUM_SEQUENCES,
                    eval_sequences_path: Optional[str] = None,
                    parallel_envs: int = 1, batched_policy=None,
                    process_index: Optional[int] = None,
                    process_count: Optional[int] = None):
    """Shard the 1000 sequences over hosts, run, and gather to host 0."""
    import hydra
    import jax
    from calvin_agent.evaluation.utils import get_env_state_for_initial_condition  # noqa: F401
    from calvin_env.envs.play_table_env import get_env
    from omegaconf import OmegaConf

    os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
    rank = jax.process_index() if process_index is None else process_index
    world = jax.process_count() if process_count is None else process_count

    env = get_env(Path(dataset_path) / "validation", show_gui=False)
    conf_dir = Path(calvin_conf_path)
    task_cfg = OmegaConf.load(
        conf_dir / "callbacks/rollout/tasks/new_playtable_tasks.yaml")
    task_oracle = hydra.utils.instantiate(task_cfg)
    if diverse_inst:
        with open(ASSETS / "lang_annotation_cache.json") as f:
            val_annotations = json.load(f)
    else:
        val_annotations = OmegaConf.load(
            conf_dir / "annotations/new_playtable_validation.yaml")

    sequences = load_eval_sequences(eval_sequences_path)[:num_sequences]
    assert len(sequences) % world == 0, "sequences must divide evenly by hosts"
    per = len(sequences) // world
    local = sequences[rank * per:(rank + 1) * per]

    if parallel_envs > 1 and batched_policy is not None:
        assert not reset, "--reset is only supported in sequential eval"
        extra_envs = [env] + [
            get_env(Path(dataset_path) / "validation", show_gui=False)
            for _ in range(parallel_envs - 1)]
        work = [(rank * per + j, init, seq)
                for j, (init, seq) in enumerate(local)]
        res_map = evaluate_sequences_batched(
            extra_envs, batched_policy, task_oracle, work, val_annotations,
            diverse_inst=diverse_inst)
        results = [res_map[rank * per + j] for j in range(per)]
    else:
        results = []
        for j, (initial_state, sequence) in enumerate(local):
            res = evaluate_sequence(env, policy, task_oracle, initial_state,
                                    sequence, val_annotations, diverse_inst,
                                    seq_idx=rank * per + j, reset=reset)
            results.append(res)
            rates = " ".join(f"{i+1}/5: {v*100:.1f}%"
                             for i, v in enumerate(count_success(results)))
            print(f"[host {rank}] seq {j+1}/{per} | {rates}", flush=True)

    if world > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            np.asarray(results, np.int32))
        results = list(np.asarray(gathered).reshape(-1))
    if rank == 0:
        rates = count_success(results)
        avg_len = float(np.mean(results))
        print("CALVIN results:",
              {f"{i+1}/5": r for i, r in enumerate(rates)},
              f"avg_len={avg_len:.3f}")
        return rates, avg_len
    return None
