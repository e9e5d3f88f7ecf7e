"""LIBERO closed-loop benchmark driver.

Capability parity with reference `eval_libero.py` + `utils/eval_utils_libero.py`:
10 tasks x 20 init states = 200 rollouts per suite, <=600 steps each,
OffScreenRenderEnv at 128^2 per rollout, init state loaded from the suite's
init_files, 5 no-op warmup steps, optional temporal ensembling inside the
PolicyWrapper, per-task success-rate report.

LIBERO/robosuite are imported lazily; host sharding mirrors the reference's
rank-interval split via jax.process_index, gathered with process_allgather.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

NUM_EVAL_EPISODES = 20
TASKS_PER_SUITE = 10


def evaluate_task(env, policy, max_steps: int, goal: str, obs) -> int:
    policy.reset()
    steps = 0
    while steps < max_steps:
        action = policy.step(obs, goal, steps)
        steps += 1
        obs, reward, done, info = env.step(action)
        if done:
            return 1
    return 0


def evaluate_tasks_batched(envs, policy, max_steps: int, goals, obs_list):
    """Step K independent rollouts through ONE batched policy
    (BatchedPolicyWrapper): finished envs keep receiving no-op steps on the
    device side but stop advancing on the host. Returns per-env success."""
    k = len(envs)
    for i, goal in enumerate(goals):
        policy.reset_slot(i)
        policy.set_goal(i, goal)
    from concurrent.futures import ThreadPoolExecutor

    done = [False] * k
    success = [0] * k
    steps = np.zeros(k, np.int64)
    obs_list = list(obs_list)

    def step_env(i, actions):
        if done[i] or steps[i] >= max_steps:
            return None
        return envs[i].step(actions[i])

    with ThreadPoolExecutor(max_workers=k) as pool:
        while not all(done) and steps.max() < max_steps:
            actions = policy.step(obs_list, steps)
            # MuJoCo physics releases the GIL: step the K sims concurrently
            stepped = list(pool.map(lambda i: step_env(i, actions), range(k)))
            for i in range(k):
                if stepped[i] is None:
                    done[i] = True
                    continue
                obs, reward, d, info = stepped[i]
                obs_list[i] = obs
                steps[i] += 1
                if d:
                    success[i] = 1
                    done[i] = True
    return success


def evaluate_policy(policy, suite_name: str, libero_path: str,
                    img_size: int = 128, max_steps: int = 600,
                    seed: int = 42, parallel_envs: int = 1,
                    batched_policy=None,
                    process_index: Optional[int] = None,
                    process_count: Optional[int] = None):
    import jax
    from libero.libero import benchmark
    from libero.libero.envs import OffScreenRenderEnv

    rank = jax.process_index() if process_index is None else process_index
    world = jax.process_count() if process_count is None else process_count

    suite = benchmark.get_benchmark_dict()[suite_name]()
    total = NUM_EVAL_EPISODES * TASKS_PER_SUITE
    assert total % world == 0
    per = total // world
    local_ids = list(range(rank * per, (rank + 1) * per))

    def make_env(eval_id):
        task_id = eval_id // NUM_EVAL_EPISODES
        exp_id = eval_id % NUM_EVAL_EPISODES
        task = suite.get_task(task_id)
        bddl = os.path.join(libero_path, "libero/libero/bddl_files",
                            task.problem_folder, task.bddl_file)
        env = OffScreenRenderEnv(bddl_file_name=bddl,
                                 camera_heights=img_size,
                                 camera_widths=img_size)
        env.reset()
        env.seed(seed)
        init_path = os.path.join(libero_path, "libero/libero/init_files",
                                 task.problem_folder, task.init_states_file)
        import torch

        init_states = torch.load(init_path)
        obs = env.set_init_state(init_states[exp_id])
        for _ in range(5):  # settle physics
            obs, *_ = env.step(np.zeros(7))
        return env, obs, task.language

    results: List[int] = []
    if parallel_envs > 1 and batched_policy is not None:
        for s0 in range(0, len(local_ids), parallel_envs):
            group = local_ids[s0:s0 + parallel_envs]
            made = [make_env(e) for e in group]
            envs = [m[0] for m in made]
            # pad the final group to the fixed policy batch with env 0 dupes
            while len(envs) < parallel_envs:
                made.append(made[0])
                envs.append(made[0][0])
            succ = evaluate_tasks_batched(
                envs, batched_policy, max_steps,
                [m[2] for m in made], [m[1] for m in made])
            results.extend(succ[: len(group)])
            for m in made[: len(group)]:
                m[0].close()
            print(f"[host {rank}] rollouts {group}: {succ[:len(group)]}",
                  flush=True)
    else:
        for eval_id in local_ids:
            env, obs, goal = make_env(eval_id)
            results.append(evaluate_task(env, policy, max_steps, goal, obs))
            env.close()
            print(f"[host {rank}] rollout {eval_id}: "
                  f"{'success' if results[-1] else 'fail'}", flush=True)

    if world > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            np.asarray(results, np.int32))
        results = list(np.asarray(gathered).reshape(-1))
    if rank == 0:
        results = np.asarray(results).reshape(TASKS_PER_SUITE,
                                              NUM_EVAL_EPISODES)
        rates = results.mean(axis=1)
        for j, r in enumerate(rates):
            print(f"task {j} ({suite.get_task(j).name}): {r*100:.1f}%")
        print(f"suite {suite_name} average: {rates.mean()*100:.1f}%")
        return rates
    return None
