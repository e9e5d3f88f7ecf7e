"""CALVIN/LIBERO eval-driver protocol logic with fake envs (no simulators)."""

import numpy as np

from dreamvla_tpu.eval.calvin import count_success, evaluate_sequence, rollout
from dreamvla_tpu.eval.libero import evaluate_task


class FakePolicy:
    def __init__(self, succeed_after=3):
        self.succeed_after = succeed_after
        self.resets = 0
        self.steps = 0

    def reset(self):
        self.resets += 1
        self.steps = 0

    def step(self, obs, goal, t):
        self.steps += 1
        return np.zeros(7, np.float32)


class FakeCalvinEnv:
    def __init__(self):
        self.t = 0
        self.resets = []

    def get_obs(self):
        return {"t": self.t}

    def get_info(self):
        return {"t": self.t}

    def step(self, action):
        self.t += 1
        return {"t": self.t}, 0.0, False, {"t": self.t}

    def reset(self, robot_obs=None, scene_obs=None):
        self.resets.append((robot_obs is not None))
        self.t = 0


class FakeOracle:
    """Declares success after N env steps for given subtasks."""

    def __init__(self, solvable, after=5):
        self.solvable = set(solvable)
        self.after = after

    def get_task_info_for_set(self, start, cur, tasks):
        task = next(iter(tasks))
        if task in self.solvable and cur["t"] - start["t"] >= self.after:
            return {task}
        return {}


def test_rollout_success_and_failure():
    env, policy = FakeCalvinEnv(), FakePolicy()
    oracle = FakeOracle({"lift"}, after=4)
    assert rollout(env, policy, oracle, "lift", "lift the block") is True
    assert policy.steps == 4  # stopped at first success
    assert rollout(env, policy, oracle, "push", "push it") is False
    assert policy.steps == 360  # full EP_LEN on failure


def test_sequence_chains_until_first_failure(monkeypatch):
    import dreamvla_tpu.eval.calvin as C

    monkeypatch.setitem(
        __import__("sys").modules, "calvin_agent.evaluation.multistep_sequences",
        type("M", (), {"get_env_state_for_initial_condition":
                       staticmethod(lambda s: (None, None))}))
    env, policy = FakeCalvinEnv(), FakePolicy()
    oracle = FakeOracle({"a", "b"}, after=2)
    ann = {"a": ["do a"], "b": ["do b"], "c": ["do c"], "d": ["do d"]}
    n = C.evaluate_sequence(env, policy, oracle, {}, ["a", "b", "c", "d"], ann)
    assert n == 2  # a, b succeed; c fails and the chain stops


def test_count_success_chain_rates():
    results = [0, 1, 1, 2, 5]
    rates = count_success(results)
    assert rates[0] == 4 / 5          # >=1 subtask
    assert rates[1] == 2 / 5          # >=2
    assert rates[4] == 1 / 5          # all 5
    # average rollout length == mean(results)
    assert abs(np.mean(results) - 1.8) < 1e-9


class FakeLiberoEnv:
    def __init__(self, done_at=7):
        self.t = 0
        self.done_at = done_at

    def step(self, action):
        self.t += 1
        return {"t": self.t}, 0.0, self.t >= self.done_at, {}


def test_libero_task_rollout():
    assert evaluate_task(FakeLiberoEnv(done_at=7), FakePolicy(), 600,
                         "goal", {"t": 0}) == 1
    assert evaluate_task(FakeLiberoEnv(done_at=10**9), FakePolicy(), 20,
                         "goal", {"t": 0}) == 0


class FakeBatchedPolicy:
    def __init__(self):
        self.goals = {}

    def reset_slot(self, i):
        pass

    def set_goal(self, i, g):
        self.goals[i] = g

    def step(self, obs_list, steps):
        return np.zeros((len(obs_list), 7), np.float32)


class FakeResettableEnv(FakeCalvinEnv):
    pass


def test_batched_calvin_chain_protocol(monkeypatch):
    import sys

    from dreamvla_tpu.eval.calvin import evaluate_sequences_batched

    monkeypatch.setitem(
        sys.modules, "calvin_agent.evaluation.multistep_sequences",
        type("M", (), {"get_env_state_for_initial_condition":
                       staticmethod(lambda s: (None, None))}))
    # oracle: tasks 'a','b' solvable after 2 steps; others never
    oracle = FakeOracle({"a", "b"}, after=2)
    ann = {k: [f"do {k}"] for k in "abcd"}
    work = [
        (0, {}, ["a", "b", "c"]),   # 2 successes then fail
        (1, {}, ["a", "a", "a"]),   # full chain: 3 successes
        (2, {}, ["c", "a"]),        # immediate fail: 0
    ]
    envs = [FakeResettableEnv(), FakeResettableEnv()]
    results = evaluate_sequences_batched(envs, FakeBatchedPolicy(), oracle,
                                         work, ann, ep_len=10)
    assert results == {0: 2, 1: 3, 2: 0}
    # matches the sequential driver on the same work
    import dreamvla_tpu.eval.calvin as C

    seq_results = {}
    for seq_idx, init, seq in work:
        env, policy = FakeCalvinEnv(), FakePolicy()
        n = C.evaluate_sequence(env, policy, oracle, init, seq, ann)
        seq_results[seq_idx] = n
    # NOTE: sequential rollout cap is EP_LEN=360; cap the comparison fairly
    assert seq_results == {0: 2, 1: 3, 2: 0}
