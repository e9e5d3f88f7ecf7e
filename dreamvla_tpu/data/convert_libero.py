"""LIBERO HDF5 demos -> per-step directory tree converter.

Capability parity with reference `utils/convert_libero_per_step.py`
(DatasetConverter): each `<task>.hdf5` demo file expands to

    <tgt>/<suite>_converted/episodes/<%06d>/steps/<%04d>/
        image_primary.jpg   (agentview_rgb)
        image_wrist.jpg     (eye_in_hand_rgb)
        other.h5            {language_instruction, episode_length, action,
                             observation/{proprio, tcp_pose, gripper_state,
                                          gripper_position}}

with gripper_state[t] = action[t-1][-1] (carried previous gripper command,
reference :88-90) and a `data_info/<suite>_converted.json` index of
[episode_id, num_steps]. Work is sharded over processes by episode index
(replaces the reference's 8-way mp.spawn with any process pool the caller
chooses).
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image


def task_language_from_filename(filename: str) -> str:
    """`<scene>_SCENE<id>_<task>_demo.hdf5` -> natural-language task."""
    stem = Path(filename).stem.replace("_demo", "")
    m = re.match(r"(.+?_SCENE\d+_)?(.+)", stem)
    task = m.group(2) if m else stem
    return task.lower().replace("_", " ")


def convert_demo_file(src_path: str, episodes_dir: Path,
                      start_episode_index: int,
                      language: Optional[str] = None) -> List[Tuple[str, int]]:
    """Convert every demo in one HDF5 file; returns [(episode_id, steps)]."""
    import h5py

    language = language or task_language_from_filename(src_path)
    index: List[Tuple[str, int]] = []
    with h5py.File(src_path, "r") as f:
        data = f["data"]
        demo_keys = sorted(data.keys(), key=lambda k: int(k.split("_")[1]))
        for j, key in enumerate(demo_keys):
            demo = data[key]
            obs = np.asarray(demo["obs"]["agentview_rgb"])
            wrist = np.asarray(demo["obs"]["eye_in_hand_rgb"])
            actions = np.asarray(demo["actions"])
            joints = np.asarray(demo["obs"]["joint_states"])
            ee_states = np.asarray(demo["obs"]["ee_states"])
            gripper_pos = np.asarray(demo["obs"]["gripper_states"])
            gripper_state = np.concatenate([actions[:1, -1], actions[:-1, -1]])

            num_steps = obs.shape[0]
            ep_id = f"{start_episode_index + j:06d}"
            ep_dir = episodes_dir / ep_id
            (ep_dir / "steps").mkdir(parents=True, exist_ok=True)
            with h5py.File(ep_dir / "meta_info.h5", "w") as meta:
                meta.create_dataset("length", data=num_steps)
            for t in range(num_steps):
                step_dir = ep_dir / "steps" / f"{t:04d}"
                step_dir.mkdir(exist_ok=True)
                Image.fromarray(obs[t]).save(step_dir / "image_primary.jpg")
                Image.fromarray(wrist[t]).save(step_dir / "image_wrist.jpg")
                with h5py.File(step_dir / "other.h5", "w") as h5:
                    h5.create_dataset("language_instruction",
                                      data=np.bytes_(language))
                    h5.create_dataset("episode_length", data=num_steps)
                    h5.create_dataset("action", data=actions[t])
                    g = h5.create_group("observation")
                    g.create_dataset("proprio", data=joints[t])
                    g.create_dataset("tcp_pose", data=ee_states[t])
                    g.create_dataset("gripper_state", data=gripper_state[t])
                    g.create_dataset("gripper_position", data=gripper_pos[t])
            index.append((ep_id, num_steps))
    return index


def convert_suite(src_dir: str, tgt_dir: str, suite_name: str,
                  data_info_dir: str = "assets/data_info",
                  process_index: int = 0, process_count: int = 1) -> str:
    """Convert all demo files of one suite; emits the data_info index.

    With multiple processes each converts its stripe of files, then rank 0
    merges the partial indices.
    """
    out_name = f"{suite_name}_converted"
    episodes_dir = Path(tgt_dir) / out_name / "episodes"
    episodes_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(src_dir).glob("*.hdf5"))
    index: List[Tuple[str, int]] = []
    start = 0
    import h5py

    for fi, path in enumerate(files):
        with h5py.File(path, "r") as f:
            n_demos = len(f["data"].keys())
        if fi % process_count == process_index:
            index.extend(convert_demo_file(str(path), episodes_dir, start))
        start += n_demos

    part = Path(data_info_dir) / f"{out_name}.{process_index}.part.json"
    part.parent.mkdir(parents=True, exist_ok=True)
    with open(part, "w") as f:
        json.dump(index, f)
    if process_index == 0:
        merged: List[Tuple[str, int]] = []
        for p in sorted(Path(data_info_dir).glob(f"{out_name}.*.part.json")):
            with open(p) as f:
                merged.extend(tuple(x) for x in json.load(f))
        merged.sort(key=lambda x: x[0])
        with open(Path(data_info_dir) / f"{out_name}.json", "w") as f:
            json.dump(merged, f)
    return str(Path(tgt_dir) / out_name)
