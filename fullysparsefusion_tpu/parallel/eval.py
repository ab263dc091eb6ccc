"""Distributed evaluation gather.

Replaces the reference's ``multi_gpu_test(..., gpu_collect | tmpdir)``
(tools/test.py gather flags; SURVEY.md §2.8 item 4): each host runs
inference on its shard of the dataset (the same ``idx % world`` split the
reference uses for mask pre-inference), and results merge either through
``multihost_utils.process_allgather`` (small payloads) or per-host shard
files merged by process 0 (large payloads).
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def shard_indices(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> np.ndarray:
    """Dataset indices owned by this host (idx % world == rank)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, n, pc)


def allgather_results(local_results: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Gather small per-host result lists to every host.

    Uses process_allgather on a pickled byte payload (detection dicts are
    ragged); single-process setups short-circuit.
    """
    if jax.process_count() == 1:
        return local_results
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(local_results), dtype=np.uint8)
    # pad to the max length across hosts
    n = np.array([len(payload)], np.int32)
    all_n = multihost_utils.process_allgather(n)
    max_n = int(all_n.max())
    padded = np.zeros(max_n, np.uint8)
    padded[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    out: List[Dict[str, Any]] = []
    for i in range(jax.process_count()):
        out.extend(pickle.loads(gathered[i, : int(all_n[i])].tobytes()))
    return out


def write_shard_results(
    results: List[Dict[str, Any]], tmpdir: str, process_index: Optional[int] = None
) -> str:
    """Large-payload path: each host writes a shard file (tmpdir collect)."""
    pi = jax.process_index() if process_index is None else process_index
    os.makedirs(tmpdir, exist_ok=True)
    path = os.path.join(tmpdir, f"results_rank{pi:03d}.json")
    with open(path, "w") as f:
        json.dump(results, f)
    return path


def merge_shard_results(tmpdir: str) -> List[Dict[str, Any]]:
    """Process-0 merge of all shard files, interleaved back to dataset order."""
    shards = []
    for fname in sorted(os.listdir(tmpdir)):
        if fname.startswith("results_rank"):
            with open(os.path.join(tmpdir, fname)) as f:
                shards.append(json.load(f))
    # round-robin interleave (idx % world sharding)
    out: List[Dict[str, Any]] = []
    i = 0
    while True:
        added = False
        for s in shards:
            if i < len(s):
                out.append(s[i])
                added = True
        if not added:
            break
        i += 1
    return out
