"""Multi-host eval gather: shard ownership + shard-file merge ordering."""
import numpy as np

from fullysparsefusion_tpu.parallel.eval import (
    shard_indices, write_shard_results, merge_shard_results,
)


def test_shard_indices_partition():
    n = 23
    owned = [shard_indices(n, pi, 4) for pi in range(4)]
    allidx = np.concatenate(owned)
    assert sorted(allidx.tolist()) == list(range(n))
    for pi, o in enumerate(owned):
        assert all(i % 4 == pi for i in o)


def test_shard_file_merge_restores_dataset_order(tmp_path):
    # 3 processes, 8 samples, idx % 3 ownership
    n, world = 8, 3
    for pi in range(world):
        own = shard_indices(n, pi, world)
        write_shard_results(
            [dict(token=f"tok{i}") for i in own], str(tmp_path), pi
        )
    merged = merge_shard_results(str(tmp_path))
    assert [r["token"] for r in merged] == [f"tok{i}" for i in range(n)]
