import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from fixture import make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.data.loader import DynamicLengthLoader


def test_dynamic_length_loader(tmp_path):
    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=8, n_test=6)
    cfg = DatasetConfig(image_size=28, length=4)
    ds = build_dataset("LINEMOD", cfg, "test", root=root)

    loader = DynamicLengthLoader(
        ds, base_batch_size=3, base_length=4, min_length=3, max_length=5,
        shuffle=True, seed=0,
    )
    seen_lengths = set()
    for batch in loader:
        B, T = batch["images"].shape[:2]
        seen_lengths.add(T)
        assert 3 <= T <= 5
        # Token budget roughly constant: B*T ~ 12.
        assert abs(B * T - 12) <= max(T, 4)
        assert batch["bbox_feat"].shape[:2] == (B, T)
        assert int(batch["query_idx"][0]) == T - 1
    assert len(seen_lengths) >= 1


def test_get_item_length_override(tmp_path):
    root = make_linemod_fixture(str(tmp_path / "lm2"), n_train=8, n_test=2)
    cfg = DatasetConfig(image_size=28, length=4)
    ds = build_dataset("LINEMOD", cfg, "test", root=root)
    b3 = ds.get_item(0, n_total=3)
    b5 = ds.get_item(0, n_total=5)
    assert b3["images"].shape[0] == 3
    assert b5["images"].shape[0] == 5


def test_distributed_single_process():
    from boxdreamer_tpu.parallel.distributed import initialize, per_host_batch_slice

    initialize()  # no-op without coordinator
    s = per_host_batch_slice(16)
    assert s == slice(0, 16)
