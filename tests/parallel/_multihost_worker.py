"""Worker for tests/parallel/test_multihost.py — runs as one of two real
processes under jax.distributed (CPU, localhost coordinator).

Each process evaluates its DataLoader shard of a synthetic 'dataset' into a
Metrics accumulator, gathers across processes, and dumps the aggregate (plus
raw evidence) to out_<pid>.json. The parent test asserts both dumps equal
the single-process result. Mirrors the reference's DDP sampler + epoch-end
gather (BoxDreamer_lightning_model.py:164-217, src/utils/comm.py).
"""

import json
import os
import sys


def sample_record(i):
    """Deterministic synthetic eval sample: rotation error = i degrees."""
    import numpy as np

    theta = np.radians(float(i))
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1.0],
        ]
    )
    pred = np.eye(4)
    pred[:3, :3] = R
    pred[:3, 3] = [0, 0, 0.5 + 0.01 * i]
    gt = np.eye(4)
    gt[:3, 3] = [0, 0, 0.5]
    K = np.array([[400.0, 0, 112], [0, 400, 112], [0, 0, 1]])
    cat = "cat_a" if i % 2 == 0 else "cat_b"
    return pred, gt, K, cat


def run_metrics(indices, gather):
    from boxdreamer_tpu.parallel import comm
    from boxdreamer_tpu.training.metrics import Metrics, MetricsConfig

    m = Metrics(MetricsConfig(metrics_list=["pose_error"]))
    for i in indices:
        pred, gt, K, cat = sample_record(i)
        m.update(
            pose_pred=pred, pose_gt=gt, K=K, cat=cat, image_path=f"/img/{i}.png"
        )
    if gather:
        comm.synchronize()
        m = comm.gather_metrics(m)
    return m


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]
    n_samples = 12

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2

    from boxdreamer_tpu.data.loader import DataLoader

    class ToyDataset:
        def __len__(self):
            return n_samples

        def __getitem__(self, i):
            return {"idx": i}

    loader = DataLoader(
        ToyDataset(), batch_size=2, shuffle=False, shard_across_processes=True
    )
    local_indices = [int(i) for b in loader for i in b["idx"]]

    # Edge: an all-empty gather must not deadlock or error (the manifest
    # collective keeps processes aligned even with zero keys).
    from boxdreamer_tpu.parallel import comm

    assert comm.all_gather_metric_lists({}) == {}
    # Key-set asymmetry: only process 0 contributes a key; both must see it.
    asym = comm.all_gather_metric_lists(
        {"only0": [1.0, 2.0]} if pid == 0 else {}
    )
    assert asym == {"only0": [1.0, 2.0]}, asym

    m = run_metrics(local_indices, gather=True)
    out = {
        "pid": pid,
        "local_indices": local_indices,
        "aggregate": m.aggregate(),
        "R_errs_all_sorted": sorted(m._store["R_errs"]["all"]),
        "pose_record_paths": sorted(
            p for cat in m._pose_records for p in m._pose_records[cat]
        ),
    }
    with open(os.path.join(out_dir, f"out_{pid}.json"), "w") as f:
        json.dump(out, f, default=float)


if __name__ == "__main__":
    main()
