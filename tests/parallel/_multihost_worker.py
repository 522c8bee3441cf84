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


def _train_sample(i, T=3, S=28):
    """Deterministic tiny train sample (index-derived, no RNG)."""
    import numpy as np

    r = np.random.default_rng(1000 + i)
    return {
        "images": r.uniform(0, 1, (T, 3, S, S)).astype(np.float32),
        "bbox_feat": r.uniform(-1, 1, (T, 8, S, S)).astype(np.float32),
        "query_idx": np.int32(T - 1),
    }


def run_training(out_dir, tag):
    """Train 4 steps with the REAL Trainer.fit at tiny geometry; return the
    per-step losses. Under jax.distributed this exercises the multi-host
    path (per-process loader shards -> make_array_from_process_local_data ->
    one GSPMD train step); single-process it is the plain path the
    trajectories must match."""
    from boxdreamer_tpu.models.betr import BETRConfig
    from boxdreamer_tpu.models.boxdreamer import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.models.dinov2 import DinoViTConfig
    from boxdreamer_tpu.training.loss import Loss
    from boxdreamer_tpu.training.optim import OptimConfig
    from boxdreamer_tpu.training.trainer import Trainer, TrainerConfig

    class ToyTrainDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return _train_sample(i)

    model = BoxDreamer(
        BoxDreamerConfig(
            betr=BETRConfig(
                dtype="float32", num_decoder_layers=1, img_size=28,
                adapter_dropout=0.0,
            ),
            dino=DinoViTConfig(dtype="float32", depth=1, img_size=28),
        )
    )
    trainer = Trainer(
        model,
        train_loss=Loss(),
        val_loss=Loss(),
        optim_cfg=OptimConfig(use_warmup=False, lr=1e-3),
        trainer_cfg=TrainerConfig(
            max_epochs=5,
            batch_size=4,  # GLOBAL batch; 2 rows per process when sharded
            num_workers=0,
            log_every_n_steps=1,
            checkpoint_every_n_steps=10**9,
            check_val_every_n_epoch=10**9,
            checkpoint_dir=os.path.join(out_dir, "ckpt_shared" if tag.startswith("proc") else f"ckpt_{tag}"),
            mesh_model=1,
            seed=0,
        ),
    )
    trainer.fit(ToyTrainDataset(), max_steps=4)
    return [rec["loss"] for rec in trainer._history]


def main():
    pid = sys.argv[1]
    port = sys.argv[2]
    out_dir = sys.argv[3]
    n_samples = 12

    import jax

    jax.config.update("jax_platforms", "cpu")

    if pid == "single":
        # Single-process twin for the training-trajectory comparison.
        losses = run_training(out_dir, "single")
        with open(os.path.join(out_dir, "out_single.json"), "w") as f:
            json.dump({"train_losses": losses}, f, default=float)
        return

    pid = int(pid)
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
    train_losses = run_training(out_dir, f"proc{pid}")
    out = {
        "pid": pid,
        "local_indices": local_indices,
        "aggregate": m.aggregate(),
        "R_errs_all_sorted": sorted(m._store["R_errs"]["all"]),
        "pose_record_paths": sorted(
            p for cat in m._pose_records for p in m._pose_records[cat]
        ),
        "train_losses": train_losses,
    }
    with open(os.path.join(out_dir, f"out_{pid}.json"), "w") as f:
        json.dump(out, f, default=float)


if __name__ == "__main__":
    main()
