"""Evaluation loop: dataset -> jitted forward+PnP -> metric suite -> JSON.

Equivalent of the reference's test loop (trainer.test -> test_step ->
on_test_epoch_end, src/lightning/BoxDreamer_lightning_model.py:219-289):
runs each test dataloader through the fused eval program, un-normalizes
poses, accumulates the metric suite per category, and writes
``test_metrics.json`` with the reference's key naming.

TPU-native differences: batches are padded to a fixed size (one compiled
program, no recompiles on the last partial batch), the whole
forward+decode+PnP runs on device, and only final poses come back to host.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.data.loader import DataLoader
from boxdreamer_tpu.data.ply import get_all_points_on_model
from boxdreamer_tpu.models.boxdreamer import BoxDreamer
from boxdreamer_tpu.training.metrics import Metrics, MetricsConfig
from boxdreamer_tpu.training.train_step import make_eval_step

_DEVICE_KEYS = (
    "images",
    "bbox_feat",
    "query_idx",
    "bbox_3d",
    "non_ndc_intrinsics",
)


def _pad_batch(batch: Dict, target: int) -> tuple[Dict, int]:
    """Pad the batch dim to `target` by repeating the last sample."""
    n = batch["images"].shape[0]
    if n == target:
        return batch, n
    out = dict(batch)
    for k in _DEVICE_KEYS:
        v = batch[k]
        pad = np.repeat(v[-1:], target - n, axis=0)
        out[k] = np.concatenate([v, pad], axis=0)
    return out, n


class Evaluator:
    def __init__(
        self,
        model: BoxDreamer,
        params,
        metrics_config: MetricsConfig = MetricsConfig(),
        batch_size: int = 8,
        num_workers: int = 2,
        dense_cfg=None,  # DenseConfig; dense-reference eval when .enable
        mesh=None,  # jax.sharding.Mesh: shard eval batches over 'data'
        distributed: Optional[bool] = None,  # multi-host: shard data by
        # process + gather metrics; default auto (process_count > 1)
        vis_config=None,  # utils.vis.VisConfig (configs/model/vis group)
    ):
        self.model = model
        self.params = params
        self.mesh = mesh
        self.distributed = (
            jax.process_count() > 1 if distributed is None else distributed
        )
        self._batch_sharding = None
        if mesh is not None:
            from boxdreamer_tpu.parallel import mesh as mesh_lib

            # Multi-chip eval (north star: batched eval under data sharding
            # on v5e-8): batches shard over the mesh 'data' axis; GSPMD
            # partitions the whole forward+PnP program.
            self._batch_sharding = mesh_lib.batch_sharding(mesh)
            data_axis = mesh.shape.get("data", 1)
            assert batch_size % data_axis == 0, (
                f"eval batch {batch_size} must divide over data axis {data_axis}"
            )
        self.metrics_config = metrics_config
        self.batch_size = batch_size
        self.num_workers = num_workers
        # Qualitative panel collection (reference test_step -> VisUtils.add_data,
        # BoxDreamer_lightning_model.py:219-247); render() after run().
        # Config-driven per the reference vis group (configs/model/vis/
        # default.yaml): save_n_batches bounds the contributing batches,
        # vis_types selects the panels.
        from boxdreamer_tpu.utils.vis import VisConfig, VisUtils

        vis_config = vis_config or VisConfig()
        self.vis = VisUtils(
            max_samples=vis_config.save_n_batches * batch_size,
            config=vis_config,
        )
        if dense_cfg is not None and dense_cfg.enable:
            import functools

            from boxdreamer_tpu.models.dense import dense_predict

            # Sequence-parallel dense eval shards the decoder token axis over
            # this evaluator's mesh (ring attention) when the config asks.
            sp_mesh = mesh if getattr(dense_cfg, "sequence_parallel", False) else None
            dense_fn = jax.jit(
                functools.partial(
                    dense_predict, model, dense_cfg=dense_cfg, mesh=sp_mesh
                )
            )
            self._eval_step = lambda params, batch: (dense_fn(params, batch), {})
        else:
            self._eval_step = make_eval_step(model)

    def run_dataset(self, dataset, dataloader_id: int = 0) -> Metrics:
        metrics = Metrics(self.metrics_config, dataloader_id=dataloader_id)
        loader = DataLoader(
            dataset,
            batch_size=self.batch_size,
            shuffle=False,
            num_workers=self.num_workers,
            # Multi-host: each process evaluates its sample stride; the
            # epoch-end gather below merges (reference DDP sampler +
            # on_test_epoch_end gather, BoxDreamer_lightning_model.py:248-289).
            shard_across_processes=self.distributed,
        )
        for batch_i, batch in enumerate(loader):
            padded, n_valid = _pad_batch(batch, self.batch_size)
            device_batch = {k: jnp.asarray(padded[k]) for k in _DEVICE_KEYS}
            if self._batch_sharding is not None:
                device_batch = jax.device_put(device_batch, self._batch_sharding)
            out, _ = self._eval_step(self.params, device_batch)
            pred_poses = np.asarray(out["pred_poses"])[:n_valid]

            query_idx = np.asarray(batch["query_idx"])
            for b in range(n_valid):
                q = int(query_idx[b])
                model_path = batch["model_path"][b]
                model_pts = None
                if isinstance(model_path, str) and os.path.exists(model_path):
                    # Reference remaps models_<suffix> dirs to the GT models
                    # dir for metric CAD points (metric_utils.py:270-273).
                    parts = model_path.split(os.sep)
                    if len(parts) >= 3 and parts[-3].startswith("models"):
                        gt = os.sep.join(parts[:-3] + ["models"] + parts[-2:])
                        if os.path.exists(gt):
                            model_path = gt
                    model_pts = get_all_points_on_model(model_path)
                cat = batch.get("cat", ["all"] * n_valid)[b]
                paths = batch.get("original_images")
                image_path = paths[b][q] if paths is not None else None
                if len(self.vis.samples) < self.vis.max_samples:
                    # Overlay in the crop frame: predicted pose (still in
                    # normalized/crop coordinates) vs the normalized GT pose
                    # with the crop intrinsics.
                    self.vis.add_data(
                        image=np.asarray(batch["images"][b][q]),
                        K=np.asarray(batch["non_ndc_intrinsics"][b][q]),
                        pose_pred=pred_poses[b],
                        pose_gt=np.asarray(batch["poses"][b][q]),
                        bbox_3d=np.asarray(batch["bbox_3d"][b][q]),
                        heatmaps=np.asarray(out["pred_bbox"][b]),
                        gt_heatmaps=np.asarray(batch["bbox_feat"][b][q]),
                        batch_id=(dataloader_id, batch_i),
                    )
                if "nvs_rgb" in out:
                    # Image-metric branch (reference rgb_metrics): PSNR of
                    # the NVS-decoded query image vs the GT crop.
                    metrics.update_image(
                        np.asarray(out["nvs_rgb"][b]),
                        np.asarray(batch["images"][b][q]),
                        cat=cat,
                    )
                metrics.update(
                    image_path=image_path,
                    pose_pred=pred_poses[b],
                    pose_gt=np.asarray(batch["original_poses"][b][q], dtype=np.float64),
                    K=np.asarray(
                        batch["original_intrinsics"][b][q], dtype=np.float64
                    ),
                    model_pts=model_pts,
                    scale=np.asarray(batch["scale"][b][q], dtype=np.float64),
                    coordinate_transform=np.asarray(
                        batch["coordinate_transform"][b], dtype=np.float64
                    ),
                    cat=cat,
                )
        if self.distributed:
            from boxdreamer_tpu.parallel import comm

            # Barrier + merge: every process ends with the global metric
            # lists (reference dist.barrier + gather at
            # BoxDreamer_lightning_model.py:164-217, 248-289).
            comm.synchronize()
            metrics = comm.gather_metrics(metrics)
        return metrics

    def run(
        self,
        datasets: Sequence,
        output_json: Optional[str] = "test_metrics.json",
    ) -> Dict:
        """Evaluate all datasets; returns (and optionally writes) the merged
        aggregate dict keyed like the reference's test_metrics.json."""
        from boxdreamer_tpu.parallel.comm import is_main_process

        if not is_main_process():
            output_json = None  # rank 0 writes files; metrics still gather
        agg: Dict = {}
        for i, ds in enumerate(datasets):
            m = self.run_dataset(ds, dataloader_id=i)
            agg.update(m.aggregate())
            if output_json:
                m.save_pose_dict(
                    os.path.join(
                        os.path.dirname(os.path.abspath(output_json)),
                        f"path_pose_dict_{i}.npy",
                    )
                )
        if output_json:
            import json

            with open(output_json, "w") as f:
                json.dump(agg, f, indent=2, default=float)
            panel = self.vis.render()
            if panel is not None:
                panel.save(
                    os.path.join(
                        os.path.dirname(os.path.abspath(output_json)),
                        "qualitative_panel.png",
                    )
                )
        return agg
