"""Application layer: the in-the-wild pose-tracking demo pipeline.

Equivalent of the reference demo stack (src/demo/: cli.py, demo.py,
seg.py, ov_det.py, utils.py, gradio_demo.py): frames -> segmentation ->
reference selection -> crop/resize -> reference reconstruction -> per-frame
jitted pose inference with cached reference tokens -> 3D-box overlay
rendering. Heavy external models (SAM2, GroundingDINO, DUSt3R) are
pluggable and gated; a threshold segmenter + pose-file reference mode keep
the pipeline runnable with zero downloads.
"""

from boxdreamer_tpu.demo.pipeline import DemoConfig, DemoPipeline

__all__ = ["DemoConfig", "DemoPipeline"]
