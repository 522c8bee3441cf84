"""boxdreamer-cli — in-the-wild demo entry point.

Equivalent of the reference console script (src/demo/cli.py:13 +
pyproject.toml:20-21):

    python -m boxdreamer_tpu.demo.cli --frames <dir> --output out/ \
        [--safetensors weights.safetensors] [--segmenter threshold|sam2|groundingdino]
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(description="BoxDreamer-TPU demo")
    parser.add_argument("--frames", required=True, help="directory of frames")
    parser.add_argument("--output", default="demo_output")
    parser.add_argument("--safetensors", default=None)
    parser.add_argument("--segmenter", default="threshold")
    parser.add_argument("--text-prompt", default=None,
                        help="GroundingDINO text prompt")
    parser.add_argument("--num-refs", type=int, default=5)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--export-video", action="store_true",
                        help="write tracked.avi overlay video (MJPEG)")
    parser.add_argument("--video-fps", type=float, default=15.0)
    parser.add_argument("--rerun", action="store_true",
                        help="live Rerun visualization (needs rerun-sdk)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from boxdreamer_tpu.demo.pipeline import DemoConfig, DemoPipeline
    from boxdreamer_tpu.demo.segmentation import build_segmenter
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig

    model = BoxDreamer(BoxDreamerConfig())
    T = args.num_refs + 1
    S = args.image_size
    mask = jnp.zeros((1, T), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, T, 3, S, S)),
        jnp.zeros((1, T, 8, S, S)),
        mask,
    )
    if args.safetensors:
        from boxdreamer_tpu.models import weights as W

        state = W.load_safetensors(args.safetensors)
        converted = W.convert_boxdreamer(state, model.config.dino, model.config.betr)
        params = {"params": W.merge_params(params["params"], converted["params"])}

    seg_kwargs = {}
    if args.segmenter == "groundingdino":
        seg_kwargs["text_prompt"] = args.text_prompt or "object"
    segmenter = build_segmenter(args.segmenter, **seg_kwargs)
    cfg = DemoConfig(
        image_size=S, num_refs=args.num_refs, segmenter=args.segmenter,
        frame_stride=args.stride,
        export_video=args.export_video, video_fps=args.video_fps,
        use_rerun=args.rerun,
    )
    pipeline = DemoPipeline(model, params, cfg, segmenter=segmenter)
    pipeline.run(args.frames, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
