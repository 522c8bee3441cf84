"""Gradio web demo — two-mode interactive UI (gated on the gradio package).

Equivalent of the reference web UI (src/demo/gradio_demo.py:101-2534): two
tabs (Mode 1: single video; Mode 2: reference images + query video), each a
stateful step flow with point/box annotation, segmentation, reference
extraction/selection, reconstruction, and per-frame pose prediction.

All handler LOGIC lives gradio-free in :mod:`gradio_state` (unit-tested);
this module is only the Blocks wiring. It builds against any object exposing
the gradio Blocks API, so tests construct the interface with a mock gradio
module (``build_interface(gr_module=mock)``).
"""

from __future__ import annotations

from typing import Optional

from boxdreamer_tpu.demo import gradio_state as gs


def _default_model():
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
    return model, params


def build_interface(
    model=None,
    params=None,
    gr_module=None,
    safetensors: Optional[str] = None,
):
    """Construct the two-mode Blocks UI. ``gr_module`` overrides the gradio
    import (tests pass a mock)."""
    gr = gr_module
    if gr is None:
        try:
            import gradio as gr  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - external dep
            raise ImportError(
                "gradio is not installed; use the CLI demo "
                "(python -m boxdreamer_tpu.demo.cli)"
            ) from e

    if model is None or params is None:
        model, params = _default_model()
    if safetensors:
        from boxdreamer_tpu.models.weights import (
            convert_boxdreamer,
            load_safetensors,
            merge_params,
        )

        params = merge_params(
            params, convert_boxdreamer(load_safetensors(safetensors))
        )

    # ------------------------------------------------- gradio-facing shims
    # (each adapts a gradio event signature onto the pure handlers)

    def ui_load_video(path, state):
        state = gs.load_video(path, state)
        img = gs.first_frame(state)
        return state, img, state["mode1"]["status"]

    def ui_toggle(mode, state, which):
        state = gs.toggle_mode(mode, state, which)
        return state, state[which]["status"]

    def ui_annotate(state, which, evt=None):
        # gradio SelectData carries .index = (x, y)
        if evt is not None and getattr(evt, "index", None) is not None:
            state = gs.annotate_image(tuple(evt.index), state, which)
        img = gs.first_frame(state, which)
        canvas = gs.draw_annotations(img, state, which) if img else None
        return state, canvas, state[which]["status"]

    def ui_reset_annotations(state, which):
        state = gs.reset_annotations(state, which)
        img = gs.first_frame(state, which)
        return state, img, state[which]["status"]

    def ui_segment(state, which):
        state = gs.start_segmentation(state, which=which)
        return state, gs.mask_overlays(state, which), state[which]["status"]

    def ui_extract(state):
        state = gs.extract_frames(state)
        side = state["mode1"]
        from PIL import Image

        gallery = [
            Image.open(side["frames"][i]).convert("RGB")
            for i in state["extracted"][:32]
        ]
        return state, gallery, state["status"]

    def ui_select(ref_num, state, evt=None):
        if evt is not None and getattr(evt, "index", None) is not None:
            cand = state["extracted"]
            idx = cand[int(evt.index)] if cand else int(evt.index)
            state = gs.select_reference_image(idx, int(ref_num), state)
        return state, state["status"]

    def ui_reset_selection(state):
        state = gs.reset_selection(state)
        return state, state["status"]

    def ui_confirm(ref_num, state):
        state = gs.confirm_selection(int(ref_num), state)
        return state, state["status"]

    def ui_reconstruct(backend, state):
        state = gs.start_reconstruction(backend, state)
        ply = (state["reconstruction"] or {}).get("ply")
        return state, ply, state["status"]

    def ui_predict(state):
        state = gs.run_prediction(state, model=model, params=params)
        pred = state["prediction"] or {}
        from PIL import Image

        overlays = [Image.open(p) for p in pred.get("overlays", [])[:16]]
        fps = pred.get("fps")
        return state, overlays, f"{state['status']} (fps={fps})"

    def ui_ref_upload(files, state):
        paths = [getattr(f, "name", f) for f in (files or [])]
        state = gs.process_ref_images(paths, state)
        return state, state["mode2_ref"]["status"]

    def ui_test_upload(path, state):
        state = gs.process_test_video(path, state)
        return state, state["mode2_test"]["status"]

    def ui_mode2_run(backend, state):
        state = gs.mode2_process_and_predict(
            backend, state, model=model, params=params
        )
        pred = state["prediction"] or {}
        from PIL import Image

        overlays = [Image.open(p) for p in pred.get("overlays", [])[:16]]
        return state, overlays, state["status"]

    # --------------------------------------------------------------- layout

    with gr.Blocks(title="BoxDreamer-TPU") as demo:
        gr.Markdown("# BoxDreamer-TPU — generalizable object pose estimation")
        state = gr.State(gs.init_state())
        status = gr.Textbox(label="Status", value="ready", interactive=False)

        with gr.Tab("Mode 1: Single Video"):
            with gr.Row():
                with gr.Column(scale=1):
                    with gr.Accordion("Step 1: Load & Annotate", open=True):
                        video_in = gr.Textbox(
                            label="video file or frames directory"
                        )
                        load_btn = gr.Button("Load")
                        with gr.Row():
                            point_btn = gr.Button("Point mode")
                            bbox_btn = gr.Button("Box mode")
                            reset_btn = gr.Button("Reset annotations")
                        segment_btn = gr.Button("Segment")
                    with gr.Accordion("Step 2: Reference Selection", open=False):
                        ref_num = gr.Slider(
                            1, 16, value=5, step=1, label="num references"
                        )
                        extract_btn = gr.Button("Extract candidate frames")
                        with gr.Row():
                            reset_select_btn = gr.Button("Reset selection")
                            confirm_select_btn = gr.Button("Confirm selection")
                    with gr.Accordion("Step 3: Reconstruction & Pose", open=False):
                        backend = gr.Radio(
                            ["carve", "dust3r", "colmap"],
                            value="carve",
                            label="reconstruction backend",
                        )
                        recon_btn = gr.Button("Reconstruct object")
                        predict_btn = gr.Button("Predict poses")
                with gr.Column(scale=2):
                    canvas = gr.Image(label="Annotation canvas")
                    seg_gallery = gr.Gallery(label="Segmentation")
                    cand_gallery = gr.Gallery(label="Candidate references")
                    model_file = gr.File(label="3D model (PLY)")
                    pose_gallery = gr.Gallery(label="Pose overlays")

            load_btn.click(
                ui_load_video, inputs=[video_in, state],
                outputs=[state, canvas, status],
            )
            point_btn.click(
                lambda s: ui_toggle("point", s, "mode1"),
                inputs=[state], outputs=[state, status],
            )
            bbox_btn.click(
                lambda s: ui_toggle("bbox", s, "mode1"),
                inputs=[state], outputs=[state, status],
            )
            reset_btn.click(
                lambda s: ui_reset_annotations(s, "mode1"),
                inputs=[state], outputs=[state, canvas, status],
            )
            canvas.select(
                lambda s, evt=None: ui_annotate(s, "mode1", evt),
                inputs=[state], outputs=[state, canvas, status],
            )
            segment_btn.click(
                lambda s: ui_segment(s, "mode1"),
                inputs=[state], outputs=[state, seg_gallery, status],
            )
            extract_btn.click(
                ui_extract, inputs=[state],
                outputs=[state, cand_gallery, status],
            )
            cand_gallery.select(
                lambda rn, s, evt=None: ui_select(rn, s, evt),
                inputs=[ref_num, state], outputs=[state, status],
            )
            reset_select_btn.click(
                ui_reset_selection, inputs=[state], outputs=[state, status]
            )
            confirm_select_btn.click(
                ui_confirm, inputs=[ref_num, state], outputs=[state, status]
            )
            recon_btn.click(
                ui_reconstruct, inputs=[backend, state],
                outputs=[state, model_file, status],
            )
            predict_btn.click(
                ui_predict, inputs=[state], outputs=[state, pose_gallery, status]
            )

        with gr.Tab("Mode 2: References + Query Video"):
            with gr.Row():
                with gr.Column(scale=1):
                    with gr.Accordion("Step 1: Upload", open=True):
                        ref_files = gr.File(
                            file_count="multiple", label="reference images"
                        )
                        upload_ref_btn = gr.Button("Load references")
                        test_in = gr.Textbox(label="query video / frames dir")
                        upload_test_btn = gr.Button("Load query")
                    with gr.Accordion("Step 2: Annotate & Segment", open=False):
                        with gr.Row():
                            ref_point_btn = gr.Button("Ref: point mode")
                            ref_bbox_btn = gr.Button("Ref: box mode")
                            ref_reset_btn = gr.Button("Ref: reset")
                        seg_ref_btn = gr.Button("Segment references")
                        with gr.Row():
                            test_point_btn = gr.Button("Query: point mode")
                            test_bbox_btn = gr.Button("Query: box mode")
                            test_reset_btn = gr.Button("Query: reset")
                        seg_test_btn = gr.Button("Segment query")
                    with gr.Accordion("Step 3: Run", open=False):
                        backend2 = gr.Radio(
                            ["carve", "dust3r", "colmap"],
                            value="carve",
                            label="reconstruction backend",
                        )
                        run_btn = gr.Button("Reconstruct + Predict")
                with gr.Column(scale=2):
                    ref_canvas = gr.Image(label="Reference canvas")
                    test_canvas = gr.Image(label="Query canvas")
                    ref_seg_gallery = gr.Gallery(label="Reference masks")
                    test_seg_gallery = gr.Gallery(label="Query masks")
                    result_gallery = gr.Gallery(label="Pose overlays")

            upload_ref_btn.click(
                ui_ref_upload, inputs=[ref_files, state], outputs=[state, status]
            )
            upload_test_btn.click(
                ui_test_upload, inputs=[test_in, state], outputs=[state, status]
            )
            for btn, mode, which in (
                (ref_point_btn, "point", "mode2_ref"),
                (ref_bbox_btn, "bbox", "mode2_ref"),
                (test_point_btn, "point", "mode2_test"),
                (test_bbox_btn, "bbox", "mode2_test"),
            ):
                btn.click(
                    lambda s, m=mode, w=which: ui_toggle(m, s, w),
                    inputs=[state], outputs=[state, status],
                )
            ref_reset_btn.click(
                lambda s: ui_reset_annotations(s, "mode2_ref"),
                inputs=[state], outputs=[state, ref_canvas, status],
            )
            test_reset_btn.click(
                lambda s: ui_reset_annotations(s, "mode2_test"),
                inputs=[state], outputs=[state, test_canvas, status],
            )
            ref_canvas.select(
                lambda s, evt=None: ui_annotate(s, "mode2_ref", evt),
                inputs=[state], outputs=[state, ref_canvas, status],
            )
            test_canvas.select(
                lambda s, evt=None: ui_annotate(s, "mode2_test", evt),
                inputs=[state], outputs=[state, test_canvas, status],
            )
            seg_ref_btn.click(
                lambda s: ui_segment(s, "mode2_ref"),
                inputs=[state], outputs=[state, ref_seg_gallery, status],
            )
            seg_test_btn.click(
                lambda s: ui_segment(s, "mode2_test"),
                inputs=[state], outputs=[state, test_seg_gallery, status],
            )
            run_btn.click(
                ui_mode2_run, inputs=[backend2, state],
                outputs=[state, result_gallery, status],
            )
    return demo


def main():  # pragma: no cover
    import argparse

    parser = argparse.ArgumentParser(description="BoxDreamer-TPU gradio demo")
    parser.add_argument("--safetensors", default=None)
    parser.add_argument("--share", action="store_true")
    args = parser.parse_args()
    build_interface(safetensors=args.safetensors).launch(share=args.share)


if __name__ == "__main__":
    main()
