"""Paper-figure builders: quad grid and method-comparison grid.

Non-interactive equivalents of the reference figure scripts:

  * :func:`quad_grid` — 2x2 image grid with optional per-image captions in
    academic (serif, thin-border) style; reference
    scripts/tools/draw_grid.py:111-274 ``visualize_quad_grid`` (its
    stdin-driven selection flow is replaced by arguments + an optional
    JSON selection file, matching its ~/.quad_grid_backup.json format).
  * :func:`comparison_grid` — methods x scenes grid of cropped result
    images with rotated method labels on the left and per-method border
    colors; reference scripts/tools/draw_comparision_fig.py:221-392
    ``visualize_grid`` including its ``{frameid}-*-{method}-cropresults.png``
    file-matching convention and OnePose++/Gen6D/Ours display names.

Both save PNG (and PDF for the comparison grid) and never call plt.show() —
headless TPU hosts have no display. LaTeX text rendering is attempted only
when a ``latex`` binary exists (the reference's try/except around
``text.usetex`` doesn't actually catch missing LaTeX — matplotlib fails at
save time — so we probe up front).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional, Sequence

import numpy as np

METHOD_DISPLAY_NAMES = {
    "onepose": "OnePose++",
    "onepose++": "OnePose++",
    "gen6d": "Gen6D",
    "ours": "Ours",
}
METHOD_COLORS = ["#7FB3B0", "#B3927F", "#A694C3"]
BORDER_COLOR = "#444444"


def _academic_style(base_size: int = 9):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    usetex = shutil.which("latex") is not None
    plt.rcParams.update(
        {
            "text.usetex": usetex,
            "font.family": "serif",
            "font.serif": ["Times", "Times New Roman", "CMU Serif", "DejaVu Serif"],
            "font.size": base_size,
            "axes.linewidth": 0.5,
            "xtick.major.width": 0.5,
            "ytick.major.width": 0.5,
        }
    )
    try:
        plt.style.use("seaborn-v0_8-whitegrid")
    except OSError:
        pass
    return plt


def quad_grid(
    image_paths: Sequence[str],
    image_descs: Optional[Sequence[str]] = None,
    output: str = "quad_grid.png",
) -> str:
    """Render up to four images in a 2x2 grid with optional captions.

    Empty-string paths leave their cell blank (reference draw_grid.py skip
    semantics). Returns the output path.
    """
    from PIL import Image

    plt = _academic_style(9)
    image_paths = list(image_paths) + [""] * (4 - len(image_paths))
    descs = list(image_descs or []) + [""] * 4
    descs = descs[:4]
    has_any_desc = any(descs)

    fig_size = 6.0
    fig_height = fig_size * 1.15 if has_any_desc else fig_size
    fig = plt.figure(figsize=(fig_size, fig_height))

    desc_ratio = 0.1
    img_h = (1.0 - desc_ratio) / 2 if has_any_desc else 0.5
    grid = [
        [0.0, 0.5, 0.5, img_h],
        [0.5, 0.5, 0.5, img_h],
        [0.0, 0.5 - img_h, 0.5, img_h],
        [0.5, 0.5 - img_h, 0.5, img_h],
    ]
    for i, (path, desc) in enumerate(zip(image_paths[:4], descs)):
        ax = fig.add_axes(grid[i])
        ax.set_xticks([])
        ax.set_yticks([])
        ax.grid(False)
        if path:
            ax.imshow(np.asarray(Image.open(path).convert("RGB")))
            for spine in ax.spines.values():
                spine.set_color(BORDER_COLOR)
                spine.set_linewidth(0.8)
        else:
            ax.axis("off")
        if desc:
            ax.set_xlabel(desc, fontsize=8)
    fig.savefig(output, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return output


def load_selection(path: str) -> Dict:
    """Read a draw_grid.py-format selection JSON
    ({'image_paths': [...], 'image_descs': [...]})."""
    with open(path) as f:
        return json.load(f)


def find_crop_result(
    croped_dir: str, frameid: str, method: str
) -> Optional[str]:
    """Locate ``{frameid}-*-{method}-cropresults.png``
    (reference draw_comparision_fig.py:340-348 matching rule: prefix match
    on frameid, the second-to-last dash field names the method)."""
    if not os.path.isdir(croped_dir):
        return None
    for file in sorted(os.listdir(croped_dir)):
        if file.startswith(f"{frameid}-") and file.endswith("-cropresults.png"):
            parts = file.split("-")
            if len(parts) >= 4 and parts[-2] == method:
                return os.path.join(croped_dir, file)
    return None


def comparison_grid(
    data_root: str,
    scenes: Sequence[str],
    frameids: Sequence[str],
    methods: Sequence[str],
    output: Optional[str] = None,
) -> str:
    """Methods (rows) x selected frames (columns) comparison grid over
    ``{data_root}/{scene}/croped/`` result images. Returns the PNG path
    (a PDF twin is written alongside, reference :378-386)."""
    from PIL import Image

    plt = _academic_style(12)
    n = len(scenes)
    assert len(frameids) == n, "one frameid per scene column"
    rows = len(methods)

    fig = plt.figure(figsize=(n * 0.8, rows * 0.8))
    name_w = 0.01
    left_margin = 0.1
    img_w = (1.0 - left_margin) / n
    img_h = 1.0 / rows

    for row, method in enumerate(methods):
        display = METHOD_DISPLAY_NAMES.get(method.lower(), method)
        if plt.rcParams["text.usetex"]:
            display = r"\textrm{" + display + "}"
        plt.figtext(
            name_w / 3, 1.0 - (row + 0.5) * img_h, display,
            ha="center", va="center", fontsize=8, rotation=90,
        )
        for col in range(n):
            ax = fig.add_axes(
                [name_w + col * img_w, 1.0 - (row + 1) * img_h, img_w, img_h]
            )
            ax.set_xticks([])
            ax.set_yticks([])
            ax.grid(False)
            ax.set_xmargin(0)
            ax.set_ymargin(0)
            path = find_crop_result(
                os.path.join(data_root, scenes[col], "croped"),
                frameids[col], method,
            )
            if path:
                ax.imshow(np.asarray(Image.open(path)))
                for spine in ax.spines.values():
                    spine.set_color(METHOD_COLORS[row % len(METHOD_COLORS)])
                    spine.set_linewidth(0.8)
            else:
                ax.text(0.5, 0.5, "No image", ha="center", va="center", fontsize=6)

    png = output or os.path.join(data_root, "visualization_grid.png")
    pdf = os.path.splitext(png)[0] + ".pdf"
    fig.savefig(pdf, dpi=300, bbox_inches="tight", pad_inches=0, format="pdf")
    fig.savefig(png, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return png


_CURVE_STYLES = (
    ("#7FB3B0", "o", "--"),
    ("#B3927F", "s", "-"),
    ("#A694C3", "x", "-."),
    ("#8FA977", "^", ":"),
)


def metric_curves(
    x_values,
    series: Dict[str, "list"],
    output: str,
    xlabel: str = "Number of Reference Views $n$",
    ylabel: str = "Succ Rate (%)",
    title: str = "Sparse View Robustness",
    figsize=(3.4, 2.5),
) -> str:
    """Column-width metric-vs-reference-count line plot (the parameterized
    form of scripts/draw_plot_fig.py:1-97 — same palette, markers, ICCV
    two-column sizing; the reference hardcodes its numbers)."""
    plt = _academic_style(10)
    fig, ax = plt.subplots(figsize=figsize, dpi=300)
    for (name, ys), (color, marker, ls) in zip(series.items(), _CURVE_STYLES):
        ax.plot(
            x_values, ys, color=color, marker=marker, markersize=4,
            linestyle=ls, linewidth=1, markeredgewidth=0.8,
            markerfacecolor=color, label=name,
        )
    ax.set_xlim(min(x_values), max(x_values))
    ax.set_xlabel(xlabel, fontsize=10)
    ax.set_ylabel(ylabel, fontsize=10)
    ax.set_title(title, fontsize=10)
    ax.grid(True, linestyle="-", alpha=0.2)
    ax.legend(loc="lower right", frameon=True, fontsize=8, framealpha=0.9)
    ax.tick_params(axis="both", which="major", labelsize=8)
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)
    fig.tight_layout()
    fig.savefig(output, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return output


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("quad", help="2x2 image grid")
    q.add_argument("--images", nargs="+", default=None)
    q.add_argument("--descs", nargs="*", default=None)
    q.add_argument("--selection", default=None,
                   help="draw_grid.py-format selection JSON")
    q.add_argument("--output", default="quad_grid.png")

    c = sub.add_parser("compare", help="methods x frames comparison grid")
    c.add_argument("data_root")
    c.add_argument("--scenes", nargs="+", required=True)
    c.add_argument("--frameids", nargs="+", required=True)
    c.add_argument("--methods", nargs="+", default=["ours", "gen6d", "onepose"])
    c.add_argument("--output", default=None)

    v = sub.add_parser("curves", help="metric-vs-reference-count line plot")
    v.add_argument("spec", help="JSON: {x: [...], series: {name: [...]}, "
                                "xlabel?, ylabel?, title?}")
    v.add_argument("--output", default="metric_curves.png")

    a = p.parse_args(argv)
    if a.cmd == "curves":
        with open(a.spec) as f:
            spec = json.load(f)
        out = metric_curves(
            spec["x"], spec["series"], a.output,
            xlabel=spec.get("xlabel", "Number of Reference Views $n$"),
            ylabel=spec.get("ylabel", "Succ Rate (%)"),
            title=spec.get("title", "Sparse View Robustness"),
        )
        print(out)
        return 0
    if a.cmd == "quad":
        paths, descs = a.images, a.descs
        if a.selection:
            sel = load_selection(a.selection)
            paths = paths or sel.get("image_paths", [])
            descs = descs or sel.get("image_descs", [])
        if not paths:
            p.error("--images or --selection required")
        out = quad_grid(paths, descs, a.output)
    else:
        out = comparison_grid(a.data_root, a.scenes, a.frameids, a.methods, a.output)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
