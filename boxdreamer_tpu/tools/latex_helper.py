"""Metrics -> LaTeX table generator.

Equivalent of the reference's scripts/tools/latex_helper.py: turns a
``test_metrics.json`` into a per-category LaTeX results table.

Usage:
    python -m boxdreamer_tpu.tools.latex_helper --metrics test_metrics.json \
        --rows "ADD-0.1d 0" "proj2D@5px 0" --output table.tex
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional, Sequence


def metrics_to_latex(
    metrics: Dict[str, Dict[str, float]],
    rows: Sequence[str],
    percent: bool = True,
    precision: int = 1,
) -> str:
    """Build a tabular with one column per category (plus 'all' mean)."""
    cats: List[str] = []
    for r in rows:
        for cat in metrics.get(r, {}):
            if cat != "all" and cat not in cats:
                cats.append(cat)
    cats = sorted(cats) + ["all"]

    header = " & ".join(["Metric"] + [c.replace("_", r"\_") for c in cats])
    lines = [
        r"\begin{tabular}{l" + "c" * len(cats) + "}",
        r"\toprule",
        header + r" \\",
        r"\midrule",
    ]
    for r in rows:
        vals = []
        for cat in cats:
            v = metrics.get(r, {}).get(cat)
            if v is None:
                vals.append("-")
            else:
                v = v * 100.0 if percent and 0.0 <= v <= 1.0 else v
                vals.append(f"{v:.{precision}f}")
        lines.append(
            " & ".join([r.replace("_", r"\_")] + vals) + r" \\"
        )
    lines += [r"\bottomrule", r"\end{tabular}"]
    return "\n".join(lines)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="metrics json -> LaTeX table")
    parser.add_argument("--metrics", required=True)
    parser.add_argument("--rows", nargs="+", default=None,
                        help="metric keys to include (default: all)")
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)
    with open(args.metrics) as f:
        metrics = json.load(f)
    rows = args.rows or [k for k in metrics if not k.startswith("eval size")]
    table = metrics_to_latex(metrics, rows)
    if args.output:
        with open(args.output, "w") as f:
            f.write(table + "\n")
    else:
        print(table)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
