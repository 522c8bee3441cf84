"""Mount-day runbook: the ONE command that goes from released weights +
a dataset root to ``test_metrics.json``.

Accuracy parity against the paper tables is blocked only on assets this
image cannot contain (released safetensors, LINEMOD/OnePose/YCBV data,
zero egress). This module pins the exact command for the day they mount —
and the dress rehearsal (tests/parity/test_cli_dress_rehearsal.py) builds
its CLI invocation FROM :func:`eval_argv`, so the documented command and
the CI-proven command cannot drift.

Reference protocol being reproduced: run.py:154-183 +
src/lightning/utils/metrics/metric_utils.py:556-718.
"""

from __future__ import annotations

from typing import List

# Shown in README; `python run.py` + this argv == the full eval protocol.
MOUNT_DAY_EVAL = (
    "python run.py --config-name=test.yaml "
    "--safetensors BoxDreamer-vitb.safetensor "
    "datamodule.LINEMOD.root=data/lm"
)


def eval_argv(
    safetensors: str,
    dataset_root: str,
    dataset: str = "LINEMOD",
    *extra: str,
) -> List[str]:
    """argv for :func:`boxdreamer_tpu.cli.run.main` — the mount-day eval
    command. ``extra`` may mix ``--option value`` pairs and dotted
    ``key=value`` overrides (the rehearsal adds fixture sizing; mount day
    needs none). Options are ordered before the positional overrides —
    argparse's greedy positional matching rejects trailing options.
    Contract: every ``--option`` consumes one value token (run.py's CLI
    has no boolean flags); ``--opt=value`` spellings pass through as-is."""
    options: List[str] = []
    overrides: List[str] = []
    it = iter(extra)
    for tok in it:
        if tok.startswith("--"):
            options.append(tok)
            if "=" not in tok:
                try:
                    options.append(next(it))
                except StopIteration:
                    raise ValueError(
                        f"option {tok!r} is missing its value"
                    ) from None
        else:
            overrides.append(tok)
    return [
        "--config-name=test.yaml",
        "--safetensors", safetensors,
        *options,
        f"datamodule.{dataset}.root={dataset_root}",
        *overrides,
    ]
