"""cli/runbook.py — the mount-day command builder the dress rehearsal
executes (drift-proofing). Pins the argv ordering contract (options before
positional overrides — argparse's greedy positional matching) and the
value-less-option error."""

import pytest

from boxdreamer_tpu.cli.runbook import MOUNT_DAY_EVAL, eval_argv


def test_option_override_ordering():
    argv = eval_argv(
        "w.safetensor", "/data/lm", "LINEMOD",
        "--config-dir", "/repo/configs", "length=2", "precision=float32",
        "--max-steps", "5",
    )
    root_i = argv.index("datamodule.LINEMOD.root=/data/lm")
    # every --option (and its value) precedes the positional overrides
    assert argv.index("--config-dir") < root_i
    assert argv[argv.index("--config-dir") + 1] == "/repo/configs"
    assert argv.index("--max-steps") < root_i
    assert argv.index("length=2") > root_i
    assert argv.index("precision=float32") > root_i
    # the safetensors flag + config name lead
    assert argv[0] == "--config-name=test.yaml"
    assert argv[argv.index("--safetensors") + 1] == "w.safetensor"


def test_eq_spelled_options_pass_through():
    argv = eval_argv("w", "/r", "OnePose", "--config-dir=/c", "length=4")
    assert "--config-dir=/c" in argv
    assert argv.index("--config-dir=/c") < argv.index(
        "datamodule.OnePose.root=/r"
    )


def test_valueless_trailing_option_raises():
    with pytest.raises(ValueError, match="missing its value"):
        eval_argv("w", "/r", "LINEMOD", "--config-dir")


def test_documented_command_matches_builder():
    """The README-displayed MOUNT_DAY_EVAL string is the same invocation
    eval_argv builds for the default arguments."""
    built = eval_argv("BoxDreamer-vitb.safetensor", "data/lm")
    assert MOUNT_DAY_EVAL.split()[2:] == [
        "--config-name=test.yaml", "--safetensors",
        "BoxDreamer-vitb.safetensor", "datamodule.LINEMOD.root=data/lm",
    ]
    assert built == MOUNT_DAY_EVAL.split()[2:]
