"""Offline wandb log syncing (reference scripts/tools/wandb/wandb_sync.py:1-41
periodic `wandb sync --sync-all` loop, and wandb_init.py login check).

TPU training hosts often have no direct egress; runs log offline (the
ExperimentLogger's wandb-style JSONL mirrors this) and a sidecar syncs them
through a proxy. Gated on the wandb CLI being installed.

Usage:
    python -m boxdreamer_tpu.tools.wandb_sync WANDB_ROOT [--period 60]
        [--proxy http://...] [--once]
    python -m boxdreamer_tpu.tools.wandb_sync --check-login
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time
from datetime import datetime


def wandb_available() -> bool:
    return shutil.which("wandb") is not None


def sync_once(wandb_root: str, proxy: str | None = None) -> tuple[str, str]:
    """One `wandb sync --sync-all` pass from ``wandb_root`` (reference
    sync_wandb, wandb_sync.py:10-21)."""
    env = os.environ.copy()
    if proxy:
        env["HTTP_PROXY"] = proxy
        env["HTTPS_PROXY"] = proxy
    try:
        result = subprocess.run(
            ["wandb", "sync", "--sync-all"],
            cwd=wandb_root, env=env, check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        return result.stdout, result.stderr
    except subprocess.CalledProcessError as e:
        return e.stdout or "", e.stderr or ""


def check_login() -> bool:
    """Non-interactive login probe (reference wandb_init.py flow minus the
    pip-install prompt)."""
    try:
        import wandb  # noqa: PLC0415
    except ImportError:
        print("wandb is not installed; `pip install wandb` to enable syncing")
        return False
    api_key = os.environ.get("WANDB_API_KEY")
    if api_key:
        print("WANDB_API_KEY is set")
        return True
    netrc = os.path.expanduser("~/.netrc")
    if os.path.exists(netrc) and "api.wandb.ai" in open(netrc).read():
        print("wandb credentials found in ~/.netrc")
        return True
    print("no wandb credentials (set WANDB_API_KEY or run `wandb login`)")
    return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("wandb_root", nargs="?", default=None)
    p.add_argument("--period", type=float, default=60.0)
    p.add_argument("--proxy", default=None)
    p.add_argument("--once", action="store_true", help="sync once and exit")
    p.add_argument("--check-login", action="store_true")
    a = p.parse_args(argv)

    if a.check_login:
        return 0 if check_login() else 1

    if not a.wandb_root:
        p.error("wandb_root is required unless --check-login")
    if not os.path.exists(a.wandb_root):
        print(f"WANDB_ROOT does not exist: {a.wandb_root}", file=sys.stderr)
        return 1
    if not wandb_available():
        print("wandb CLI not installed; nothing to sync", file=sys.stderr)
        return 1

    while True:
        stdout, stderr = sync_once(a.wandb_root, a.proxy)
        now = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        print(f"wandb sync at {now}.")
        if stdout:
            print("Standard Output:\n", stdout)
        if stderr:
            print("Standard Error:\n", stderr)
        if a.once:
            return 0
        time.sleep(a.period)


if __name__ == "__main__":
    raise SystemExit(main())
