"""Environment validator (reference scripts/tools/env-tools/check.py).

Prints the availability/version of every dependency layer and runs a tiny
device smoke test. Exit code 0 when the required core is healthy.

Usage: python -m boxdreamer_tpu.tools.check_env
"""

from __future__ import annotations

import importlib
import sys

REQUIRED = ["jax", "flax", "optax", "orbax.checkpoint", "numpy", "PIL", "yaml"]
OPTIONAL = [
    "safetensors",
    "torch",
    "transformers",
    "matplotlib",
    "wandb",
    "gradio",
    "dust3r",
    "pycolmap",
]


def probe(name: str):
    try:
        mod = importlib.import_module(name)
        version = getattr(mod, "__version__", "?")
        return True, version
    except Exception as e:  # noqa: BLE001
        return False, str(e).splitlines()[0][:60]


def main() -> int:
    ok = True
    print("== required ==")
    for name in REQUIRED:
        good, info = probe(name)
        ok &= good
        print(f"  {'OK ' if good else 'MISS'} {name:<20} {info}")
    print("== optional ==")
    for name in OPTIONAL:
        good, info = probe(name)
        print(f"  {'OK ' if good else '--  '} {name:<20} {info}")

    print("== devices ==")
    try:
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        print(f"  backend={jax.default_backend()} devices={len(devs)}: "
              f"{[str(d) for d in devs[:4]]}")
        x = jnp.ones((128, 128))
        y = jax.block_until_ready(x @ x)
        print(f"  matmul smoke test OK (sum={float(y.sum()):.0f})")
    except Exception as e:  # noqa: BLE001
        ok = False
        print(f"  DEVICE FAILURE: {e}")

    print("== native ==")
    try:
        from boxdreamer_tpu.data.boxpack import _load_native

        lib = _load_native()
        print(f"  boxpack native reader: {'compiled' if lib else 'fallback (python)'}")
    except Exception as e:  # noqa: BLE001
        print(f"  boxpack check failed: {e}")

    print("healthy" if ok else "MISSING REQUIRED DEPENDENCIES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
