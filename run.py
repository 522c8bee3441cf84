#!/usr/bin/env python
"""Top-level entry (reference run.py surface):

    python run.py --config-name=train.yaml [key=value ...]
    python run.py --config-name=test.yaml datamodule.LINEMOD.root=data/lm
"""

import sys

from boxdreamer_tpu.cli.run import main

if __name__ == "__main__":
    sys.exit(main())
