#!/usr/bin/env python
"""Standalone monthly-climatology builder (reference `scripts/climatology.py`).

Thin wrapper over build_baselines' climatology computation:

    python scripts/climatology.py -c outputs/<run>
"""

import sys

from build_baselines import main  # noqa: F401

if __name__ == "__main__":
    main(sys.argv[1:])
