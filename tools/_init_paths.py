"""Make the repo root importable when tools are run as scripts
(the reference's tools/_init_paths.py:17-19 equivalent)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
