"""Path constants (reference config/config.py:6-8 parity).

The reference exposes exactly three module constants used as CLI defaults.
Kept here with the same names/semantics; overridable via environment.
"""

import os

DATA_ROOT = os.environ.get("WCB_DATA_ROOT", "")
DATA_DIR = os.environ.get("WCB_DATA_DIR", "data/medical-united-syn-med-test")
JSONL_DATA = os.environ.get("WCB_JSONL_DATA", "data/medical-united-syn-med-test-jsonl")
