"""Repo-relative data/output paths (reference: gluefactory/settings.py:1-7).

Overridable via environment so multi-host launches can point every host at its
own local scratch while sharing a network filesystem for checkpoints.
"""

import os
from pathlib import Path

root = Path(__file__).parent.parent

ROOT_PATH = root
WEIGHTS_PATH = Path(os.environ.get("GFTPU_WEIGHTS_PATH", root / "weights"))
DATA_PATH = Path(os.environ.get("GFTPU_DATA_PATH", root / "data"))
TRAINING_PATH = Path(os.environ.get("GFTPU_TRAINING_PATH", root / "outputs" / "training"))
EVAL_PATH = Path(os.environ.get("GFTPU_EVAL_PATH", root / "outputs" / "results"))
