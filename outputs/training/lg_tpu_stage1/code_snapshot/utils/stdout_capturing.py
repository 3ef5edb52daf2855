"""fd-level stdout/stderr tee to a log file
(reference: gluefactory/utils/stdout_capturing.py:18-134 — sacred-style
capture so rank-0 training output lands in ``log.txt`` even from C++/XLA)."""

from __future__ import annotations

import contextlib
import os
import re
import subprocess
import sys
from pathlib import Path


def apply_backspaces_and_linefeeds(text: str) -> str:
    """Clean up progress-bar control characters
    (reference stdout_capturing.py:18-40)."""
    orig_lines = text.split("\n")
    lines = []
    for line in orig_lines:
        # apply carriage returns: keep only the final overwrite
        parts = line.split("\r")
        cur = ""
        for part in parts:
            cur = part + cur[len(part):]
        # apply backspaces
        while "\b" in cur:
            cur = re.sub("[^\b]\b", "", cur, count=1)
            cur = cur.lstrip("\b")
        lines.append(cur)
    return "\n".join(lines)


@contextlib.contextmanager
def capture_outputs(log_path: str | Path):
    """Tee OS-level stdout/stderr into ``log_path`` via a tee subprocess
    (reference stdout_capturing.py:69-134)."""
    log_path = Path(log_path)
    log_path.parent.mkdir(parents=True, exist_ok=True)
    sys.stdout.flush()
    sys.stderr.flush()
    saved_out = os.dup(1)
    saved_err = os.dup(2)
    tee = subprocess.Popen(
        ["tee", "-a", str(log_path)], stdin=subprocess.PIPE,
        stdout=saved_out, close_fds=True,
    )
    try:
        os.dup2(tee.stdin.fileno(), 1)
        os.dup2(tee.stdin.fileno(), 2)
        yield
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os.dup2(saved_out, 1)
        os.dup2(saved_err, 2)
        tee.stdin.close()
        tee.wait(timeout=5)
        os.close(saved_out)
        os.close(saved_err)
