"""Session-scoped scratch root for the CLI tools (VERDICT r15 "what's
wrong" #2, extended): some registry query builders mkdtemp fixture
dirs (file-source streaming stand-ins, checkpoint-restart fixtures,
binary-source scans). pytest (tests/conftest.py) and bench.py already
route those under a per-session root removed at exit; the audit /
correctness / demo tools run the same builders outside either harness,
so they need the same containment or every tool run strews fixture
dirs across /tmp.

Usage: `from _scratch import activate; activate()` as the first line
of the tool's main().
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile


def activate(prefix: str = "tool_scratch_") -> str:
    root = tempfile.mkdtemp(prefix=prefix)
    os.environ["TMPDIR"] = root
    tempfile.tempdir = root
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root
