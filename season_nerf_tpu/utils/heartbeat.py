"""Process-wide liveness heartbeat.

One file, touched from every potentially-device-blocked loop (the train
loop and the renderer's chunk driver), watched by
``tools/watchdog_train.py``.  A hung accelerator RPC freezes those loops,
the mtime goes stale, and the watchdog restarts the run from the latest
checkpoint — the failure-detection/elastic-recovery layer the reference
has none of (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Optional

_path: Optional[str] = None


def set_path(path: Optional[str]):
    global _path
    _path = path


def beat():
    if not _path:
        return
    try:
        os.utime(_path)
    except OSError:
        try:
            open(_path, "w").close()
        except OSError:
            pass
