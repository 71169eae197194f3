"""Checkpoint path management (reference: /root/reference/main.py:201-206).

The reference isolates each streaming query's checkpoint under a per-query
subdirectory to avoid collisions; we generalize that into a tiny manager so
every named query gets a stable, isolated path. Stable paths are what make
exactly-once-ish recovery work: offsets + state are journaled per query.
"""

from __future__ import annotations

import os


class CheckpointManager:
    def __init__(self, root: str):
        if not root:
            raise ValueError("checkpoint root must be set (reference main.py:203-204)")
        self.root = root

    def path_for(self, query_name: str) -> str:
        if not query_name or "/" in query_name:
            raise ValueError(f"invalid query name: {query_name!r}")
        return os.path.join(self.root, query_name)
