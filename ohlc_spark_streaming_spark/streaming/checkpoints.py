"""Checkpoint path management (reference: /root/reference/main.py:201-206).

The reference isolates each streaming query's checkpoint under a per-query
subdirectory to avoid collisions; we generalize that into a tiny manager so
every named query gets a stable, isolated path. Stable paths are what make
exactly-once-ish recovery work: offsets + state are journaled per query.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile


class CheckpointManager:
    def __init__(self, root: str):
        if not root:
            raise ValueError("checkpoint root must be set (reference main.py:203-204)")
        self.root = root

    def path_for(self, query_name: str) -> str:
        if not query_name or "/" in query_name:
            raise ValueError(f"invalid query name: {query_name!r}")
        return os.path.join(self.root, query_name)


@contextlib.contextmanager
def ephemeral_checkpoint(name: str):
    """Per-invocation checkpoint directory with GUARANTEED removal — the
    only sanctioned way for a registry query to pass checkpointLocation.

    foreachBatch / file-sink checkpoints are NOT auto-deleted by Spark
    (unlike the memory sink's implicit temp checkpoint), so every call
    site that mkdtemp'd its own directory either leaked /tmp/ckpt_* per
    invocation or hand-rolled the same try/finally (the c09363f cleanup
    class, ADVICE r8). tools_lint.py's CKPT_RAW source lint bans raw
    ``checkpointLocation`` strings outside this module, the persistent
    CheckpointManager topology (streaming/app.py) and the caller-owned
    sink builders — so the fix stays structural rather than per-site.
    """
    path = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    try:
        yield path
    finally:
        shutil.rmtree(path, ignore_errors=True)


def run_foreach_batch(stream_df, batch_fn, name: str) -> None:
    """Run a bounded stream through ``foreachBatch`` to completion under
    an ephemeral checkpoint — the shared driver for every fold-style
    registry query (incremental candles, as-of enrich, rolling actives).
    One site owns the writeStream wiring AND the cleanup contract."""
    with ephemeral_checkpoint(name) as ckpt:
        query = (
            stream_df.writeStream.foreachBatch(batch_fn)
            .queryName(name)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        query.awaitTermination()
