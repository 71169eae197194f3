"""Optional-dependency shims for constrained environments.

``transformWithStateInPandas`` (streaming/stateful.py) talks to the state
server over a protobuf protocol: the Python worker imports
``google.protobuf`` to parse ``StateMessage`` — and this container has no
protobuf wheel installed. It does, however, ship a PURE-PYTHON protobuf
runtime inside the (public) google-cloud-sdk install. :func:`ensure_protobuf`
makes that runtime importable for the driver AND Spark's Python workers:

* a temp dir exposing ONLY ``google/protobuf`` (symlink) is appended to
  ``sys.path`` and ``$PYTHONPATH`` — the surrounding appengine tree has
  unrelated top-level modules we must not shadow anything with;
* ``$PYTHONPATH`` must be extended BEFORE the SparkSession starts so the
  worker daemons inherit it (build_session calls this);
* the runtime is one minor version older than pyspark's generated
  StateMessage gencode, so protobuf's own escape hatch
  ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` is set; the TWS parity
  test validates actual behavior, not just importability.

Override the search path with ``$SPARK_GRAFT_PROTOBUF_PATH`` (a directory
that CONTAINS ``google/protobuf``). All of this is inert when a real
protobuf distribution is installed.
"""

from __future__ import annotations

import os
import sys
import tempfile

#: Directories that contain a ``google/protobuf`` pure-python runtime.
_CANDIDATE_DIRS = (
    os.environ.get("SPARK_GRAFT_PROTOBUF_PATH"),
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_shim_dir: str | None = None


def _have_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _extend_pythonpath(path: str) -> None:
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if path not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([*parts, path])


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.

    Returns True when protobuf is (or becomes) importable. Idempotent;
    call before SparkSession creation so workers inherit the env.
    """
    global _shim_dir
    if _have_protobuf():
        return True
    for cand in _CANDIDATE_DIRS:
        if not cand:
            continue
        src = os.path.join(cand, "google", "protobuf")
        if not os.path.isdir(src):
            continue
        if _shim_dir is None:
            shim = tempfile.mkdtemp(prefix="pb_shim_")
            os.makedirs(os.path.join(shim, "google"), exist_ok=True)
            try:
                os.symlink(src, os.path.join(shim, "google", "protobuf"))
            except OSError:
                shim = cand  # no symlink support: fall back to the raw dir
            _shim_dir = shim
        if _shim_dir not in sys.path:
            sys.path.append(_shim_dir)
        _extend_pythonpath(_shim_dir)
        # Runtime (6.32) is one minor behind pyspark's gencode (6.33);
        # protobuf's own opt-out, validated end-to-end by the TWS test.
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        if _have_protobuf():
            return True
    return False


def ensure_protobuf_for_session(spark) -> bool:
    """Make ``google.protobuf`` importable in the Python WORKERS of an
    already-running session.

    :func:`ensure_protobuf` only extends ``$PYTHONPATH`` in the driver
    process, which worker daemons inherit ONLY when the session starts
    afterwards (build_session's ordering). A driver-owned plain session
    (the correctness driver's) starts before any of our code runs, so the
    shim is shipped through ``sc.environment`` instead: PySpark captures
    that dict into each Python function's ``envVars`` at UDF-creation time
    (core/rdd.py::_prepare_for_python_RDD), and the JVM's
    PythonWorkerFactory forks a fresh daemon per distinct envVars
    signature with ``PYTHONPATH`` merged in — so UDFs created after this
    call get workers that can import the shim. Inert when a real protobuf
    distribution is installed (workers inherit it the normal way).
    """
    if not ensure_protobuf():
        return False
    if _shim_dir is not None:
        env = spark.sparkContext.environment
        pp = env.get("PYTHONPATH", "")
        parts = pp.split(os.pathsep) if pp else []
        if _shim_dir not in parts:
            env["PYTHONPATH"] = os.pathsep.join([*parts, _shim_dir])
        env.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
    return True
