"""Locate a usable ``google.protobuf`` runtime for Spark 4's
transformWithStateInPandas (TWS).

pyspark 4.1.2 ships protoc-6.33.0 gencode
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``) whose import
calls ``ValidateProtobufRuntimeVersion(PUBLIC, 6, 33, 0)`` — it wants
the ``google.protobuf`` runtime at ≥ 6.33.0. This container installs
no protobuf distribution at all, but the (publicly distributed)
Google Cloud SDK under ``/usr/lib/google-cloud-sdk`` bundles a
pure-Python protobuf **6.32.0-dev** runtime for App Engine tooling —
one minor version shy of the gencode's pin.

protobuf's own validator provides the escape hatch for exactly this
situation: the documented ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``
environment variable (``google/protobuf/runtime_version.py``) skips
the gencode/runtime pin, and the 6.32→6.33 wire format is unchanged
(the check is a release-hygiene pin, not a wire break). So:

- put the bundled runtime's parent dir on ``sys.path`` AND in
  ``PYTHONPATH`` (Python workers — where the TWS state server's
  client side runs — inherit the env, not the driver's ``sys.path``);
- set the disable flag plus
  ``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` (the bundle has
  no compiled upb extension for this interpreter).

``ensure_protobuf()`` must run BEFORE the JVM starts (workers inherit
the JVM's environment): call it before the first ``get_spark()``.
It is a no-op where a real protobuf distribution exists.
"""

from __future__ import annotations

import importlib
import os
import sys

#: Publicly-distributed bundles that carry a pure-Python protobuf
#: runtime. Probed in order; first importable wins.
_CANDIDATE_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_ENV = {
    "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK": "true",
    "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION": "python",
}


def _importable() -> bool:
    try:
        importlib.import_module("google.protobuf.descriptor")
        return True
    except Exception:  # noqa: BLE001 — ANY import failure (VersionError,
        # SyntaxError from a truncated bundle, AttributeError) means
        # "not usable"; the caller reverts its mutations on False, so
        # an exception escaping here would leave them poisoned.
        return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable — in this process and in
    PySpark worker processes — vendoring a bundled pure-Python
    runtime if no real distribution exists. Returns True if protobuf
    is usable afterwards. Idempotent.

    Mutations (env vars, sys.path, PYTHONPATH) are REVERTED when a
    candidate bundle fails its import probe: a broken bundle must not
    leave workers with a poisoned PYTHONPATH or the protobuf version
    check globally disabled for a runtime installed later."""
    if _importable():
        return True
    for d in _CANDIDATE_DIRS:
        if not os.path.isdir(os.path.join(d, "google", "protobuf")):
            continue
        saved_env = {
            k: os.environ.get(k) for k in list(_ENV) + ["PYTHONPATH"]
        }
        saved_path = d in sys.path
        os.environ.update(_ENV)
        if not saved_path:
            sys.path.insert(0, d)
        # workers get the path via env, not sys.path
        pp = os.environ.get("PYTHONPATH", "")
        if d not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = f"{d}{os.pathsep}{pp}" if pp else d
        if _importable():
            return True
        # probe failed: undo everything this candidate touched
        for k, old in saved_env.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
        if not saved_path and d in sys.path:
            sys.path.remove(d)
        # purge partially-imported modules FROM THE FAILED BUNDLE only
        # (a stale google.protobuf.runtime_version would shadow a later
        # real install) — but leave healthy, unrelated google.*
        # namespace packages (google.auth, google.cloud.*) alone:
        # evicting a live module re-executes it on next import and
        # breaks isinstance/singleton identity for code already
        # holding the old objects
        for name in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
            mod = sys.modules.get(name)
            mod_file = getattr(mod, "__file__", None) or ""
            if name == "google" or mod_file.startswith(d + os.sep):
                sys.modules.pop(name, None)
    return False
