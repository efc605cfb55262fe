"""Test-environment shim that makes ``transformWithState`` runnable in
a container without an installed ``protobuf`` package.

PySpark 4's transformWithState path speaks protobuf between the Python
state processor and the JVM state server; its generated module
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``) is protobuf
GENCODE 6.33.0. This container ships no ``google.protobuf`` on
sys.path, but the (public) Google Cloud SDK bundled at
/usr/lib/google-cloud-sdk carries a pure-Python protobuf runtime
6.32.0 — one minor version OLDER than the gencode, which the runtime's
``ValidateProtobufRuntimeVersion`` hard-rejects even though the wire
format and the generated API are compatible across that skew.

This sitecustomize (activated ONLY by putting this directory on
PYTHONPATH — the tws test does so for its subprocess, nothing else
sees it) makes that runtime importable and disables the version check.
It is a TEST AFFORDANCE: the tws test then asserts full state-evolution
equality against the legacy applyInPandasWithState operator AND the
batch aggregate, so any actual protobuf misbehavior fails the test
rather than hiding. Production clusters install a current protobuf and
never load this file.

The candidate directory can be overridden with the
``KGS_PUREPY_PROTOBUF_DIR`` environment variable.
"""

import os
import sys

_CANDIDATE = os.environ.get(
    "KGS_PUREPY_PROTOBUF_DIR",
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

if os.path.isdir(os.path.join(_CANDIDATE, "google", "protobuf")):
    sys.path.insert(0, _CANDIDATE)
    try:
        from google.protobuf import runtime_version as _rv

        # Gencode 6.33 vs runtime 6.32: the strict check would raise
        # VersionError even though the wire format and generated API
        # are compatible across a one-minor skew. Bound the override
        # (ADVICE r11): only bypass the validator when the gencode the
        # caller declares is the SAME major and within one minor of
        # this runtime — any wider skew (where wire behavior could
        # genuinely differ) falls through to the strict check and
        # fails loudly instead of being silently waved past.
        _orig_validate = _rv.ValidateProtobufRuntimeVersion

        def _validate_within_window(domain, major, minor, patch,
                                     suffix, location):
            if major == _rv.MAJOR and abs(minor - _rv.MINOR) <= 1:
                return None
            return _orig_validate(
                domain, major, minor, patch, suffix, location
            )

        _rv.ValidateProtobufRuntimeVersion = _validate_within_window
    except Exception:
        pass
