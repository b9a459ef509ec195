"""Vendored-protobuf bootstrap for ``transformWithStateInPandas``.

This container ships no pip-installed ``protobuf`` (and has no network),
but the image's public Google Cloud SDK carries a PURE-PYTHON protobuf
runtime (6.32.0) under ``platform/google_appengine`` for App Engine
tooling. Spark 4.1.2's transform-with-state Python workers speak a
protobuf state protocol (``pyspark.sql.streaming.proto.StateMessage_pb2``)
whose generated code pins gencode 6.33.0, and protobuf's runtime
validator hard-rejects a runtime one minor version older — so the
bootstrap (a) puts the vendored runtime on ``sys.path`` (APPENDED, never
shadowing a real install), (b) disables the version validator for this
one-minor-version skew, and (c) proves the combination with a real
serialize/parse round-trip of a StateMessage before declaring protobuf
available. If any step fails, the environment boundary stands exactly as
before (the e2e test skips; tests/test_streaming.py pins the boundary).

Worker propagation: Python workers are separate interpreters forked by
the JVM, so the driver-side patch does not reach them. The bootstrap
therefore exports ``PYTHONPATH`` pointing at ``_worker_boot/`` (whose
``sitecustomize.py`` replays steps a+b at interpreter startup — the
standard site-hook mechanism) BEFORE the JVM launches. A SparkSession
created before :func:`ensure_protobuf` ran will have workers without the
patch — callers that need the e2e path bootstrap first, then build the
session (tests/test_streaming.py does exactly this with a dedicated
session).
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = "/usr/lib/google-cloud-sdk/platform/google_appengine"
BOOT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_worker_boot")


def _patch_runtime_check() -> None:
    """Scope the version-guard bypass to the ONE known-good skew (gencode
    one minor ahead of this vendored runtime, same major — the pair the
    round-trip probe below proves). Everything else still goes through
    the real validator and fails loudly: a blanket no-op would silently
    admit a future larger skew for every protobuf gencode in the
    interpreter, not just pyspark's StateMessage."""
    from google.protobuf import runtime_version as rv

    if getattr(rv.ValidateProtobufRuntimeVersion, "_spark_graft_scoped", False):
        return
    orig = rv.ValidateProtobufRuntimeVersion

    def scoped(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        if gen_major == rv.MAJOR and rv.MINOR <= gen_minor <= rv.MINOR + 1:
            return None
        return orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)

    scoped._spark_graft_scoped = True
    rv.ValidateProtobufRuntimeVersion = scoped


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` usable by Spark's state protocol in THIS
    process and (via PYTHONPATH/sitecustomize) in Python workers forked
    after this call. Returns True only after a proven round-trip."""
    # probe for a USABLE runtime, not a bare package: spark-core.jar's
    # bundled google/protobuf/*.proto resources import as a phantom
    # namespace package in worker interpreters (no descriptor module),
    # so the probe must demand the module the state protocol needs
    have_real = True
    try:
        from google.protobuf import descriptor  # noqa: F401
    except Exception:  # noqa: BLE001 — ImportError or phantom's errors
        have_real = False
    if not have_real:
        for m in [
            m for m in sys.modules if m == "google" or m.startswith("google.")
        ]:
            del sys.modules[m]  # drop phantom namespace portions
        if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
            return False
        if VENDOR_DIR not in sys.path:
            sys.path.append(VENDOR_DIR)
        try:
            _patch_runtime_check()
        except Exception:  # noqa: BLE001 — any failure means "not available"
            return False
        # workers: sitecustomize replays the patch at interpreter start
        parts = [BOOT_DIR] + [
            p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p
        ]
        os.environ["PYTHONPATH"] = os.pathsep.join(dict.fromkeys(parts))
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        req = sm.StateRequest()
        req.version = 1
        out = sm.StateRequest()
        out.ParseFromString(req.SerializeToString())
        return out.version == 1
    except Exception:  # noqa: BLE001
        return False
