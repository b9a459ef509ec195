"""Worker-side replay of streaming/_pb_vendor.py's protobuf bootstrap.

This directory is prepended to PYTHONPATH by ``ensure_protobuf()`` so
every Python interpreter forked afterwards (Spark's daemon + workers)
imports this module at startup via the standard ``site`` hook and can
speak the transform-with-state protobuf protocol.

The availability probe must ask for a USABLE runtime, not a bare
``import google.protobuf``: Spark workers carry spark-core.jar on
``sys.path``, and the jar's bundled ``google/protobuf/*.proto`` RESOURCE
directory imports as a phantom namespace package (no ``descriptor``
module, ``unknown location``) that shadows nothing but satisfies a bare
import. The phantom is purged from ``sys.modules`` before the vendored
runtime is appended, so the vendored regular package wins the next
import. Deliberately minimal and fail-silent: with a real usable
protobuf, or no vendorable runtime, the interpreter starts unchanged."""

import os
import sys

_VENDOR = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:  # noqa: BLE001 — ImportError or the phantom's errors
        return False


if not _usable() and os.path.isdir(os.path.join(_VENDOR, "google", "protobuf")):
    for _m in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[_m]  # drop phantom namespace portions from the probe
    if _VENDOR not in sys.path:
        sys.path.append(_VENDOR)  # append: never shadow real packages
    try:
        from google.protobuf import runtime_version as _rv

        # scoped bypass (mirrors _pb_vendor._patch_runtime_check): admit
        # ONLY gencode at most one minor ahead of this runtime, same
        # major; any larger skew still raises through the real validator
        if not getattr(_rv.ValidateProtobufRuntimeVersion, "_spark_graft_scoped", False):
            _orig = _rv.ValidateProtobufRuntimeVersion

            def _scoped(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
                if gen_major == _rv.MAJOR and _rv.MINOR <= gen_minor <= _rv.MINOR + 1:
                    return None
                return _orig(
                    gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
                )

            _scoped._spark_graft_scoped = True
            _rv.ValidateProtobufRuntimeVersion = _scoped
    except Exception:  # noqa: BLE001 — never break interpreter startup
        pass

if os.environ.get("SPARK_GRAFT_PB_DEBUG"):
    try:
        with open("/tmp/pb_boot_debug.txt", "a") as fh:
            fh.write(repr(sys.path) + "\n")
            try:
                import google

                fh.write("google: " + repr(getattr(google, "__path__", None)) + "\n")
                import google.protobuf as _gp

                fh.write(
                    "gp: " + repr(getattr(_gp, "__file__", None) or _gp.__path__) + "\n"
                )
            except Exception as e:  # noqa: BLE001
                fh.write("probe fail: " + repr(e) + "\n")
    except Exception:  # noqa: BLE001
        pass
