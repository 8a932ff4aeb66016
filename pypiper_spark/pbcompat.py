"""Pure-Python protobuf fallback for transformWithStateInPandas.

Spark 4's typed-state streaming API talks to the JVM state server
over protobuf; its generated module (pyspark.sql.streaming.proto.
StateMessage_pb2, gencode 6.x) needs an importable
``google.protobuf`` runtime, which this container does not ship as a
site package. The google-cloud-sdk installed in the image DOES carry
a complete pure-Python protobuf runtime (4.23.2), vendored under its
own namespace (``cloudsdk.google.protobuf``). install() bridges the
two (VERDICT r8 next #3) with plain sys.modules aliasing:

- ``sys.modules['google.protobuf']`` points at the vendored package
  object. ``from google.protobuf import X`` then resolves children
  through the parent's REAL ``__name__``/``__path__`` (the cloudsdk
  tree), so every descriptor/message class exists exactly once — no
  meta-path specs, whose module-attr initialization was measured to
  clobber the shared package's ``__path__``.
- ``runtime_version`` — a module the 6.x gencode imports that the
  4.x runtime predates — is registered as a shim whose version check
  is a no-op. StateMessage.proto is plain proto3; its serialized
  descriptors and the wire format are stable across these runtimes,
  which tests/test_streaming.py exercises end to end through a real
  transformWithStateInPandas query.

The bridge activates ONLY when ``google.protobuf`` is not already
importable; with a real protobuf installation this module is inert.
Spark's python children need it too: the regular worker daemon AND
the transformWithState pre-init driver worker (StreamingPythonRunner,
which builds its child env from the JVM's inherited PYTHONPATH only,
ignoring the per-function env map) — hence session.get_spark puts
``workerenv/`` (whose sitecustomize.py replays install()) on
os.environ['PYTHONPATH'] BEFORE the JVM starts.
"""

from __future__ import annotations

import os
import sys
import types

_CLOUDSDK_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"


def _usable() -> bool:
    """A USABLE protobuf runtime, not merely an importable name: in
    Spark python children the core jar sits on sys.path as a zip and
    its bundled google/protobuf/*.proto RESOURCES make
    ``import google.protobuf`` succeed as an empty namespace package —
    the exact "(unknown location)" trap the driver worker hit. Probe
    for the descriptor module instead."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def install() -> bool:
    """Make ``google.protobuf`` usable; True on success. Prefers a
    real installation; falls back to the vendored cloud-sdk runtime;
    False when neither exists (callers keep their skip gates)."""
    if _usable():
        return True
    if not os.path.isdir(os.path.join(_CLOUDSDK_THIRD_PARTY, "cloudsdk")):
        return False
    if _CLOUDSDK_THIRD_PARTY not in sys.path:
        sys.path.append(_CLOUDSDK_THIRD_PARTY)
    try:
        import cloudsdk.google.protobuf as _pb
    except ImportError:
        return False

    shim = types.ModuleType("cloudsdk.google.protobuf.runtime_version")

    class Domain:
        GOOGLE_INTERNAL = 1
        PUBLIC = 2

    shim.Domain = Domain
    shim.ValidateProtobufRuntimeVersion = lambda *a, **k: None

    # evict namespace-package residue of the probe (the jar-resource
    # trap above) so the aliases below are authoritative
    for name in list(sys.modules):
        if name == "google.protobuf" or name.startswith("google.protobuf."):
            del sys.modules[name]

    # both names: `from google.protobuf import runtime_version` builds
    # the child name from the parent's __name__ (the cloudsdk name)
    sys.modules.setdefault("cloudsdk.google.protobuf.runtime_version", shim)
    sys.modules["google.protobuf.runtime_version"] = shim
    if not hasattr(_pb, "runtime_version"):
        _pb.runtime_version = shim

    if "google" not in sys.modules:
        g = types.ModuleType("google")
        g.__path__ = []
        sys.modules["google"] = g
    sys.modules["google.protobuf"] = _pb
    sys.modules["google"].protobuf = _pb
    return _usable()


def worker_env_entry() -> str:
    """Directory whose sitecustomize.py replays install() in Spark
    worker processes — get_spark puts it on PYTHONPATH before the JVM
    starts so every python child (worker daemon, streaming driver
    worker) inherits it."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "workerenv")
