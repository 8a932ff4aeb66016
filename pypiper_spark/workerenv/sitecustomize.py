"""Worker-side bootstrap for the protobuf fallback (pbcompat.py).

Spark Python workers — the regular worker daemon AND the
transformWithState pre-init driver worker — import ``sitecustomize``
at interpreter start when this directory is on their PYTHONPATH
(session.get_spark puts it on os.environ['PYTHONPATH'] before the JVM
launches, the one env every python child inherits). The repo package
itself is not importable in workers, so the implementation loads by
file path; any failure is swallowed — a broken sitecustomize would
take down every worker for every query, protobuf-related or not.
"""

try:
    import importlib.util as _ilu
    import os as _os

    _impl = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "pbcompat.py",
    )
    _spec = _ilu.spec_from_file_location("_pypiper_pbcompat", _impl)
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    _mod.install()
except Exception:  # noqa: BLE001 — never break worker startup
    pass
