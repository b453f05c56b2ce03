"""google.protobuf compatibility shim for containers without protobuf.

The transformWithStateInPandas state protocol needs the protobuf
runtime in the Python WORKER; this container ships none on PyPI paths,
but the system google-cloud-sdk vendors a pure-Python protobuf 4.23.2
under ``cloudsdk.google.protobuf`` (Apache-2.0). This package, when
placed on ``sys.path``/``PYTHONPATH`` AHEAD of a real ``google``
package, satisfies ``google.protobuf`` by aliasing ``google.*`` to the
SAME module objects as ``cloudsdk.google.*`` (one descriptor-pool
registry, no double registration) and stubs the protobuf-5.x
``runtime_version`` gate (PySpark's generated ``StateMessage_pb2``
imports it for a version validation that is a no-op for our use).

Activation (tests/conftest.py does this automatically when
``google.protobuf`` is absent and the SDK runtime exists):

    export PYTHONPATH=/root/repo/tools/pb_shim:$PYTHONPATH

PYTHONPATH (not just driver sys.path) matters: the state protocol runs
in the worker processes, which inherit PYTHONPATH at session start.

Do NOT add this directory on deployments that already ship protobuf —
path order would shadow the real package. On any standard Spark 4
cluster ``pip install protobuf`` makes this shim dead code.

Caveat: two names alias the same modules, which is exactly why the
loader returns identical module objects for both prefixes; the
alternative (``__path__`` extension) would import every file twice and
corrupt the descriptor pool.
"""

import importlib
import importlib.abc
import importlib.util
import os
import sys
import types

_SDK_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"
if not os.path.isdir(os.path.join(_SDK_THIRD_PARTY, "cloudsdk", "google", "protobuf")):
    raise ModuleNotFoundError(
        "pb_shim: no vendored protobuf at "
        f"{_SDK_THIRD_PARTY}/cloudsdk/google/protobuf — install the real "
        "protobuf package instead of using this shim"
    )
if _SDK_THIRD_PARTY not in sys.path:
    sys.path.insert(0, _SDK_THIRD_PARTY)


class _AliasLoader(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, fullname, path=None, target=None):
        # Intercept the vendored package's own name for the fake
        # runtime_version module too: `from google.protobuf import
        # runtime_version` resolves the submodule via the aliased
        # module's REAL __name__ (cloudsdk.google.protobuf).
        if fullname == "cloudsdk.google.protobuf.runtime_version":
            return importlib.util.spec_from_loader(fullname, self)
        # Claim ONLY google.protobuf.* — a blanket google.* claim would
        # misroute genuine google namespace packages (google.auth,
        # google.cloud, ...) to cloudsdk.* process-wide.
        if fullname != "google.protobuf" and not fullname.startswith(
            "google.protobuf."
        ):
            return None
        return importlib.util.spec_from_loader(fullname, self)

    def create_module(self, spec):
        if spec.name.endswith("protobuf.runtime_version"):
            m = types.ModuleType(spec.name)

            class Domain:
                GOOGLE_INTERNAL = 1
                PUBLIC = 2

            m.Domain = Domain
            m.ValidateProtobufRuntimeVersion = lambda *a, **k: None
            return m
        # same module object under both names — single registry
        return importlib.import_module("cloudsdk." + spec.name)

    def exec_module(self, module):
        pass


sys.meta_path.insert(0, _AliasLoader())
