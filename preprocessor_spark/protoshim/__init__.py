"""Minimal pure-Python ``google.protobuf`` stand-in for Spark's
``transformWithStateInPandas`` worker protocol.

Spark 4's StatefulProcessor API talks to the JVM over protobuf
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``), whose generated code
needs the ``google.protobuf`` runtime — absent in this container, with no
network or wheel to install it from. The generated module only needs a
bounded runtime surface (descriptor-pool ``AddSerializedFile`` + the two
``builder`` hooks), and the client only uses kwargs construction,
``SerializeToString``/``ParseFromString``, plain field access and enum
constants. ``pythonpath/google/protobuf`` implements exactly that from the
PUBLIC protobuf wire-format and descriptor.proto specification
(protobuf.dev/programming-guides/encoding): varint/zigzag framing,
length-delimited fields, and a FileDescriptorProto parser driven by the
published field numbers. It is NOT a general protobuf implementation — a
real ``google.protobuf`` on the path always wins (install() is a no-op).

``install()`` makes the shim importable in this process (sys.path) and in
executor Python workers (PYTHONPATH, which ``session.get_spark`` exports
before the JVM starts).
"""

from __future__ import annotations

import os
import sys

SHIM_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pythonpath")


def install() -> bool:
    """Idempotently expose the shim; returns True if the shim (rather than
    a real protobuf install) will serve ``google.protobuf`` imports."""
    try:
        import google.protobuf  # noqa: F401  (real runtime present)

        return "protoshim" in os.path.dirname(google.protobuf.__file__)
    except ImportError:
        pass
    if SHIM_PATH not in sys.path:
        sys.path.insert(0, SHIM_PATH)
    existing = os.environ.get("PYTHONPATH", "")
    if SHIM_PATH not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{SHIM_PATH}{os.pathsep}{existing}" if existing else SHIM_PATH
        )
    return True
