"""Shim runtime-version gate: generated code calls
ValidateProtobufRuntimeVersion(domain, major, minor, patch, suffix, name);
the shim accepts anything (it implements the stable wire format, which is
version-independent)."""


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:
    return None
