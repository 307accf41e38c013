"""Shim descriptor pool: AddSerializedFile parses the embedded
FileDescriptorProto with the mini-parser in _shim_impl."""

from google.protobuf._shim_impl import FileDescriptorShim

_default = None


class DescriptorPool:
    def AddSerializedFile(self, serialized: bytes) -> FileDescriptorShim:
        return FileDescriptorShim(serialized)


def Default() -> DescriptorPool:
    global _default
    if _default is None:
        _default = DescriptorPool()
    return _default
