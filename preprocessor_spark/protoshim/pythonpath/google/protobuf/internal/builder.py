"""Shim builder: both hooks funnel into _shim_impl.build_module (the first
call does all the work; the second is a no-op if classes already exist)."""

from google.protobuf._shim_impl import build_module


def BuildMessageAndEnumDescriptors(file_desc, module_globals) -> None:
    build_module(file_desc, module_globals)


def BuildTopDescriptorsAndMessages(file_desc, _module_name, module_globals) -> None:
    if not any(isinstance(v, type) for k, v in module_globals.items() if not k.startswith("_")):
        build_module(file_desc, module_globals)
