"""Shim: generated modules only check _USE_C_DESCRIPTORS and poke
attributes on descriptor placeholders (handled in _shim_impl)."""

_USE_C_DESCRIPTORS = False
