"""Shim symbol database: generated modules grab Default() but the Spark
client never queries it."""

_default = None


class SymbolDatabase:
    def RegisterMessage(self, *_a, **_k):
        return None


def Default() -> SymbolDatabase:
    global _default
    if _default is None:
        _default = SymbolDatabase()
    return _default
