"""Core of the protobuf shim: wire codec + FileDescriptorProto parser +
dynamic message-class factory. Implements the subset of the PUBLIC
protobuf spec (protobuf.dev encoding guide; descriptor.proto field
numbers) that generated ``*_pb2`` modules and Spark's
transformWithStateInPandas client require. See
``preprocessor_spark.protoshim`` for scope and rationale."""

from __future__ import annotations

import struct as _struct

# ----------------------------------------------------------------- wire codec

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

# FieldDescriptorProto.Type values (descriptor.proto, public)
TYPE_DOUBLE = 1
TYPE_FLOAT = 2
TYPE_INT64 = 3
TYPE_UINT64 = 4
TYPE_INT32 = 5
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_UINT32 = 13
TYPE_ENUM = 14

_VARINT_TYPES = {TYPE_INT64, TYPE_UINT64, TYPE_INT32, TYPE_BOOL, TYPE_ENUM, TYPE_UINT32}
_LEN_TYPES = {TYPE_STRING, TYPE_BYTES, TYPE_MESSAGE}


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v += 1 << 64  # two's-complement 10-byte encoding for negative ints
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        byte = buf[pos]
        pos += 1
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return acc, pos
        shift += 7


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _skip_field(buf: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wt == _WT_I32:
        return pos + 4
    raise ValueError(f"unsupported wire type {wt}")


# --------------------------------------------- FileDescriptorProto mini-parser


def _parse_fields(buf: bytes):
    """Yield (field_number, wire_type, value) where value is the varint int
    or the length-delimited bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        num, wt = tag >> 3, tag & 7
        if wt == _WT_VARINT:
            v, pos = _read_varint(buf, pos)
            yield num, wt, v
        elif wt == _WT_LEN:
            ln, pos = _read_varint(buf, pos)
            yield num, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == _WT_I64:
            yield num, wt, buf[pos : pos + 8]
            pos += 8
        elif wt == _WT_I32:
            yield num, wt, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} in descriptor")


class FieldSpec:
    __slots__ = ("name", "number", "label", "type", "type_name", "oneof_index")

    def __init__(self):
        self.name = ""
        self.number = 0
        self.label = 1
        self.type = 0
        self.type_name = ""
        self.oneof_index = None

    @property
    def repeated(self) -> bool:
        return self.label == 3


class MessageSpec:
    def __init__(self, name: str):
        self.name = name
        self.full_name = name
        self.fields: list[FieldSpec] = []
        self.nested: list["MessageSpec"] = []
        self.enums: list["EnumSpec"] = []
        self.oneofs: list[str] = []


class EnumSpec:
    def __init__(self, name: str):
        self.name = name
        self.full_name = name
        self.values: list[tuple[str, int]] = []


def _parse_field_desc(buf: bytes) -> FieldSpec:
    f = FieldSpec()
    for num, wt, v in _parse_fields(buf):
        if num == 1:
            f.name = v.decode("utf-8")
        elif num == 3:
            f.number = v
        elif num == 4:
            f.label = v
        elif num == 5:
            f.type = v
        elif num == 6:
            f.type_name = v.decode("utf-8")
        elif num == 9:
            f.oneof_index = v
    return f


def _parse_enum_desc(buf: bytes) -> EnumSpec:
    e = EnumSpec("")
    for num, wt, v in _parse_fields(buf):
        if num == 1:
            e.name = v.decode("utf-8")
        elif num == 2:
            vname, vnum = "", 0
            for n2, _, v2 in _parse_fields(v):
                if n2 == 1:
                    vname = v2.decode("utf-8")
                elif n2 == 2:
                    vnum = v2
            e.values.append((vname, vnum))
    return e


def _parse_message_desc(buf: bytes) -> MessageSpec:
    m = MessageSpec("")
    for num, wt, v in _parse_fields(buf):
        if num == 1:
            m.name = v.decode("utf-8")
        elif num == 2:
            m.fields.append(_parse_field_desc(v))
        elif num == 3:
            m.nested.append(_parse_message_desc(v))
        elif num == 4:
            m.enums.append(_parse_enum_desc(v))
        elif num == 8:
            oname = ""
            for n2, _, v2 in _parse_fields(v):
                if n2 == 1:
                    oname = v2.decode("utf-8")
            m.oneofs.append(oname)
    return m


class FileDescriptorShim:
    """What ``descriptor_pool.Default().AddSerializedFile`` returns: the
    parsed message/enum graph plus the attribute sinks generated modules
    poke (``_loaded_options``, ``_options``...)."""

    def __init__(self, serialized: bytes):
        self.package = ""
        self.name = ""
        self.messages: list[MessageSpec] = []
        self.enums: list[EnumSpec] = []
        self._loaded_options = None
        for num, wt, v in _parse_fields(serialized):
            if num == 1:
                self.name = v.decode("utf-8")
            elif num == 2:
                self.package = v.decode("utf-8")
            elif num == 4:
                self.messages.append(_parse_message_desc(v))
            elif num == 5:
                self.enums.append(_parse_enum_desc(v))
        # qualify full names for type_name resolution
        prefix = f".{self.package}." if self.package else "."

        def qualify(m: MessageSpec, scope: str):
            m.full_name = scope + m.name
            for n in m.nested:
                qualify(n, m.full_name + ".")
            for e in m.enums:
                e.full_name = m.full_name + "." + e.name

        for m in self.messages:
            qualify(m, prefix)
        for e in self.enums:
            e.full_name = prefix + e.name


# ------------------------------------------------------------ message classes


class _DescriptorPlaceholder:
    """Accepts the ``_serialized_start``-style attribute pokes of generated
    modules; carries the spec for introspection."""

    def __init__(self, spec):
        self.spec = spec
        self._loaded_options = None
        self._serialized_start = 0
        self._serialized_end = 0
        self.name = getattr(spec, "name", "")
        self.full_name = getattr(spec, "full_name", "")


class Message:
    """Dynamic message: kwargs construction, field access with proto3
    defaults, SerializeToString/ParseFromString, HasField/WhichOneof."""

    _spec: MessageSpec = None  # set by subclass factory
    _by_name: dict = {}
    _by_number: dict = {}
    _resolver = None  # full type name -> Message subclass

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_set", set())
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, name):
        spec = type(self)._by_name.get(name)
        if spec is None:
            raise AttributeError(name)
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        if spec.repeated:
            values[name] = []
            return values[name]
        if spec.type == TYPE_MESSAGE:
            # cache the auto-vivified submessage so msg.sub.field = x
            # mutates THE stored instance (real-protobuf semantics), not a
            # throwaway default whose write is silently lost; presence
            # (_set) is only marked on explicit assignment, matching
            # HasField semantics for untouched defaults
            values[name] = type(self)._resolver(spec.type_name)()
            return values[name]
        return _scalar_default(spec.type)

    def __setattr__(self, name, value):
        spec = type(self)._by_name.get(name)
        if spec is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        self._values[name] = value
        self._set.add(name)

    # -- protobuf API ------------------------------------------------------
    def HasField(self, name: str) -> bool:
        return name in self._set

    def WhichOneof(self, oneof: str) -> str | None:
        for f in type(self)._spec.fields:
            if (
                f.oneof_index is not None
                and type(self)._spec.oneofs[f.oneof_index] == oneof
                and f.name in self._set
            ):
                return f.name
        return None

    def CopyFrom(self, other: "Message") -> None:
        self._values.clear()
        self._set.clear()
        self._values.update(other._values)
        self._set.update(other._set)

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for spec in type(self)._spec.fields:
            name = spec.name
            if spec.repeated:
                for item in self._values.get(name, ()):
                    _encode_one(out, spec, item)
            elif name in self._set:
                _encode_one(out, spec, self._values[name])
            elif spec.type == TYPE_MESSAGE and name in self._values:
                # auto-vivified submessage (msg.sub.field = x): present on
                # the wire iff something was actually written into it —
                # matches real-protobuf parent-chain presence semantics
                sub = self._values[name]
                if sub._set or sub._values:
                    _encode_one(out, spec, sub)
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        self._set.clear()
        by_number = type(self)._by_number
        pos = 0
        n = len(data)
        while pos < n:
            tag, pos = _read_varint(data, pos)
            num, wt = tag >> 3, tag & 7
            spec = by_number.get(num)
            if spec is None:
                pos = _skip_field(data, pos, wt)
                continue
            if wt == _WT_VARINT:
                raw, pos = _read_varint(data, pos)
                val = _decode_varint_value(spec.type, raw)
            elif wt == _WT_LEN:
                ln, pos = _read_varint(data, pos)
                payload = data[pos : pos + ln]
                pos += ln
                val = _decode_len_value(type(self)._resolver, spec, payload)
            elif wt == _WT_I64:
                val = _struct.unpack("<d", data[pos : pos + 8])[0]
                pos += 8
            elif wt == _WT_I32:
                val = _struct.unpack("<f", data[pos : pos + 4])[0]
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            if spec.repeated:
                self._values.setdefault(spec.name, []).append(val)
            else:
                self._values[spec.name] = val
            self._set.add(spec.name)
        return n

    def __repr__(self):
        inner = ", ".join(f"{k}={self._values[k]!r}" for k in sorted(self._set))
        return f"{type(self).__name__}({inner})"

    def __eq__(self, other):
        return type(self) is type(other) and self._values == other._values

    __hash__ = None


def _scalar_default(ftype: int):
    if ftype == TYPE_STRING:
        return ""
    if ftype == TYPE_BYTES:
        return b""
    if ftype == TYPE_BOOL:
        return False
    if ftype in (TYPE_DOUBLE, TYPE_FLOAT):
        return 0.0
    return 0


def _encode_one(out: bytearray, spec: FieldSpec, value) -> None:
    t = spec.type
    if t in _VARINT_TYPES:
        _write_varint(out, spec.number << 3 | _WT_VARINT)
        _write_varint(out, int(value))
    elif t == TYPE_STRING:
        b = value.encode("utf-8")
        _write_varint(out, spec.number << 3 | _WT_LEN)
        _write_varint(out, len(b))
        out.extend(b)
    elif t == TYPE_BYTES:
        b = bytes(value)
        _write_varint(out, spec.number << 3 | _WT_LEN)
        _write_varint(out, len(b))
        out.extend(b)
    elif t == TYPE_MESSAGE:
        b = value.SerializeToString()
        _write_varint(out, spec.number << 3 | _WT_LEN)
        _write_varint(out, len(b))
        out.extend(b)
    elif t == TYPE_DOUBLE:
        _write_varint(out, spec.number << 3 | _WT_I64)
        out.extend(_struct.pack("<d", float(value)))
    elif t == TYPE_FLOAT:
        _write_varint(out, spec.number << 3 | _WT_I32)
        out.extend(_struct.pack("<f", float(value)))
    else:
        raise NotImplementedError(f"protoshim: field type {t} unsupported")


def _decode_varint_value(ftype: int, raw: int):
    if ftype == TYPE_BOOL:
        return bool(raw)
    if ftype in (TYPE_INT32, TYPE_INT64):
        return _signed64(raw)
    return raw  # uint / enum


def _decode_len_value(resolver, spec: FieldSpec, payload: bytes):
    if spec.type == TYPE_STRING:
        return payload.decode("utf-8")
    if spec.type == TYPE_BYTES:
        return payload
    if spec.type == TYPE_MESSAGE:
        msg = resolver(spec.type_name)()
        msg.ParseFromString(payload)
        return msg
    raise NotImplementedError(f"protoshim: length-delimited type {spec.type}")


def build_module(file_desc: FileDescriptorShim, module_globals: dict) -> None:
    """The work of builder.BuildMessageAndEnumDescriptors +
    BuildTopDescriptorsAndMessages: inject message classes, enum constants
    and ``_UPPERNAME`` descriptor placeholders into the generated module's
    globals."""
    classes: dict[str, type] = {}

    def resolver(type_name: str) -> type:
        try:
            return classes[type_name]
        except KeyError:
            raise NotImplementedError(
                f"protoshim: unresolved message type {type_name!r}"
            ) from None

    def register(m: MessageSpec, placeholder_prefix: str):
        cls = type(
            m.name,
            (Message,),
            {
                "_spec": m,
                "_by_name": {f.name: f for f in m.fields},
                "_by_number": {f.number: f for f in m.fields},
                "_resolver": staticmethod(resolver),
                "DESCRIPTOR": _DescriptorPlaceholder(m),
            },
        )
        classes[m.full_name] = cls
        if not placeholder_prefix:  # top-level messages are module attrs
            module_globals[m.name] = cls
        module_globals["_" + placeholder_prefix + m.name.upper()] = cls.DESCRIPTOR
        for e in m.enums:
            _register_enum(e, placeholder_prefix + m.name.upper() + "_")
        for n in m.nested:
            register(n, placeholder_prefix + m.name.upper() + "_")

    def _register_enum(e: EnumSpec, placeholder_prefix: str):
        module_globals["_" + placeholder_prefix + e.name.upper()] = (
            _DescriptorPlaceholder(e)
        )
        module_globals[e.name] = _DescriptorPlaceholder(e)
        for vname, vnum in e.values:
            module_globals[vname] = vnum

    for m in file_desc.messages:
        register(m, "")
    for e in file_desc.enums:
        _register_enum(e, "")
