"""TFRecord + tf.train.Example reading without TensorFlow.

The reference pulls in TensorFlow 1.14 solely to read tfrecord datasets
(SURVEY.md section 2.4). This module implements the two formats natively:

  * TFRecord framing: [uint64 len][uint32 masked crc32c(len)][payload]
    [uint32 masked crc32c(payload)], optionally inside a whole-file GZIP
    stream (the DeepMind multi-object datasets use GZIP).
  * tf.train.Example protobuf wire format: Example{ Features{ map<string,
    Feature> } }, Feature = BytesList | FloatList | Int64List, parsed with
    a minimal protobuf wire reader (no protoc dependency).

A fixed-length feature spec mirrors tf.FixedLenFeature semantics:
bytes features of dtype string decode to uint8 arrays via
`decode_raw`-style reinterpretation.

The same API is implemented natively in C++ (genesis_tpu/native) and used
automatically when the shared library is built; this file is the portable
fallback and the reference semantics.
"""

import gzip
import io
import os
import struct
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli) + TFRecord masking
# ---------------------------------------------------------------------------

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            table.append(crc)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes, crc: int = 0) -> int:
    if crc == 0:
        lib = _native_lib()
        if lib is not None:  # slice-by-8 C++ path: ~100x the byte loop
            return int(lib.gt_crc32c(data, len(data)))
    table = _crc_table()
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Record-level IO
# ---------------------------------------------------------------------------

def detect_compression(path: str) -> Optional[str]:
    """"GZIP" if the file starts with the gzip magic, else None.

    Lets callers pass compression="auto": the DeepMind releases are
    GZIP, but uncompressed tfrecords decode ~2x faster on this
    single-core host (inflate is the residual per-record cost), so the
    loaders accept either transparently."""
    with open(path, "rb") as f:
        magic = f.read(2)
    return "GZIP" if magic == b"\x1f\x8b" else None


def _resolve(path: str, compression: Optional[str]) -> Optional[str]:
    return detect_compression(path) if compression == "auto" \
        else compression


def _open(path: str, compression: Optional[str]):
    if compression == "GZIP":
        return gzip.open(path, "rb")
    return open(path, "rb")


def _native_lib():
    try:
        from genesis_tpu import native
        return native.lib()
    except Exception:
        return None


def _iter_records_native(lib, path: str, compression: Optional[str],
                         verify_crc: bool, skip: int) -> Iterator[bytes]:
    import ctypes
    handle = lib.gt_open(path.encode(), 1 if compression == "GZIP" else 0,
                         1 if verify_crc else 0)
    if not handle:
        raise FileNotFoundError(path)
    try:
        if skip:
            skipped = lib.gt_skip(handle, skip)
            if skipped < skip:
                return
        capacity = 1 << 20
        buf = ctypes.create_string_buffer(capacity)
        while True:
            n = lib.gt_next(handle, buf, capacity)
            if n == -1:
                return
            if n <= -16:  # buffer too small; required = -(n + 16)
                capacity = int(-(n + 16)) * 2
                buf = ctypes.create_string_buffer(capacity)
                n = lib.gt_next(handle, buf, capacity)
            if n < 0:
                raise IOError(f"Corrupt tfrecord stream: {path}")
            # string_at copies exactly n bytes; buf.raw[:n] would
            # materialise the whole capacity buffer per record.
            yield ctypes.string_at(buf, n)
    finally:
        lib.gt_close(handle)


def iter_records(path: str, compression: Optional[str] = None,
                 verify_crc: bool = False,
                 skip: int = 0) -> Iterator[bytes]:
    """Yield raw record payloads (native C++ fast path when built).
    compression: None | "GZIP" | "auto" (magic-byte detection)."""
    compression = _resolve(path, compression)
    lib = _native_lib()
    if lib is not None:
        yield from _iter_records_native(lib, path, compression,
                                        verify_crc, skip)
        return
    with _open(path, compression) as f:
        idx = 0
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            if idx < skip:
                f.seek(length + 4, io.SEEK_CUR) if compression is None \
                    else f.read(length + 4)
                idx += 1
                continue
            if verify_crc:
                (len_crc,) = struct.unpack("<I", header[8:12])
                if masked_crc32c(header[:8]) != len_crc:
                    raise IOError(f"Corrupt record length crc at #{idx}")
            data = f.read(length)
            crc_bytes = f.read(4)
            if len(data) < length or len(crc_bytes) < 4:
                raise IOError(f"Truncated record at #{idx}")
            if verify_crc:
                (data_crc,) = struct.unpack("<I", crc_bytes)
                if masked_crc32c(data) != data_crc:
                    raise IOError(f"Corrupt record data crc at #{idx}")
            idx += 1
            yield data


def write_records(path: str, records: Sequence[bytes],
                  compression: Optional[str] = None) -> None:
    """Write a tfrecord file (used by tests, fixtures and converters)."""
    if compression == "GZIP":
        # level 6 = the TF writer default; level 9 costs ~2x CPU for a
        # few percent of size on image payloads.
        f = gzip.open(path, "wb", compresslevel=6)
    else:
        f = open(path, "wb")
    with f:
        for rec in records:
            header = struct.pack("<Q", len(rec))
            f.write(header)
            f.write(struct.pack("<I", masked_crc32c(header)))
            f.write(rec)
            f.write(struct.pack("<I", masked_crc32c(rec)))


def count_records(path: str, compression: Optional[str] = None) -> int:
    """Number of records in a tfrecord file (reference utils/misc.py:
    31-41 len_tfrecords, without a TF session)."""
    compression = _resolve(path, compression)
    lib = _native_lib()
    if lib is not None:
        handle = lib.gt_open(path.encode(),
                             1 if compression == "GZIP" else 0, 0)
        if not handle:
            raise FileNotFoundError(path)
        try:
            total = 0
            while True:
                skipped = lib.gt_skip(handle, 1 << 20)
                total += skipped
                if skipped < (1 << 20):
                    return total
        finally:
            lib.gt_close(handle)
    return sum(1 for _ in iter_records(path, compression))


def build_index(path: str) -> List[Tuple[int, int]]:
    """(offset, length) per record for an UNCOMPRESSED tfrecord file —
    enables random access for shuffled epoch loaders."""
    index = []
    with open(path, "rb") as f:
        while True:
            pos = f.tell()
            header = f.read(12)
            if len(header) < 12:
                break
            (length,) = struct.unpack("<Q", header[:8])
            index.append((pos + 12, length))
            f.seek(length + 4, io.SEEK_CUR)
    return index


def read_record_at(path_handle, offset: int, length: int) -> bytes:
    path_handle.seek(offset)
    return path_handle.read(length)


# ---------------------------------------------------------------------------
# Protobuf wire reader (minimal)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer.
    Value is int for varint/fixed, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field = tag >> 3
        wire = tag & 0x7
        if wire == 0:      # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:    # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:    # length-delimited
            length, pos = _read_varint(buf, pos)
            val = buf[pos:pos + length]
            pos += length
        elif wire == 5:    # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"Unsupported wire type {wire}")
        yield field, wire, val


def parse_example(record: bytes) -> Dict[str, Union[List[bytes],
                                                    np.ndarray]]:
    """Parse a serialised tf.train.Example into {name: value} where value
    is list-of-bytes (BytesList), float32 array (FloatList) or int64
    array (Int64List)."""
    out: Dict[str, Union[List[bytes], np.ndarray]] = {}
    features_buf = None
    for field, wire, val in _iter_fields(record):
        if field == 1 and wire == 2:  # Example.features
            features_buf = val
    if features_buf is None:
        return out
    for field, wire, entry in _iter_fields(features_buf):
        if field != 1 or wire != 2:   # Features.feature map entry
            continue
        key, feature_buf = None, None
        for f2, w2, v2 in _iter_fields(entry):
            if f2 == 1:
                key = v2.decode("utf-8")
            elif f2 == 2:
                feature_buf = v2
        if key is None or feature_buf is None:
            continue
        value = None
        for f3, w3, v3 in _iter_fields(feature_buf):
            if f3 == 1:       # BytesList
                blist = [v for f4, _, v in _iter_fields(v3) if f4 == 1]
                value = blist
            elif f3 == 2:     # FloatList
                floats = []
                for f4, w4, v4 in _iter_fields(v3):
                    if f4 != 1:
                        continue
                    if w4 == 2:  # packed
                        floats.append(np.frombuffer(v4, "<f4"))
                    else:        # unpacked fixed32
                        floats.append(np.frombuffer(v4, "<f4"))
                value = (np.concatenate(floats) if floats
                         else np.zeros(0, np.float32))
            elif f3 == 3:     # Int64List
                ints = []
                for f4, w4, v4 in _iter_fields(v3):
                    if f4 != 1:
                        continue
                    if w4 == 2:  # packed varints
                        pos = 0
                        while pos < len(v4):
                            x, pos = _read_varint(v4, pos)
                            ints.append(x)
                    else:
                        ints.append(v4)
                value = np.asarray(ints, np.int64)
        out[key] = value
    return out


# ---------------------------------------------------------------------------
# Fast per-feature extraction (native when available)
# ---------------------------------------------------------------------------

def extract_bytes(record: bytes, key: str,
                  size_hint: int = 0) -> Optional[np.ndarray]:
    """Concatenated BytesList payload as a uint8 array (decode_raw).

    `size_hint` (exact expected byte count, e.g. from a fixed feature
    spec) collapses the size-query + copy pair into ONE native scan —
    the per-record hot path for the dataset loaders."""
    lib = _native_lib()
    if lib is not None:
        import ctypes
        if size_hint > 0:
            out = np.empty(size_hint, np.uint8)
            n = lib.gt_extract(record, len(record), key.encode(), 1,
                               out.ctypes.data_as(ctypes.c_void_p),
                               size_hint)
            if n == size_hint:
                return out
            if n >= 0:
                return out[:n]
            if n == -1:
                return None
            # fall through: buffer was short (-2 - required)
        n = lib.gt_extract(record, len(record), key.encode(), 1, None, 0)
        if n < 0:
            return None
        out = np.empty(n, np.uint8)
        lib.gt_extract(record, len(record), key.encode(), 1,
                       out.ctypes.data_as(ctypes.c_void_p), n)
        return out
    parsed = parse_example(record)
    if key not in parsed or not isinstance(parsed[key], list):
        return None
    return np.frombuffer(b"".join(parsed[key]), np.uint8).copy()


def extract_floats(record: bytes, key: str) -> Optional[np.ndarray]:
    lib = _native_lib()
    if lib is not None:
        import ctypes
        n = lib.gt_extract(record, len(record), key.encode(), 2, None, 0)
        if n < 0:
            return None
        out = np.empty(n, np.float32)
        lib.gt_extract(record, len(record), key.encode(), 2,
                       out.ctypes.data_as(ctypes.c_void_p), n * 4)
        return out
    parsed = parse_example(record)
    val = parsed.get(key)
    return None if val is None else np.asarray(val, np.float32)


def bytes_values(record: bytes, key: str) -> Optional[list]:
    """Per-element BytesList values (e.g. GQN per-frame JPEG strings)."""
    lib = _native_lib()
    if lib is not None:
        import ctypes
        count = lib.gt_bytes_count(record, len(record), key.encode())
        if count < 0:
            return None
        out = []
        for i in range(count):
            size = lib.gt_bytes_at(record, len(record), key.encode(), i,
                                   None, 0)
            buf = ctypes.create_string_buffer(size)
            lib.gt_bytes_at(record, len(record), key.encode(), i, buf,
                            size)
            out.append(buf.raw[:size])
        return out
    parsed = parse_example(record)
    val = parsed.get(key)
    return val if isinstance(val, list) else None


# ---------------------------------------------------------------------------
# FixedLenFeature-style spec application
# ---------------------------------------------------------------------------

class FixedLenFeature:
    """shape + dtype descriptor; dtype 'string' means raw uint8 bytes that
    decode_raw to the given shape (the DeepMind readers' BYTE_FEATURES)."""

    def __init__(self, shape, dtype):
        self.shape = tuple(shape)
        self.dtype = dtype


def apply_spec(parsed: Dict, spec: Dict[str, FixedLenFeature],
               byte_features: Sequence[str] = ()) -> Dict[str, np.ndarray]:
    out = {}
    for name, feat in spec.items():
        if name not in parsed:
            raise KeyError(f"Feature {name!r} missing from record")
        raw = parsed[name]
        if feat.dtype == "string":
            data = b"".join(raw)
            if name in byte_features:
                arr = np.frombuffer(data, np.uint8)
                # decode_raw + squeeze(-1) of the trailing singleton
                shape = feat.shape
                if shape and shape[-1] == 1:
                    shape = shape[:-1]
                out[name] = arr.reshape(shape) if shape else arr
            else:
                out[name] = np.asarray(raw, dtype=object)
        elif feat.dtype == "float32":
            out[name] = np.asarray(raw, np.float32).reshape(feat.shape)
        elif feat.dtype == "int64":
            out[name] = np.asarray(raw, np.int64).reshape(feat.shape)
        else:
            raise ValueError(f"Unsupported dtype {feat.dtype}")
    return out


# ---------------------------------------------------------------------------
# Example writer (tests/fixtures)
# ---------------------------------------------------------------------------

def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def make_example(features: Dict[str, Union[bytes, Sequence[float],
                                           Sequence[int]]]) -> bytes:
    """Serialise {name: bytes | float list | int list} to a
    tf.train.Example wire message."""
    entries = b""
    for name, value in features.items():
        if isinstance(value, bytes):
            flist = _len_delim(1, _len_delim(1, value))
        elif isinstance(value, np.ndarray) and value.dtype.kind == "f" or (
                isinstance(value, (list, tuple)) and value and
                isinstance(value[0], float)):
            arr = np.asarray(value, "<f4")
            flist = _len_delim(2, _len_delim(1, arr.tobytes()))
        else:
            arr = [int(v) for v in np.asarray(value).ravel()]
            payload = b"".join(_varint(v) for v in arr)
            flist = _len_delim(3, _len_delim(1, payload))
        entry = _len_delim(1, name.encode()) + _len_delim(2, flist)
        entries += _len_delim(1, entry)
    return _len_delim(1, entries)
