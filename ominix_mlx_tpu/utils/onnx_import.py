"""Minimal ONNX weight importer (no onnx package needed).

The reference ships an ONNX-Runtime VITS decode backend that consumes
GPT-SoVITS's exported .onnx models (gpt-sovits-mlx/src/models/
vits_onnx.rs:1-140). The TPU-native equivalent is to IMPORT the exported
weights into the JAX VITS implementation (models/vits.py) and run them on
the TPU — so this module parses just enough of the ONNX protobuf wire
format to extract the graph's initializer tensors: ModelProto.graph(7) ->
GraphProto.initializer(5) -> TensorProto{name(8), dims(1), data_type(2),
raw_data(9) | float_data(4) | int64_data(7) | int32_data(5)}.

Pure-python protobuf wire decoding: the environment has no ``onnx``
package, and the subset needed (varints + length-delimited fields) is ~60
lines — far lighter than vendoring protobuf schemas.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Tuple

import numpy as np

# ONNX TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a serialized message.
    Length-delimited values come back as bytes; varints as int; 64/32-bit
    as raw bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val, pos = buf[pos:pos + 8], pos + 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val, pos = buf[pos:pos + ln], pos + ln
        elif wire == 5:
            val, pos = buf[pos:pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    name = ""
    dims = []
    dtype_code = 1
    raw = None
    float_data = []
    int_data = []
    for field, wire, val in _fields(buf):
        if field == 8 and wire == 2:
            name = val.decode("utf-8")
        elif field == 1:
            if wire == 0:
                dims.append(val)
            else:                            # packed dims
                p = 0
                while p < len(val):
                    d, p = _read_varint(val, p)
                    dims.append(d)
        elif field == 2 and wire == 0:
            dtype_code = val
        elif field == 9 and wire == 2:
            raw = val
        elif field == 4:                     # float_data
            if wire == 2:                    # packed
                float_data.extend(struct.unpack(f"<{len(val) // 4}f", val))
            else:
                float_data.append(struct.unpack("<f", val)[0])
        elif field in (5, 7):                # int32_data / int64_data
            # protobuf encodes negative ints as 10-byte varints equal to
            # 2^64 + v: convert back to signed before materializing
            def signed(d):
                return d - (1 << 64) if d >= (1 << 63) else d
            if wire == 2:
                p = 0
                while p < len(val):
                    d, p = _read_varint(val, p)
                    int_data.append(signed(d))
            else:
                int_data.append(signed(val))
    dtype = _DTYPES.get(dtype_code, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif float_data:
        arr = np.asarray(float_data, np.float32)
    elif int_data:
        arr = np.asarray(int_data, np.int64 if dtype_code == 7 else np.int32)
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims or (-1,)).astype(dtype, copy=False)


def load_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """Parse a .onnx file and return {initializer_name: ndarray}."""
    with open(path, "rb") as f:
        model = f.read()
    graph = None
    for field, wire, val in _fields(model):
        if field == 7 and wire == 2:          # ModelProto.graph
            graph = val
            break
    if graph is None:
        raise ValueError(f"{path}: no graph found (not an ONNX ModelProto?)")
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _fields(graph):
        if field == 5 and wire == 2:          # GraphProto.initializer
            name, arr = _parse_tensor(val)
            out[name] = arr
    return out


def load_vits_from_onnx(path: str, cfg) -> dict:
    """Import a GPT-SoVITS ONNX VITS export into models/vits.py params.

    The exported initializer names mirror the torch module paths (same
    naming as the safetensors export), so the existing torch-layout mapper
    applies after stripping ONNX prefixes.
    """
    from ominix_mlx_tpu.models import vits

    flat = {}
    for name, arr in load_onnx_initializers(path).items():
        for pre in ("onnx::", "model."):
            if name.startswith(pre):
                name = name[len(pre):]
        flat[name] = arr
    return vits.params_from_flat(flat, cfg)
