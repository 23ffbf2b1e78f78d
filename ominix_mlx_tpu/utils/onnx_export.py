"""Minimal ONNX weight exporter (no onnx package needed).

The reference exports its trained VITS to ONNX for the ONNX-Runtime decode
backend (gpt-sovits-mlx/examples/export_vits_onnx.rs,
scripts/export_vits_onnx.py); this is the TPU-side counterpart: serialize a
flat {torch_name: ndarray} dict as a valid ONNX ModelProto whose graph
carries the tensors as initializers — the exact wire subset
utils/onnx_import.py parses (ModelProto.graph(7) -> GraphProto.initializer(5)
-> TensorProto{dims(1), data_type(2), name(8), raw_data(9)}), so
export -> import round-trips bit-exactly, and any ONNX toolchain can read
the weights. Pure-python protobuf wire encoding, mirroring the importer.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# numpy dtype -> ONNX TensorProto.DataType (inverse of onnx_import._DTYPES)
_CODES = {
    np.dtype(np.float32): 1, np.dtype(np.uint8): 2, np.dtype(np.int8): 3,
    np.dtype(np.uint16): 4, np.dtype(np.int16): 5, np.dtype(np.int32): 6,
    np.dtype(np.int64): 7, np.dtype(np.bool_): 9, np.dtype(np.float16): 10,
    np.dtype(np.float64): 11, np.dtype(np.uint32): 12,
    np.dtype(np.uint64): 13,
}


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field."""
    return _tag(field, 2) + _varint(len(payload)) + payload


def _vi(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    code = _CODES.get(arr.dtype)
    if code is None:                       # bf16 etc: widen to float32
        arr = arr.astype(np.float32)
        code = 1
    buf = bytearray()
    for d in arr.shape:
        buf += _vi(1, int(d))              # dims
    buf += _vi(2, code)                    # data_type
    buf += _ld(8, name.encode("utf-8"))    # name
    buf += _ld(9, arr.tobytes())           # raw_data
    return bytes(buf)


def save_onnx_initializers(named: Dict[str, np.ndarray], path: str,
                           graph_name: str = "weights") -> None:
    """Write {name: array} as an ONNX ModelProto with the tensors as graph
    initializers (ir_version 8, opset 17 — metadata only; the graph body is
    weights-only, matching what load_onnx_initializers consumes)."""
    graph = bytearray()
    graph += _ld(2, graph_name.encode("utf-8"))          # GraphProto.name
    for name, arr in named.items():
        graph += _ld(5, _tensor_proto(name, np.asarray(arr)))
    opset = _ld(1, b"") + _vi(2, 17)       # OperatorSetIdProto{domain,version}
    model = _vi(1, 8) + _ld(8, opset) + _ld(7, bytes(graph))
    with open(path, "wb") as f:
        f.write(model)


def export_vits_onnx(params: dict, cfg, path: str) -> int:
    """Export models/vits.py params to ONNX under the published GPT-SoVITS
    tensor names (reference: examples/export_vits_onnx.rs). Returns the
    number of tensors written; load_vits_from_onnx(path, cfg) inverts it."""
    from ominix_mlx_tpu.models.vits import flat_from_params

    flat = flat_from_params(params, cfg)
    save_onnx_initializers(flat, path, graph_name="vits")
    return len(flat)
