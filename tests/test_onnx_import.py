"""ONNX weight importer: parse a hand-encoded ONNX ModelProto (protobuf
wire format built in-test, no onnx package) and recover the initializer
tensors exactly."""

import struct

import numpy as np

from ominix_mlx_tpu.utils.onnx_import import load_onnx_initializers


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _ld(num: int, data: bytes) -> bytes:          # length-delimited
    return _field(num, 2, _varint(len(data)) + data)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    dtypes = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
              np.dtype(np.float16): 10}
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    msg += _field(2, 0, _varint(dtypes[arr.dtype]))
    msg += _ld(8, name.encode())
    msg += _ld(9, arr.tobytes())                  # raw_data
    return msg


def _tensor_float_data(name: str, arr: np.ndarray) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    msg += _field(2, 0, _varint(1))
    msg += _ld(8, name.encode())
    msg += _ld(4, struct.pack(f"<{arr.size}f", *arr.reshape(-1)))  # packed
    return msg


def _model(tensors) -> bytes:
    graph = b"".join(_ld(5, t) for t in tensors)
    graph += _ld(1, b"")                           # an empty node, ignored
    model = _field(1, 0, _varint(8))               # ir_version
    model += _ld(7, graph)
    return model


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 4, 5)).astype(np.float32)
    b = rng.normal(size=(7,)).astype(np.float16)
    idx = np.arange(6, dtype=np.int64).reshape(2, 3)
    fd = rng.normal(size=(2, 2)).astype(np.float32)
    blob = _model([_tensor("dec.conv_pre.weight", w),
                   _tensor("dec.conv_pre.bias", b),
                   _tensor("emb.indices", idx),
                   _tensor_float_data("flow.scale", fd)])
    p = tmp_path / "m.onnx"
    p.write_bytes(blob)
    out = load_onnx_initializers(str(p))
    assert set(out) == {"dec.conv_pre.weight", "dec.conv_pre.bias",
                        "emb.indices", "flow.scale"}
    np.testing.assert_array_equal(out["dec.conv_pre.weight"], w)
    np.testing.assert_array_equal(out["dec.conv_pre.bias"], b)
    np.testing.assert_array_equal(out["emb.indices"], idx)
    np.testing.assert_allclose(out["flow.scale"], fd, rtol=1e-6)


def test_not_onnx(tmp_path):
    p = tmp_path / "bad.onnx"
    p.write_bytes(_field(1, 0, _varint(8)))        # no graph
    try:
        load_onnx_initializers(str(p))
        assert False, "expected ValueError"
    except ValueError:
        pass
