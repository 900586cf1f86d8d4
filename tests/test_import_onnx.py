"""ONNX weight import: wire-format round-trip + layout conversion.

The reference's model family ships as ONNX (OpenCV Zoo
``object_tracking_vittrack_2023sep``, /root/reference/src/main.rs:25);
these tests pin that a torch-export-layout ONNX file of the same
architecture lands bit-exactly in our param tree, without any onnx
package installed.
"""

import numpy as np
import pytest

import jax

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.models import import_onnx, vittrack

CFG = ModelConfig(template_size=32, search_size=64, patch_size=16,
                  embed_dim=32, depth=2, num_heads=2, dtype="float32")


def _to_torch_layout(params):
    """Inverse of the importer's conversions: our tree -> torch-style
    ONNX tensors (linear/conv transposes, conv patch embed, (1,N,D) pos)."""
    t = {}
    bb = params["backbone"]
    k = np.asarray(bb["patch_embed"]["kernel"])          # (P*P*3, D)
    p = CFG.patch_size
    d = k.shape[1]
    t["backbone.patch_embed.proj.weight"] = np.ascontiguousarray(
        np.transpose(k.reshape(p, p, 3, d), (3, 2, 0, 1)))
    t["backbone.patch_embed.proj.bias"] = np.asarray(bb["patch_embed"]["bias"])
    t["backbone.pos_embed_z"] = np.asarray(bb["pos_embed_z"])[None]
    t["backbone.pos_embed_x"] = np.asarray(bb["pos_embed_x"])[None]
    t["backbone.norm.weight"] = np.asarray(bb["norm"]["scale"])
    t["backbone.norm.bias"] = np.asarray(bb["norm"]["bias"])
    for i, blk in enumerate(bb["blocks"]):
        pre = f"backbone.blocks.{i}."
        t[pre + "norm1.weight"] = np.asarray(blk["ln1"]["scale"])
        t[pre + "norm1.bias"] = np.asarray(blk["ln1"]["bias"])
        t[pre + "norm2.weight"] = np.asarray(blk["ln2"]["scale"])
        t[pre + "norm2.bias"] = np.asarray(blk["ln2"]["bias"])
        t[pre + "attn.qkv.weight"] = np.asarray(blk["qkv"]["kernel"]).T
        t[pre + "attn.qkv.bias"] = np.asarray(blk["qkv"]["bias"])
        t[pre + "attn.proj.weight"] = np.asarray(blk["proj"]["kernel"]).T
        t[pre + "attn.proj.bias"] = np.asarray(blk["proj"]["bias"])
        t[pre + "mlp.fc1.weight"] = np.asarray(blk["mlp1"]["kernel"]).T
        t[pre + "mlp.fc1.bias"] = np.asarray(blk["mlp1"]["bias"])
        t[pre + "mlp.fc2.weight"] = np.asarray(blk["mlp2"]["kernel"]).T
        t[pre + "mlp.fc2.bias"] = np.asarray(blk["mlp2"]["bias"])
    for tower in ("score", "offset", "size"):
        for j, layer in enumerate(params["head"][tower]):
            pre = f"box_head.{tower}.{j}."
            t[pre + "weight"] = np.ascontiguousarray(
                np.transpose(np.asarray(layer["kernel"]), (3, 2, 0, 1)))
            t[pre + "bias"] = np.asarray(layer["bias"])
    return t


def test_onnx_roundtrip_bit_exact(tmp_path):
    params = vittrack.init_params(jax.random.PRNGKey(7), CFG)
    tensors = _to_torch_layout(params)
    path = str(tmp_path / "vittrack.onnx")
    import_onnx.write_onnx_tensors(path, tensors)

    loaded = import_onnx.load_onnx(path, params)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_onnx_fp16_raw_data_casts(tmp_path):
    params = vittrack.init_params(jax.random.PRNGKey(7), CFG)
    tensors = {k: v.astype(np.float16) for k, v in
               _to_torch_layout(params).items()}
    path = str(tmp_path / "vittrack_fp16.onnx")
    import_onnx.write_onnx_tensors(path, tensors)
    loaded = import_onnx.load_onnx(path, params)
    # fp16 quantisation then cast back to model dtype: close, not exact.
    a = np.asarray(params["backbone"]["blocks"][0]["qkv"]["kernel"])
    b = np.asarray(loaded["backbone"]["blocks"][0]["qkv"]["kernel"])
    assert b.dtype == a.dtype
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_onnx_float_data_fallback(tmp_path):
    """Initializers stored as packed float_data (no raw_data) still parse."""
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    # Hand-assemble a TensorProto using float_data (field 4, packed).
    import struct

    from gstreamer_vit_tracker_tpu.models.import_onnx import (
        _emit_len, _emit_tag, _emit_varint)

    t = bytearray()
    for d in arr.shape:
        t += _emit_tag(1, 0) + _emit_varint(d)
    t += _emit_tag(2, 0) + _emit_varint(1)               # float32
    t += _emit_len(8, b"w")
    t += _emit_len(4, struct.pack(f"<{arr.size}f", *arr.flatten()))
    graph = _emit_len(5, bytes(t))
    model = _emit_len(7, graph)
    path = "/tmp/_float_data.onnx"
    with open(path, "wb") as f:
        f.write(model)
    tensors = import_onnx.read_onnx_tensors(path)
    np.testing.assert_array_equal(tensors["w"], arr)


def test_onnx_strict_reports_gaps(tmp_path):
    params = vittrack.init_params(jax.random.PRNGKey(7), CFG)
    tensors = _to_torch_layout(params)
    tensors.pop("backbone.norm.weight")
    tensors["mystery.tensor"] = np.zeros(3, np.float32)
    path = str(tmp_path / "gappy.onnx")
    import_onnx.write_onnx_tensors(path, tensors)
    with pytest.raises(ValueError, match="backbone/norm/scale"):
        import_onnx.load_onnx(path, params)
    # Non-strict fills what it can.
    loaded = import_onnx.load_onnx(path, params, strict=False)
    np.testing.assert_array_equal(
        np.asarray(loaded["backbone"]["blocks"][0]["qkv"]["bias"]),
        np.asarray(params["backbone"]["blocks"][0]["qkv"]["bias"]))


def test_onnx_negative_int64_data_parses():
    """int64_data varints are two's-complement; -1 must not overflow."""
    from gstreamer_vit_tracker_tpu.models.import_onnx import (
        _emit_len, _emit_tag, _emit_varint)

    vals = [-1, 3, -256]
    t = bytearray()
    t += _emit_tag(1, 0) + _emit_varint(3)               # dims [3]
    t += _emit_tag(2, 0) + _emit_varint(7)               # int64
    t += _emit_len(8, b"shape")
    packed = bytearray()
    for v in vals:
        packed += _emit_varint(v & ((1 << 64) - 1))      # two's complement
    t += _emit_len(7, bytes(packed))                     # int64_data packed
    model = _emit_len(7, _emit_len(5, bytes(t)))
    path = "/tmp/_neg_int64.onnx"
    with open(path, "wb") as f:
        f.write(model)
    tensors = import_onnx.read_onnx_tensors(path)
    np.testing.assert_array_equal(tensors["shape"],
                                  np.asarray(vals, np.int64))


def test_onnx_strict_raises_on_unmatched_only(tmp_path):
    """Extra checkpoint tensors must be loud even when nothing is missing."""
    params = vittrack.init_params(jax.random.PRNGKey(7), CFG)
    tensors = _to_torch_layout(params)
    tensors["num_batches_tracked"] = np.zeros(1, np.float32)
    path = str(tmp_path / "extra.onnx")
    import_onnx.write_onnx_tensors(path, tensors)
    with pytest.raises(ValueError, match="num_batches_tracked"):
        import_onnx.load_onnx(path, params)
    loaded = import_onnx.load_onnx(path, params, strict=False)
    np.testing.assert_array_equal(
        np.asarray(loaded["backbone"]["norm"]["scale"]),
        np.asarray(params["backbone"]["norm"]["scale"]))


def test_onnx_shape_mismatch_is_loud(tmp_path):
    params = vittrack.init_params(jax.random.PRNGKey(7), CFG)
    tensors = _to_torch_layout(params)
    tensors["backbone.pos_embed_z"] = np.zeros((1, 99, 32), np.float32)
    path = str(tmp_path / "bad.onnx")
    import_onnx.write_onnx_tensors(path, tensors)
    with pytest.raises(ValueError, match="pos_embed_z"):
        import_onnx.load_onnx(path, params)
