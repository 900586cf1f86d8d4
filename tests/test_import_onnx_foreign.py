"""Foreign-producer ONNX fixture: the real VitTrack export's inventory.

tests/test_import_onnx.py round-trips the importer's own writer, which
cannot catch a symmetric reader/writer misreading or a name-dialect gap.
This file attacks both residual risks of migrating the actual OpenCV Zoo
``object_tracking_vittrack_2023sep.onnx`` (/root/reference/src/main.rs:25):

* the fixture bytes are produced by an INDEPENDENT protobuf emitter
  (implemented here, not models/import_onnx.py), using wire-format
  choices a torch export makes and ours doesn't: packed dims, name field
  first, float_data instead of raw_data for some tensors, opset_import /
  producer metadata, graph nodes and value_info present;
* the tensor inventory reconstructs the upstream OSTrack-style export:
  ``backbone.*`` scoping, and the CenterPredictor head dialect —
  ``box_head.convK_ctr/offset/size`` towers built as Sequential(conv, bn,
  relu) with biasless convs + BatchNorm params (folded on import) and a
  plain final conv;
* ``default_name_map`` must map 100% of it (strict mode passes), the BN
  folding must be numerically exact, and the loaded model must run.

A skipif-gated end-to-end cv2.TrackerVit comparison runs automatically
when a real model file is provided via GVT_VITTRACK_ONNX (zero egress
here, so none is bundled).
"""

import os
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.models import import_onnx, vittrack

FLAGSHIP = ModelConfig(dtype="float32")


# ---------------------------------------------------------------------------
# Independent protobuf emitter (deliberately NOT the module's writer)
# ---------------------------------------------------------------------------

def _vint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _vint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:        # length-delimited
    return _key(field, 2) + _vint(len(payload)) + payload


def _tensor_foreign(name: str, arr: np.ndarray, use_float_data: bool
                    ) -> bytes:
    """TensorProto in a foreign style: name FIRST, dims PACKED, then either
    packed float_data (field 4) or raw_data (field 9)."""
    t = bytearray()
    t += _ld(8, name.encode())                        # name before dims
    t += _ld(1, b"".join(_vint(d) for d in arr.shape))   # packed dims
    if arr.dtype == np.int64:
        t += _key(2, 0) + _vint(7)                    # data_type int64
        t += _ld(7, b"".join(_vint(int(v) & (2 ** 64 - 1))
                             for v in arr.ravel()))   # packed int64_data
    elif use_float_data:
        t += _key(2, 0) + _vint(1)                    # data_type float
        t += _ld(4, struct.pack(f"<{arr.size}f",
                                *np.asarray(arr, np.float32).ravel()))
    else:
        t += _key(2, 0) + _vint(1)
        t += _ld(9, np.ascontiguousarray(arr, np.float32).tobytes())
    return _ld(5, bytes(t))                           # graph.initializer


def _write_foreign_onnx(path: str, tensors: dict) -> None:
    graph = bytearray()
    # Graph nodes / IO metadata a real export carries (skipped by the
    # importer, but present on the wire).
    node = _ld(1, b"z") + _ld(1, b"x") + _ld(4, b"Conv_0") + _ld(5, b"Conv")
    graph += _ld(1, node)
    graph += _ld(2, b"torch_jit")                     # graph.name
    small_floats = 0
    for name, arr in tensors.items():
        use_float_data = arr.dtype != np.int64 and arr.size <= 1024 \
            and (small_floats := small_floats + 1) % 2 == 0
        graph += _tensor_foreign(name, arr, use_float_data)
    graph += _ld(11, _ld(1, b"z"))                    # graph.input
    graph += _ld(12, _ld(1, b"cls"))                  # graph.output
    model = bytearray()
    model += _key(1, 0) + _vint(8)                    # ir_version
    model += _ld(2, b"pytorch")                       # producer_name
    model += _ld(3, b"2.0.1")                         # producer_version
    model += _ld(8, _ld(1, b"") + _key(2, 0) + _vint(17))   # opset_import
    model += _ld(7, bytes(graph))
    with open(path, "wb") as f:
        f.write(bytes(model))


# ---------------------------------------------------------------------------
# Fixture inventory: upstream OSTrack-dialect names + BN head towers
# ---------------------------------------------------------------------------

def _ostrack_inventory(params, rng) -> dict:
    """torch-export tensors for ``params`` in the upstream dialect, with
    conv+BN head towers constructed so that exact BN folding reproduces
    our head weights."""
    t = {}
    bb = params["backbone"]
    p = FLAGSHIP.patch_size
    k = np.asarray(bb["patch_embed"]["kernel"])
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
    alias = {"score": "ctr", "offset": "offset", "size": "size"}
    for tower, sfx in alias.items():
        layers = params["head"][tower]
        for j, layer in enumerate(layers):
            w_ours = np.transpose(np.asarray(layer["kernel"]), (3, 2, 0, 1))
            b_ours = np.asarray(layer["bias"])
            if j == len(layers) - 1:               # final plain conv
                pre = f"box_head.conv{j + 1}_{sfx}."
                t[pre + "weight"] = np.ascontiguousarray(w_ours)
                t[pre + "bias"] = b_ours
                continue
            # conv_bn_relu block: biasless conv + BN whose folding must
            # land exactly on our (kernel, bias).
            o = w_ours.shape[0]
            gamma = rng.uniform(0.5, 1.5, o).astype(np.float32)
            var = rng.uniform(0.2, 2.0, o).astype(np.float32)
            mean = rng.normal(0, 0.5, o).astype(np.float32)
            eps = 1e-5
            scale = gamma / np.sqrt(var + eps)
            pre = f"box_head.conv{j + 1}_{sfx}."
            t[pre + "0.weight"] = np.ascontiguousarray(
                w_ours / scale.reshape(-1, 1, 1, 1)).astype(np.float32)
            t[pre + "1.weight"] = gamma
            t[pre + "1.bias"] = (b_ours + mean * scale).astype(np.float32)
            t[pre + "1.running_mean"] = mean
            t[pre + "1.running_var"] = var
            t[pre + "1.num_batches_tracked"] = np.asarray(8734, np.int64)
    return t


@pytest.fixture(scope="module")
def flagship_params():
    return vittrack.init_params(jax.random.PRNGKey(7), FLAGSHIP)


def test_foreign_fixture_maps_100_percent(tmp_path, flagship_params):
    """strict load of the reconstructed real-export inventory: zero
    unmatched tensors, zero unfilled parameters, BN folding exact."""
    rng = np.random.default_rng(0)
    inventory = _ostrack_inventory(flagship_params, rng)
    path = str(tmp_path / "vittrack_foreign.onnx")
    _write_foreign_onnx(path, inventory)

    loaded = import_onnx.load_onnx(path, flagship_params, strict=True)

    flat_ref = jax.tree_util.tree_leaves_with_path(flagship_params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for kp, ref in flat_ref:
        got = np.asarray(flat_new[kp])
        np.testing.assert_allclose(
            got, np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=jax.tree_util.keystr(kp))


def test_foreign_fixture_loaded_model_tracks(tmp_path, flagship_params):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "vittrack_foreign.onnx")
    _write_foreign_onnx(path, _ostrack_inventory(flagship_params, rng))
    loaded = import_onnx.load_onnx(path, flagship_params, strict=True)
    z = jnp.zeros((1, FLAGSHIP.template_size, FLAGSHIP.template_size, 3))
    x = jnp.zeros((1, FLAGSHIP.search_size, FLAGSHIP.search_size, 3))
    maps = vittrack.forward(loaded, vittrack.embed_template(
        loaded, z, FLAGSHIP), x, FLAGSHIP, use_pallas=False, fused=False)
    assert np.isfinite(np.asarray(maps.score)).all()


def test_dialect_aliases_map(flagship_params):
    """module.-wrapped and backbone-unprefixed names also resolve."""
    m = import_onnx.default_name_map(flagship_params)
    assert "module.backbone.patch_embed.proj.weight" in m
    assert "patch_embed.proj.weight" in m
    assert "blocks.0.attn.qkv.weight" in m
    assert "box_head.conv1_ctr.0.weight" in m
    assert "box_head.conv4_ctr.weight" in m
    assert "box_head.conv1_cls.0.weight" in m
    # Aliases land on the same destinations, so strict coverage still
    # counts unique paths.
    assert m["module.backbone.norm.weight"][0] == m["backbone.norm.weight"][0]


@pytest.mark.skipif(
    not os.environ.get("GVT_VITTRACK_ONNX"),
    reason="set GVT_VITTRACK_ONNX=/path/to/object_tracking_vittrack_2023sep"
           ".onnx to run the real-artifact comparison")
def test_real_vittrack_artifact_parity():
    """End-to-end comparison against cv2.TrackerVit on the real model file
    (the full IoU>=0.99 parity proof; needs the artifact + cv2)."""
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "TrackerVit_create"):
        pytest.skip("cv2 lacks TrackerVit")
    from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
    from gstreamer_vit_tracker_tpu.tracker import core

    path = os.environ["GVT_VITTRACK_ONNX"]
    params = import_onnx.load_onnx(
        path, vittrack.init_params(jax.random.PRNGKey(0), FLAGSHIP),
        strict=False)
    p = cv2.TrackerVit_Params()
    p.net = path
    ref = cv2.TrackerVit_create(p)
    src = SyntheticSource(640, 512, obj_size=64, seed=0)
    frame0 = src.frame_rgb(0)
    bbox0 = tuple(int(v) for v in src.bbox_at(0))
    ref.init(frame0[..., ::-1], bbox0)
    st = core.init(params, jnp.asarray(frame0), jnp.asarray(src.bbox_at(0)),
                   FLAGSHIP)
    ious = []
    for i in range(1, 61):
        frame = src.frame_rgb(i)
        ok, rb = ref.update(frame[..., ::-1])
        st, ours, _ = core.update(params, st, jnp.asarray(frame), FLAGSHIP)
        a, b = np.asarray(ours), np.asarray(rb, np.float32)
        ix = max(0.0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
        ious.append(ix * iy / (a[2] * a[3] + b[2] * b[3] - ix * iy))
    assert np.mean(ious) >= 0.99
