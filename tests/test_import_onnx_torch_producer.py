"""Real-producer ONNX import: a file written by ``torch.onnx.export``.

tests/test_import_onnx.py round-trips our own writer and
tests/test_import_onnx_foreign.py uses an independent hand-rolled
protobuf emitter; this file closes the last gap with the ACTUAL producer
that made the reference's model artifact (OpenCV Zoo's
``object_tracking_vittrack_2023sep.onnx`` is a torch export,
/root/reference/src/main.rs:25): a live torch module with
torch-state-dict naming is exported through ``torch.onnx.export`` and
``models/import_onnx.py`` must recover every weight bit-exactly in
strict mode — real varint/field-order/raw_data choices included.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.models import import_onnx, vittrack

from test_import_onnx import CFG, _to_torch_layout


class _Block(torch.nn.Module):
    def __init__(self, d):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(d)
        self.attn = torch.nn.Module()
        self.attn.qkv = torch.nn.Linear(d, 3 * d)
        self.attn.proj = torch.nn.Linear(d, d)
        self.norm2 = torch.nn.LayerNorm(d)
        self.mlp = torch.nn.Module()
        self.mlp.fc1 = torch.nn.Linear(d, 4 * d)
        self.mlp.fc2 = torch.nn.Linear(4 * d, d)

    def forward(self, t):
        d = t.shape[-1]
        h = self.attn.qkv(self.norm1(t))
        t = t + self.attn.proj(h[..., :d])
        return t + self.mlp.fc2(
            torch.nn.functional.gelu(self.mlp.fc1(self.norm2(t))))


class _VitTrackTorch(torch.nn.Module):
    """Tiny VitTrack-shaped torch model whose state-dict names follow the
    torch-export dialect (the layout _to_torch_layout pins)."""

    def __init__(self, cfg):
        super().__init__()
        d, p = cfg.embed_dim, cfg.patch_size
        gz, gx = cfg.template_size // p, cfg.search_size // p
        bb = torch.nn.Module()
        bb.patch_embed = torch.nn.Module()
        bb.patch_embed.proj = torch.nn.Conv2d(3, d, p, stride=p)
        bb.pos_embed_z = torch.nn.Parameter(torch.zeros(1, gz * gz, d))
        bb.pos_embed_x = torch.nn.Parameter(torch.zeros(1, gx * gx, d))
        bb.blocks = torch.nn.ModuleList(
            [_Block(d) for _ in range(cfg.depth)])
        bb.norm = torch.nn.LayerNorm(d)
        self.backbone = bb
        head = torch.nn.Module()
        for tower in ("score", "offset", "size"):
            out_ch = {"score": 1, "offset": 2, "size": 2}[tower]
            setattr(head, tower, torch.nn.Sequential(
                torch.nn.Conv2d(d, d, 3, padding=1),
                torch.nn.Conv2d(d, out_ch, 1)))
        self.box_head = head
        self._gx = gx

    def forward(self, z, x):
        bb = self.backbone
        zt = bb.patch_embed.proj(z).flatten(2).transpose(1, 2)
        xt = bb.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([zt + bb.pos_embed_z, xt + bb.pos_embed_x], 1)
        for blk in bb.blocks:
            t = blk(t)
        t = bb.norm(t)
        f = t[:, zt.shape[1]:].transpose(1, 2).reshape(
            1, -1, self._gx, self._gx)
        return (self.box_head.score(f), self.box_head.offset(f),
                self.box_head.size(f))


def test_torch_onnx_export_imports_bit_exact(tmp_path, monkeypatch):
    # torch 2.13's exporter post-processes the (already fully serialized)
    # proto bytes through the `onnx` package purely to inline custom
    # onnxscript functions; this model has none and `onnx` isn't
    # installed here, so make that no-op explicit. The bytes under test
    # are produced end-to-end by torch's own C++ serializer.
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
    monkeypatch.setattr(onnx_proto_utils, "_add_onnxscript_fn",
                        lambda model_bytes, custom_opsets: model_bytes)
    cfg = CFG
    params = vittrack.init_params(jax.random.PRNGKey(11), cfg)
    # Fresh-init trees carry identical constant leaves (all-ones LN
    # scales, zero biases) which torch's exporter DEDUPLICATES into one
    # initializer; give every leaf distinct random values so each name
    # must survive on its own.
    _ctr = [0]

    def _rand(leaf):
        _ctr[0] += 1
        r = np.random.default_rng(_ctr[0])
        return r.normal(0, 0.1, np.shape(leaf)).astype(np.float32)

    params = jax.tree.map(_rand, params)
    # Rebuild head towers in the 2-conv shape the torch module declares
    # (d->d 3x3, then 1x1 to the map channel count).
    d = cfg.embed_dim
    rng = np.random.default_rng(5)
    for tower, out_ch in (("score", 1), ("offset", 2), ("size", 2)):
        params["head"][tower] = [
            {"kernel": rng.normal(0, 0.1, (3, 3, d, d)).astype(np.float32),
             "bias": rng.normal(0, 0.1, d).astype(np.float32)},
            {"kernel": rng.normal(0, 0.1, (1, 1, d, out_ch)
                                  ).astype(np.float32),
             "bias": rng.normal(0, 0.1, out_ch).astype(np.float32)},
        ]
    wanted = _to_torch_layout(params)

    model = _VitTrackTorch(cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in wanted.items()}
    model.load_state_dict(sd, strict=True)
    model.eval()

    path = str(tmp_path / "torch_export.onnx")
    z = torch.zeros(1, 3, cfg.template_size, cfg.template_size)
    x = torch.zeros(1, 3, cfg.search_size, cfg.search_size)
    torch.onnx.export(model, (z, x), path, opset_version=17,
                      do_constant_folding=False,
                      input_names=["template", "search"], dynamo=False)

    # 1. Every state-dict tensor survives the wire bit-exactly.
    got = import_onnx.read_onnx_tensors(path)
    for k, v in wanted.items():
        assert k in got, f"initializer {k} renamed or dropped by torch"
        np.testing.assert_array_equal(got[k], v, err_msg=k)

    # 2. Strict import lands bit-exactly on our tree.
    like = jax.tree.map(np.zeros_like, params)
    loaded = import_onnx.load_onnx(path, like=like, strict=True)
    flat_a = jax.tree.leaves(loaded)
    flat_b = jax.tree.leaves(params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
