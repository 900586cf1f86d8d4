"""Score / offset / size prediction heads + hanning-penalty decode.

Mirrors the output contract of the OpenCV Zoo VitTrack model the reference
runs on the NPU (SURVEY.md §2.9): from the encoded search-region feature
map the model emits

* ``score``   (fs, fs)     — per-cell target-center confidence in [0, 1]
* ``offset``  (fs, fs, 2)  — sub-cell (dx, dy) of the centre, in [0, 1]
* ``size``    (fs, fs, 2)  — (w, h) normalised to the crop, in [0, 1]

and the tracker decodes ``argmax(score * hann)`` into a bbox plus a
confidence used by the session state machine's 0.25 threshold
(/root/reference/src/tracker_context.rs:93,122).

Two head implementations:

``conv``  — learned convolutional towers (the OSTrack center head shape),
            run as ``lax.conv`` on the (fs, fs, D) map (MXU-friendly);
``corr``  — a training-free correlation head: cosine similarity between
            each search token and the mean central template token.  It
            exists so the full tracking loop (crop geometry, decode, state
            carry, session machine) is exercisable and testable end-to-end
            without trained weights, and doubles as a SiamFC-style baseline.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .vit import _trunc_normal

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Conv head
# ---------------------------------------------------------------------------

def init_head_params(key: jax.Array, cfg: ModelConfig) -> Params:
    d = cfg.embed_dim
    chans = [d, d // 2, d // 4, d // 8]

    def tower(key, out_ch):
        ks = jax.random.split(key, len(chans))
        layers = []
        for i in range(len(chans) - 1):
            layers.append({
                "kernel": _trunc_normal(ks[i], (3, 3, chans[i], chans[i + 1]), std=0.05),
                "bias": jnp.zeros((chans[i + 1],)),
            })
        layers.append({
            "kernel": _trunc_normal(ks[-1], (1, 1, chans[-1], out_ch), std=0.05),
            "bias": jnp.zeros((out_ch,)),
        })
        return layers

    k1, k2, k3 = jax.random.split(key, 3)
    return {"score": tower(k1, 1), "offset": tower(k2, 2), "size": tower(k3, 2)}


def _run_tower(x: jnp.ndarray, layers) -> jnp.ndarray:
    """x: (B, fs, fs, C).  3x3 SAME convs with ReLU, final 1x1 linear.

    Operands share the compute dtype and the output dtype follows them
    (no ``preferred_element_type`` override: its transpose rule would mix
    a f32 cotangent with bf16 operands and fail under autodiff; TPU convs
    accumulate in f32 internally regardless)."""
    for i, layer in enumerate(layers):
        x = jax.lax.conv_general_dilated(
            x, layer["kernel"].astype(x.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + layer["bias"].astype(x.dtype)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def conv_head(params: Params, feat: jnp.ndarray, cfg: ModelConfig
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """feat: (B, Nx, D) encoded search tokens -> (score, offset, size) maps.

    score (B, fs, fs) in [0,1]; offset (B, fs, fs, 2) in [0,1];
    size (B, fs, fs, 2) in [0,1].
    """
    b = feat.shape[0]
    fs = cfg.feat_size
    fmap = feat.reshape(b, fs, fs, cfg.embed_dim)
    score = jax.nn.sigmoid(_run_tower(fmap, params["score"])[..., 0].astype(jnp.float32))
    offset = jax.nn.sigmoid(_run_tower(fmap, params["offset"]).astype(jnp.float32))
    size = jax.nn.sigmoid(_run_tower(fmap, params["size"]).astype(jnp.float32))
    return score, offset, size


# ---------------------------------------------------------------------------
# Grouped conv head (derived, serving-only)
# ---------------------------------------------------------------------------
# The three towers are 12 separate small convs; on TPU every extra kernel
# launch costs ~2 us of fixed overhead that dwarfs its FLOPs at these
# shapes (CLAUDE.md "small-op costs").  Since all towers read the SAME
# feature map, the whole head collapses to 4 convs with derived kernels:
# layer 0 concatenates the towers' kernels along output channels; layers
# 1-3 use block-diagonal kernels (each tower's weights on the diagonal,
# zeros off it), which wastes ~3x the FLOPs of the grouped ideal but
# those FLOPs are < 0.5 GFLOP total — launch count is what matters.


def group_head_params(head: Params) -> Params:
    """Derive the 4-conv grouped head from the tower params (host-side,
    once per checkpoint load — NOT inside the jitted step)."""
    towers = [head["score"], head["offset"], head["size"]]
    n_layers = len(towers[0])
    out: Params = {"layers": []}
    for j in range(n_layers):
        ks = [np.asarray(t[j]["kernel"]) for t in towers]
        bs = [np.asarray(t[j]["bias"]) for t in towers]
        if j == 0:
            kernel = np.concatenate(ks, axis=-1)
        else:
            kh, kw = ks[0].shape[:2]
            cin = sum(k.shape[2] for k in ks)
            cout = sum(k.shape[3] for k in ks)
            kernel = np.zeros((kh, kw, cin, cout), ks[0].dtype)
            ci = co = 0
            for k in ks:
                kernel[:, :, ci:ci + k.shape[2], co:co + k.shape[3]] = k
                ci += k.shape[2]
                co += k.shape[3]
        out["layers"].append({"kernel": jnp.asarray(kernel),
                              "bias": jnp.asarray(np.concatenate(bs))})
    # Final-layer output widths are the head contract (score 1, offset 2,
    # size 2) and are HARDCODED in conv_head_grouped — ints stored in the
    # params pytree would become tracers under jit and break slicing.
    splits = tuple(int(t[-1]["kernel"].shape[3]) for t in towers)
    assert splits == (1, 2, 2), splits
    return out


def conv_head_grouped(gparams: Params, feat: jnp.ndarray, cfg: ModelConfig
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Same maps as :func:`conv_head` (parity test-pinned) from the
    derived grouped kernels: 4 conv launches instead of 12."""
    b = feat.shape[0]
    fs = cfg.feat_size
    x = feat.reshape(b, fs, fs, cfg.embed_dim)
    layers = gparams["layers"]
    for i, layer in enumerate(layers):
        x = jax.lax.conv_general_dilated(
            x, layer["kernel"].astype(x.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + layer["bias"].astype(x.dtype)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    x = x.astype(jnp.float32)
    score = jax.nn.sigmoid(x[..., 0])           # splits fixed (1, 2, 2) —
    offset = jax.nn.sigmoid(x[..., 1:3])        # asserted at group time
    size = jax.nn.sigmoid(x[..., 3:5])
    return score, offset, size


# ---------------------------------------------------------------------------
# Correlation head (training-free)
# ---------------------------------------------------------------------------

def corr_head(z_tok, x_feat, cfg: ModelConfig
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training-free SiamFC-style correlation head.

    The *central* template token grid (the object occupies the centre half
    of the 2x-context template crop) is cross-correlated against the search
    token map as a conv kernel.  Because template and search crops share
    the same px-per-cell scale by construction (factor/size ratios match:
    template 2.0/128 == search 4.0/256), a displacement-aware correlation
    localises the object *centre* — unlike a per-token max, which peaks
    wherever any single template patch matches (e.g. on a border).

    Features are centred by the mean search token (removes the DC component
    that dominates cosine similarity on natural imagery) and L2-normalised
    per token; the correlation peak is then the mean aligned-cosine, ~1.0
    on a true match, giving a usable confidence without any training.

    Returns maps with the same contract as :func:`conv_head`; offsets carry
    sub-cell peak positions from parabolic interpolation (plus the
    half-cell anchor correction for even kernel sizes), and sizes are
    zeros — the decoder treats zero size as "carry the previous box size".
    """
    b = x_feat.shape[0]
    tz = cfg.template_feat_size
    fs = cfg.feat_size
    d = x_feat.shape[-1]
    q = tz // 4
    tc = tz - 2 * q

    zmap = z_tok.astype(jnp.float32).reshape(b, tz, tz, d)[:, q:tz - q, q:tz - q, :]
    xmap = x_feat.astype(jnp.float32).reshape(b, fs, fs, d)

    mu = xmap.mean(axis=(1, 2), keepdims=True)
    xc = xmap - mu
    zc = zmap - mu
    xc = xc / (jnp.linalg.norm(xc, axis=-1, keepdims=True) + 1e-6)
    zc = zc / (jnp.linalg.norm(zc, axis=-1, keepdims=True) + 1e-6)

    def corr_one(x, z):
        out = jax.lax.conv_general_dilated(
            x[None], z[..., None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out[0, ..., 0]

    score = jnp.clip(jax.vmap(corr_one)(xc, zc) / (tc * tc), 0.0, 1.0)

    # XLA 'SAME' padding for an even kernel pads one less on the low side,
    # so the correlation peak lands half a cell early — fold the correction
    # into the offset maps.
    anchor = 0.5 if tc % 2 == 0 else 0.0
    offset = _parabolic_offsets(score) + anchor
    size = jnp.zeros((b, fs, fs, 2), jnp.float32)
    return score, offset, size


def _parabolic_offsets(score: jnp.ndarray) -> jnp.ndarray:
    """Sub-cell peak offsets from a (B, fs, fs) score map.

    Classic 1-D parabolic (three-point) peak interpolation applied
    separably: ``d = 0.5 * (s+ - s-) / (2*s0 - s- - s+)``, clamped to
    ±0.5 cells; returns offsets in [0, 1] with 0.5 = cell centre.
    """
    pad = jnp.pad(score, ((0, 0), (1, 1), (1, 1)), mode="edge")
    s0 = score
    s_l = pad[:, 1:-1, :-2]
    s_r = pad[:, 1:-1, 2:]
    s_u = pad[:, :-2, 1:-1]
    s_d = pad[:, 2:, 1:-1]
    eps = 1e-6
    dx = 0.5 * (s_r - s_l) / jnp.maximum(2.0 * s0 - s_l - s_r, eps)
    dy = 0.5 * (s_d - s_u) / jnp.maximum(2.0 * s0 - s_u - s_d, eps)
    dx = jnp.clip(dx, -0.5, 0.5)
    dy = jnp.clip(dy, -0.5, 0.5)
    return jnp.stack([dx + 0.5, dy + 0.5], axis=-1)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def hanning_2d(fs: int, mode: str = "interior") -> jnp.ndarray:
    """Separable 2-D hann window, the motion-smoothness penalty applied to
    the score map before argmax (standard VitTrack/OSTrack decode).

    ``mode="interior"`` (default) is the endpoint-free variant
    ``0.5*(1-cos(2*pi*(i+1)/(N+1)))``: border cells keep a small nonzero
    weight, so a fast-moving target at the search-window edge can still be
    picked up.  MEASURED (spy graphs read back through getTrackingScore,
    compat/cv2vit.py) to be exactly the window OpenCV 5's TrackerVit
    multiplies into the confidence map — the measured peak is
    sin^4(9*pi/17), an 18-point hann cropped to its interior 16 cells —
    so the shipped default is the reference-exact decode (the reference's
    model family, /root/reference/src/main.rs:25).  Gate:
    tests/test_cv2_replica.py::test_interior_hann_is_cv2_trackervit_window.

    ``mode="opencv"`` reproduces ``cv2.createHanningWindow`` exactly —
    ``sqrt(hann_i * hann_j) = sin(pi*i/(N-1)) * sin(pi*j/(N-1))`` with ZERO
    rows/cols at the map borders (pinned bit-for-bit against cv2 in
    tests/test_decode_parity.py).  TrackerVit turns out NOT to use this
    function; the mode is kept for parity with trackers that do
    (KCF-lineage decoders), switchable via ModelConfig.hann_mode.
    """
    if mode == "opencv":
        w = jnp.sin(jnp.pi * jnp.arange(fs) / (fs - 1))
        # Exact border zeros (f32 sin(pi) is ~-9e-8): the defining OpenCV
        # semantic is that the argmax can NEVER pick a border cell.
        w = w.at[jnp.array([0, fs - 1])].set(0.0)
    else:
        w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * (jnp.arange(fs) + 1) / (fs + 1))
    return jnp.outer(w, w)


def decode_maps(score: jnp.ndarray, offset: jnp.ndarray, size: jnp.ndarray,
                hann: jnp.ndarray, prev_size_norm: jnp.ndarray,
                hann_weight: float = 1.0
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode head maps into (bbox_norm, confidence).

    All inputs unbatched: score (fs, fs), offset/size (fs, fs, 2),
    ``prev_size_norm`` (2,) — previous (w, h) in crop-normalised units,
    substituted where the size head predicts 0 (corr mode).

    Returns ``bbox_norm`` = (cx, cy, w, h) in [0,1] crop coordinates and the
    *penalised* max score (the confidence the session thresholds at 0.25).
    """
    fs = score.shape[-1]
    penalised = score * (1.0 - hann_weight + hann_weight * hann)
    flat = penalised.reshape(fs * fs)
    # The peak cell.  Scalar gathers (offset[iy, ix] etc.) each lower to
    # their own tiny TPU kernel; profiling put the whole decode+state tail
    # at 0.075 ms/step — 37% of the tracking step (scripts/profile_scan.py).
    # Instead: one-hot of the argmax (semantics identical to numpy argmax,
    # first index wins ties — pinned by tests/test_decode_parity.py) and a
    # single (fs^2, 6) matmul reads offset, size, AND the cell coordinates
    # in one fused op; the confidence is just the max, no gather at all.
    idx = jnp.argmax(flat)
    onehot = (jax.lax.iota(jnp.int32, fs * fs) == idx).astype(jnp.float32)
    grid = jnp.asarray(_decode_grid(fs))             # (fs*fs, 2) = (ix, iy)
    table = jnp.concatenate(
        [offset.reshape(fs * fs, 2).astype(jnp.float32),
         size.reshape(fs * fs, 2).astype(jnp.float32), grid], axis=1)
    off_sz_pos = onehot @ table                      # [ox, oy, sw, sh, ix, iy]
    cxy = (off_sz_pos[4:6] + off_sz_pos[0:2]) / fs
    sz = off_sz_pos[2:4]
    wh = jnp.where(sz > 0, sz, prev_size_norm)
    conf = jnp.max(flat)
    return jnp.concatenate([cxy, wh]), conf


@functools.lru_cache(maxsize=None)
def _decode_grid(fs: int) -> np.ndarray:
    """(fs*fs, 2) float32 table of (ix, iy) per flattened score-map cell.

    Cached as NUMPY (converted at use): memoising a jnp array created
    inside a trace leaks the tracer into later traces."""
    ii = np.arange(fs * fs)
    return np.stack([ii % fs, ii // fs], 1).astype(np.float32)
