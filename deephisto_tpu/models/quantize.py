"""Post-training int8 quantization for the ResNet family — the TPU serving
mode.

The v5e MXU executes s8×s8→s32 at twice its bf16 rate. Measured end-to-end
(benchmarks/int8_quantized_speed.py, round 3): the exact fused dense predict
runs ResNet-18 at 28.4k patches/s vs 23.9k bf16 (+19%) and ResNet-50 at
13.0k vs 10.6k (+23%) on one v5e chip (b256, 8192² slide); through the
overlap-free fcn mode the same quantized model (pack_l1 + the s2d8 packed
stem) records **123.3k** equivalent patches/s on a 16384² slide
(benchmarks/README.md round-3 sessions 3-6). Accuracy on the trained demo
checkpoint (round-3 defaults): int8 top-1 == float top-1 on all 900 test
patches AND 100% argmax class-map agreement (0 flips in 4096 cells,
benchmarks/int8_accuracy_tpu.jsonl). The
reference has no quantized path (its backbone is torchvision fp32,
reference models/patch_cls_simple/model.py:1-11); this module adds one the
TPU-native way:

* **BatchNorm folding.** Inference BN is an affine per-channel map, so it
  folds exactly into the preceding conv: ``w' = w · γ/√(σ²+ε)``,
  ``b' = β − μ·γ/√(σ²+ε)``. The folded float network equals the original to
  float rounding (tested to 1e-4).
* **Per-output-channel symmetric int8 weights** (scale = max|w'|/127 per
  channel — the standard PTQ choice that keeps conv error small without
  zero-points, which the MXU int8 path doesn't need).
* **Per-tensor symmetric activation scales** from calibration: a float
  forward over calibration batches records each conv input's absmax.
* **Quantized inference**: u8 patch → ×(127/255) int8 input → per-layer
  [int8 conv → s32 → per-channel dequant (bf16 multiply) + bias → ReLU →
  requant to the next layer's scale]. Residual adds run in bf16 after
  dequant (cheap, exact); GAP + fc stay float. All elementwise steps fuse
  into the conv epilogue under XLA.

The quantized model is an ``.apply``-compatible adapter, so every fused
pipeline (predict_full_fused, predict_full_random_fused, streaming, spatial)
takes it unchanged. Accuracy: see tests/test_quantize.py (agreement vs the
float model) and benchmarks/int8_accuracy rows in benchmarks/README.md.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

EPS = 1e-5  # BatchNorm epsilon (resnet.py:94)


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------


def fold_conv_bn(kernel, bn_params, bn_stats):
    """Fold BN(scale, bias; mean, var) into a bias-free conv kernel (HWIO).

    Returns (w_folded f32, b_folded f32): ``BN(conv(x, w)) ==
    conv(x, w_folded) + b_folded`` exactly (inference mode)."""
    gamma = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    mult = gamma * jax.lax.rsqrt(var + EPS)  # (outch,)
    w = jnp.asarray(kernel, jnp.float32) * mult[None, None, None, :]
    b = beta - mean * mult
    return w, b


# ---------------------------------------------------------------------------
# Topology walk shared by calibration / folded-float / int8 execution
# ---------------------------------------------------------------------------


def _conv_layers(model):
    """The model's block structure in execution order (derived from
    resnet.py's module tree; block internals at resnet.py:24-72)."""
    from .resnet import BasicBlock

    basic = model.block_cls is BasicBlock or getattr(
        model.block_cls, "func", None
    ) is BasicBlock
    blocks = []
    for i, count in enumerate(model.stage_sizes):
        for j in range(count):
            blocks.append((f"layer{i + 1}_{j}", 2 if i > 0 and j == 0 else 1))
    return basic, blocks


def _stem(model, x, conv_apply):
    """Run the stem (resnet.py:99-112) with the given conv executor."""
    if model.stem == "s2d":
        b, h, w, c = x.shape
        x = x.reshape(b, h // 4, 4, w // 4, 4, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)
        x = conv_apply("conv1", x, stride=1, relu=True)
    else:
        x = conv_apply("conv1", x, stride=2, relu=True, padding=[(3, 3), (3, 3)])
        x = nn_max_pool(x)
    return x


def nn_max_pool(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype.type(-128),
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _blocks(model, x, conv_apply, add_relu):
    """Run the residual stages with the given conv executor."""
    basic, blocks = _conv_layers(model)
    for name, stride in blocks:
        residual = x
        if basic:
            y = conv_apply(f"{name}/conv1", x, stride=stride, relu=True)
            y = conv_apply(f"{name}/conv2", y, stride=1, relu=False)
        else:
            y = conv_apply(f"{name}/conv1", x, stride=1, relu=True)
            y = conv_apply(f"{name}/conv2", y, stride=stride, relu=True)
            y = conv_apply(f"{name}/conv3", y, stride=1, relu=False)
        if y.shape != residual.shape:
            residual = conv_apply(
                f"{name}/downsample_conv", x, stride=stride, relu=False
            )
        x = add_relu(residual, y)
    return x


def _folded_params(model, variables):
    """name → (w_folded, b_folded) for every conv in execution order, plus
    the fc head."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out = {}
    out["conv1"] = fold_conv_bn(
        params["conv1"]["kernel"], params["bn1"], stats["bn1"]
    )
    _, blocks = _conv_layers(model)
    for name, _stride in blocks:
        bp, bs = params[name], stats[name]
        for ci in ("conv1", "conv2", "conv3"):
            if ci in bp:
                out[f"{name}/{ci}"] = fold_conv_bn(
                    bp[ci]["kernel"], bp["bn" + ci[-1]], bs["bn" + ci[-1]]
                )
        if "downsample_conv" in bp:
            out[f"{name}/downsample_conv"] = fold_conv_bn(
                bp["downsample_conv"]["kernel"],
                bp["downsample_bn"],
                bs["downsample_bn"],
            )
    fc = params["fc"]
    out["fc"] = (jnp.asarray(fc["kernel"], jnp.float32),
                 jnp.asarray(fc["bias"], jnp.float32))
    return out


def _conv(x, w, stride, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ---------------------------------------------------------------------------
# Space-to-depth-packed stage 1 ("pack_l1") — the fcn-shape conv fix
# ---------------------------------------------------------------------------
#
# Measured on v5e (benchmarks/fcn_l1_sweep_tpu.jsonl): XLA's conv rate for the
# 64-channel stage-1 3x3 collapses at large spatial extents — 41.8 TFLOP/s at
# the fcn tile shape (8, 288, 288, 64) vs 108.9 at the patch shape
# (256, 56, 56, 64) — while a 2x2 conv on 2x-space-to-depth data (256
# channels) sustains 150 TFLOP/s at the same pixel count. A 3x3 stride-1 conv
# is EXACTLY expressible on 2x-packed data as a 2x2 conv whose dense
# (2, 2, 4ci, 4co) kernel embeds the 3x3 taps with structured zeros (9/16
# density → 1.78x the MACs at ~3.6x the rate ⇒ ~2x net). Packing uses two
# alternating alignments, so consecutive convs need NO repacking and residual
# adds stay packed:
#
#   pack_A: packed row i holds original rows {2i-1, 2i}  (spatial n/2 + 1)
#   pack_B: packed row i holds original rows {2i, 2i+1}  (spatial n/2)
#
# conv3x3(A→B) and conv3x3(B→A) are both 2x2 embedded convs; a stride-2
# 3x3 (the stage-2 entry) maps A→unpacked at the stride-2 grid, so the whole
# stage-1 + stage-2-entry chain runs packed with one pack transpose total.
# Channel layout: packed channel = (si*2 + sj)*c + c_orig, where (si, sj) is
# the pixel's position in its 2x2 block (matches _pack_a's reshape).
#
# For the int8 trunk the packed chain is BIT-EXACT vs the unpacked one
# (integer conv accumulation is order-independent; epilogues are elementwise
# and identical) — tests/test_quantize.py asserts exact equality. Boundary
# semantics: pack_A carries one out-of-range row/col (orig -1 and n); after
# each A-producing conv those lanes are re-zeroed (_fixup_a) so every tap
# reads exactly the zeros SAME padding would.


def _pack_a(x):
    """(b, h, w, c) → pack_A (b, h//2+1, w//2+1, 4c); h, w must be even.

    Four strided slices + a channel concat, NOT a 5-D reshape/transpose: the
    transpose assigns the packed tensor a tiled layout whose padded (2, 2, c)
    minor dims every downstream stage-1 conv then pays to read — measured on
    the 16384² fcn program (benchmarks/fcn_pack_variants_tpu.jsonl): the
    slice pack itself is ~2x slower (0.030 vs 0.011 s/slide) but the stage-1
    loop consuming it drops 0.074 s, a 0.044 s/slide net win. Same fix as
    predict/fcn.py s2d_pack_image. Channel order (si*2+sj)*c + ci."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [xp[:, si::2, sj::2, :] for si in (0, 1) for sj in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


def _edge_masks_a(hp, wp, c, dtype):
    """Broadcastable (hp, 1, 4c) x (1, wp, 4c) masks zeroing a pack_A
    tensor's out-of-range lanes (orig row/col -1 and n). Multiplying by both
    fuses into whatever elementwise epilogue produces the tensor — measured
    cost ~0 (a .at[] row update materializes a full-tensor copy instead)."""
    import numpy as np

    ch = np.arange(4 * c)
    si, sj = ch // (2 * c), (ch // c) % 2
    row = np.ones((hp, 1, 4 * c), np.float32)
    row[0, 0, si == 0] = 0.0
    row[-1, 0, si == 1] = 0.0
    col = np.ones((1, wp, 4 * c), np.float32)
    col[0, 0, sj == 0] = 0.0
    col[0, -1, sj == 1] = 0.0
    return jnp.asarray(row, dtype), jnp.asarray(col, dtype)


def _embed_kernel(k, kind):
    """Embed a 3x3 or 2x2 (ci, co) SAME-conv kernel into the packed 2x2
    dense kernel.

    kind: "a2b" (pack_A in → pack_B out), "b2a" (pack_B in, conv pad (1,1) →
    pack_A out), "a2x" (pack_A in → stride-2 unpacked out, the stage-2 entry
    3x3), "a2x_1x1" (pack_A in, cropped to n/2 → stride-2 unpacked 1x1, the
    downsample conv). Pure relocation + zero fill — exact in any dtype.

    The tap offset dy is relative to the output pixel and the valid window
    is XLA SAME's, which depends on STRIDE: pad_total = (out-1)·s + kh - n,
    lo = pad_total//2. Stride 1: kh=3 → lo=1, taps {-1,0,1}; kh=2 (the s2d
    stem conv) → lo=0, taps {0,1}. Stride 2 on EVEN n (a2x, the stage-2
    entry, guaranteed even by the pack_l1 extent check): pad_total=1 →
    lo=0, taps {0,1,2} — NOT the torch-style centered {-1,0,1}; getting
    this wrong is invisible to freshly-initialized parity tests (zero-init
    bn2/bn3 makes every block's conv path constant) but wrong on trained
    weights — tests/test_quantize.py randomizes BN scales for exactly this
    reason."""
    kh, kw, ci, co = k.shape
    if kind == "a2x":  # stride-2, even extent: SAME pads (0, 1)
        lo_y = lo_x = 0
    else:  # stride-1: SAME pads ((kh-1)//2, kh//2)
        lo_y, lo_x = (kh - 1) // 2, (kw - 1) // 2
    pack_out = kind in ("a2b", "b2a")
    if kind == "a2x_1x1":
        K = jnp.zeros((1, 1, 4 * ci, co), k.dtype)
        # orig (2i, 2j) is sub-position (1, 1) of pack_A cell (i, j)
        return K.at[0, 0, 3 * ci : 4 * ci, :].set(k[0, 0])
    K = jnp.zeros((2, 2, 4 * ci, (4 if pack_out else 1) * co), k.dtype)
    for kr in range(2):
        for kc in range(2):
            for si in range(2):
                for sj in range(2):
                    for di in range(2 if pack_out else 1):
                        for dj in range(2 if pack_out else 1):
                            if kind == "a2b":
                                dy = 2 * kr + si - 1 - di
                                dx = 2 * kc + sj - 1 - dj
                            elif kind == "b2a":
                                dy = 2 * (kr - 1) + si + 1 - di
                                dx = 2 * (kc - 1) + sj + 1 - dj
                            else:  # a2x: out orig row 2i, no sub-position
                                dy = 2 * kr + si - 1
                                dx = 2 * kc + sj - 1
                            if 0 <= dy + lo_y < kh and 0 <= dx + lo_x < kw:
                                K = K.at[
                                    kr, kc,
                                    (si * 2 + sj) * ci : (si * 2 + sj + 1) * ci,
                                    (di * 2 + dj) * co : (di * 2 + dj + 1) * co,
                                ].set(k[dy + lo_y, dx + lo_x])
    return K


_PACK_PAD = {"a2b": [(0, 0), (0, 0)], "b2a": [(1, 1), (1, 1)],
             "a2x": [(0, 0), (0, 0)], "a2x_1x1": [(0, 0), (0, 0)]}


def folded_float_apply(model, variables, x):
    """Float forward on the BN-folded weights (the numerical reference the
    int8 path approximates; also the BN-folding exactness oracle)."""
    folded = _folded_params(model, variables)

    def conv_apply(name, x, stride, relu, padding="SAME"):
        w, b = folded[name]
        y = _conv(x.astype(jnp.float32), w, stride, padding) + b
        return jax.nn.relu(y) if relu else y

    x = jnp.asarray(x, jnp.float32)
    x = _stem(model, x, conv_apply)
    x = _blocks(model, x, conv_apply, lambda r, y: jax.nn.relu(r + y))
    f = jnp.mean(x, axis=(1, 2))
    wfc, bfc = folded["fc"]
    return f @ wfc + bfc


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def calibrate(model, variables, batches):
    """Per-conv-input absmax over calibration batches.

    ``batches``: iterable of (B, H, W, 3) arrays in [0, 1] (the pipelines'
    /255 convention). Returns {layer_name: float absmax}."""
    folded = _folded_params(model, variables)

    @jax.jit
    def one_batch(x):
        stats = {}

        def conv_apply(name, x, stride, relu, padding="SAME"):
            stats[name] = jnp.max(jnp.abs(x))
            w, b = folded[name]
            y = _conv(x.astype(jnp.float32), w, stride, padding) + b
            return jax.nn.relu(y) if relu else y

        x = jnp.asarray(x, jnp.float32)
        x = _stem(model, x, conv_apply)
        _blocks(model, x, conv_apply, lambda r, y: jax.nn.relu(r + y))
        return stats

    absmax: dict[str, float] = {}
    for b in batches:
        s = one_batch(jnp.asarray(b))
        for k, v in s.items():
            absmax[k] = max(absmax.get(k, 0.0), float(v))
    return absmax


# ---------------------------------------------------------------------------
# int8 model
# ---------------------------------------------------------------------------


def supports_pack_l1(model) -> bool:
    """Whether ``pack_l1`` applies: a BasicBlock ResNet with >=2 stages (the
    packed stage-1 chain exits through the stage-2 entry convs). Bottleneck
    (r50/r101) is measured-negative territory: the SAME-aligned a2a 3x3
    costs 4x MACs for ~0.64x the unpacked rate and the one-3x3-per-block
    topology forces per-block residual relayouts
    (benchmarks/fcn_r50_l1_primitives_tpu.jsonl)."""
    from .resnet import BasicBlock

    bc = getattr(model, "block_cls", None)
    basic = bc is BasicBlock or getattr(bc, "func", None) is BasicBlock
    return basic and len(getattr(model, "stage_sizes", ())) >= 2


class QuantizedResNet:
    """``.apply``-compatible int8 ResNet; construct via :func:`quantize_resnet`.

    ``variables`` must be the ``qvariables`` returned alongside it (a plain
    {"params": pytree} — int8 kernels + f32 scales/biases), so the fused
    pipelines can pass it through jit like any other model's variables.

    Residual-stream precision is selectable (round-3 measurement,
    benchmarks/int8_accuracy_tpu.jsonl):

    * ``int8_residual=False`` (default, accuracy-first): block outputs are
      carried bf16 and re-quantized at each block input — 97.6% class-map
      agreement with float and EXACT test-set top-1 parity. Same exact-path
      speed as the full-int8 trunk (28.4k patches/s — the epilogues dominate,
      not the residual carry).
    * ``int8_residual=True`` (trunk stays int8 end to end, the shift-requant
      ceiling probe's structure): the residual is the DEQUANT of the carried
      int8 — one extra quantization per block. Still exact test-set top-1
      parity, but map agreement drops to 91.8%, with flips concentrated in
      low-margin cells (median flipped-cell margin 2.07 vs 8.42 overall;
      100% agreement above the median margin).

    Every dequant·(+residual)·relu·requant collapses into one f32 epilogue
    on the s32 conv accumulator, fused by XLA into the conv.

    ``wants_uint8``: the fused pipelines hand this model the RAW uint8
    patches — /255 and input quantization collapse into the single
    ``round(u8 · inv/255)`` epilogue, and the space-to-depth transpose runs
    on 1-byte lanes instead of bf16 (half the stem bandwidth)."""

    wants_uint8 = True

    def __init__(self, model, int8_residual: bool = False, pack_l1: bool = False):
        self._model = model  # topology source (stem/stage_sizes/block_cls)
        self.int8_residual = int8_residual
        self.pack_l1 = pack_l1
        if pack_l1 and not supports_pack_l1(model):
            raise ValueError(
                "pack_l1 requires a BasicBlock ResNet with >=2 stages "
                "(the packed chain exits through the stage-2 entry convs)"
            )

    # hashability: fcn's program cache keys on the model object
    def __hash__(self):
        return hash(
            (type(self).__name__, self._model, self.int8_residual, self.pack_l1)
        )

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other._model == self._model
            and other.int8_residual == self.int8_residual
            and other.pack_l1 == self.pack_l1
        )

    @property
    def stem(self):
        return self._model.stem

    def apply(
        self,
        variables,
        x,
        train: bool = False,
        features: bool = False,
        pre_packed: bool | str = False,
        up_to: str | None = None,
    ):
        """``pre_packed``: False (raw pixels), True (4x4 s2d-packed input,
        the stem reshape pre-applied), or "s2d8" (8x8-packed input — the 2x2
        pack_B grouping of the 4x4 representation; pack_l1 only). Under
        "s2d8" the stem conv runs as an embedded b2a conv (the same math as
        the stage-1 pconvs, _embed_kernel generalizes to 48→64) and PRODUCES
        pack_A directly — no ``_pack_a`` relayout of a conv output at all,
        which is worth ~0.07 s/slide on the 16384² fcn program
        (benchmarks/fcn_pack_variants_tpu.jsonl). Bit-exact vs the other
        modes (integer conv relocation + identical elementwise epilogues).

        ``up_to`` cuts the pipeline after a named boundary and returns the
        live tensor there (dtype as executed) — a measurement hook for stage
        isolation (benchmarks/fcn_int8_stages.py), not a serving surface.
        Boundaries: "quant" (input int8), "stem" (post conv1), "l1" (end of
        the packed/plain stage 1), "l2_entry" (pack_l1 stage-2 entry block),
        "layer2"/"layer3"/"layer4" (end of that residual stage)."""
        assert not train, "QuantizedResNet is inference-only"
        if pre_packed and self._model.stem != "s2d":
            raise ValueError("pre_packed input requires the s2d stem")
        packed8 = pre_packed == "s2d8"
        if packed8 and not self.pack_l1:
            raise ValueError("pre_packed='s2d8' requires pack_l1=True")
        q = variables["params"]
        model = self._model
        basic, blocks = _conv_layers(model)

        def conv_s32(name, x8, stride, padding="SAME"):
            return jax.lax.conv_general_dilated(
                x8, q[name]["kernel_q"], (stride, stride), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )

        def conv_f32(name, x8, stride, padding="SAME"):
            # s32 conv + f32 dequant/bias epilogue (per-channel)
            layer = q[name]
            y = conv_s32(name, x8, stride, padding).astype(jnp.float32)
            return y * layer["dequant"] + layer["bias"]

        def conv_to_int8(name, next_name, x8, stride, padding="SAME"):
            # fused edge: dequant·relu·requant to next_name's input scale as
            # a single f32 epilogue — one rounding, no bf16 intermediate.
            # relu commutes with the positive requant scale.
            layer = q[name]
            inv = q[next_name]["in_inv_scale"]
            y = conv_s32(name, x8, stride, padding).astype(jnp.float32)
            y = y * (layer["dequant"] * inv) + layer["bias"] * inv
            return jnp.clip(jnp.round(jax.nn.relu(y)), -127, 127).astype(jnp.int8)

        # ---- input quantization (u8 fast path: /255 folds into the scale) --
        first = "conv1"
        inv0 = q[first]["in_inv_scale"]
        if x.dtype == jnp.int8:
            # pre-quantized at conv1's input scale (prequantize_input): the
            # elementwise quantize commutes with patch gathering, so slide-
            # level pre-quantization is bit-exact (it is not faster — see
            # prequantize_input's docstring / int8_epilogue_gap.py).
            x8 = x
        elif x.dtype == jnp.uint8:
            x8 = jnp.clip(
                jnp.round(x.astype(jnp.float32) * (inv0 / 255.0)), -127, 127
            ).astype(jnp.int8)
        else:
            x8 = jnp.clip(
                jnp.round(x.astype(jnp.float32) * inv0), -127, 127
            ).astype(jnp.int8)

        def quant_to(name, xf):
            inv = q[name]["in_inv_scale"]
            return jnp.clip(
                jnp.round(xf.astype(jnp.float32) * inv), -127, 127
            ).astype(jnp.int8)

        if up_to == "quant":
            return x8

        # ---- stem (resnet.py:99-112), int8 convs ---------------------------
        first_block_in = f"{blocks[0][0]}/conv1"
        x_bf = None
        if model.stem == "s2d":
            if not pre_packed:
                b, h, w, c = x8.shape
                x8 = x8.reshape(b, h // 4, 4, w // 4, 4, c)
                x8 = x8.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h // 4, w // 4, 16 * c
                )
            stem_stride, stem_pad = 1, "SAME"
        else:
            stem_stride, stem_pad = 2, [(3, 3), (3, 3)]
        if packed8:
            pass  # stem runs packed, inside the pack_l1 section below
        elif self.int8_residual:
            x8 = conv_to_int8("conv1", first_block_in, x8, stem_stride, stem_pad)
            if model.stem != "s2d":
                x8 = nn_max_pool(x8)  # monotone: commutes with the requant
        else:
            x_bf = jax.nn.relu(conv_f32("conv1", x8, stem_stride, stem_pad))
            if model.stem != "s2d":
                x_bf = nn_max_pool(x_bf)
            x_bf = x_bf.astype(jnp.bfloat16)
            x8 = quant_to(first_block_in, x_bf)
        if up_to == "stem":
            return x8 if x_bf is None else x_bf

        # ---- packed stage 1 + stage-2 entry (pack_l1 mode) ------------------
        start = 0
        if self.pack_l1:
            n1 = model.stage_sizes[0]
            c1 = q["layer1_0/conv1"]["kernel_q"].shape[-1]
            if not packed8 and (x8.shape[1] % 2 or x8.shape[2] % 2):
                raise ValueError(
                    f"pack_l1 needs an even stage-1 spatial extent, got "
                    f"{x8.shape[1:3]} (input height/width must be multiples "
                    "of 8)"
                )

            def pconv_s32(name, xp, kind):
                K = _embed_kernel(q[name]["kernel_q"], kind)
                return jax.lax.conv_general_dilated(
                    xp, K, (1, 1), _PACK_PAD[kind],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )

            def ptile(v, kind):
                return jnp.tile(v, 4) if kind in ("a2b", "b2a") else v

            def pconv_f32(name, xp, kind):
                layer = q[name]
                y = pconv_s32(name, xp, kind).astype(jnp.float32)
                return y * ptile(layer["dequant"], kind) + ptile(
                    layer["bias"], kind
                )

            def pconv_to_int8(name, next_name, xp, kind):
                layer = q[name]
                inv = q[next_name]["in_inv_scale"]
                y = pconv_s32(name, xp, kind).astype(jnp.float32)
                y = y * (ptile(layer["dequant"], kind) * inv) + ptile(
                    layer["bias"], kind
                ) * inv
                return jnp.clip(
                    jnp.round(jax.nn.relu(y)), -127, 127
                ).astype(jnp.int8)

            if packed8:
                # stem as an embedded b2a conv: the 8x8-packed input IS
                # pack_B of the stem grid, so conv1 produces pack_A with no
                # relayout of a conv output (apply() docstring). The edge
                # masks zero pack_A's out-of-range lanes exactly where the
                # unpacked stem's SAME padding would have written zeros.
                row_m, col_m = _edge_masks_a(
                    x8.shape[1] + 1, x8.shape[2] + 1, c1, jnp.float32
                )
                layer = q["conv1"]
                y = pconv_s32("conv1", x8, "b2a").astype(jnp.float32)
                if self.int8_residual:
                    inv1 = q[first_block_in]["in_inv_scale"]
                    y = y * (ptile(layer["dequant"], "b2a") * inv1) + ptile(
                        layer["bias"], "b2a"
                    ) * inv1
                    y = jax.nn.relu(y) * row_m * col_m
                    x8p = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
                    x_bfp = None
                else:
                    y = y * ptile(layer["dequant"], "b2a") + ptile(
                        layer["bias"], "b2a"
                    )
                    y = jax.nn.relu(y) * row_m * col_m
                    x_bfp = y.astype(jnp.bfloat16)
                    x8p = quant_to(first_block_in, x_bfp)
            elif self.int8_residual:
                x8p, x_bfp = _pack_a(x8), None
            else:
                # pack ONCE (bf16); the packed int8 is the same elementwise
                # quantization applied after the transpose (zeros stay zero)
                x_bfp = _pack_a(x_bf)
                x8p = quant_to(first_block_in, x_bfp)
            if up_to in (("stem", "pack") if packed8 else ("pack",)):
                return x8p
            if not packed8:
                row_m, col_m = _edge_masks_a(
                    x8p.shape[1], x8p.shape[2], c1, jnp.float32
                )
            for j in range(n1):
                name = f"layer1_{j}"
                h8 = pconv_to_int8(f"{name}/conv1", f"{name}/conv2", x8p, "a2b")
                y_f = pconv_f32(f"{name}/conv2", h8, "b2a")
                if self.int8_residual:
                    s_in = 1.0 / q[f"{name}/conv1"]["in_inv_scale"]
                    res_f = x8p.astype(jnp.float32) * s_in
                else:
                    res_f = x_bfp.astype(jnp.float32)
                # edge re-zeroing rides the relu epilogue (broadcast masks)
                out_p = jax.nn.relu(y_f + res_f) * row_m * col_m
                nxt = (f"layer1_{j + 1}" if j + 1 < n1 else blocks[n1][0]) + "/conv1"
                if self.int8_residual:
                    x8p = quant_to(nxt, out_p)
                else:
                    x_bfp = out_p.astype(jnp.bfloat16)
                    x8p = quant_to(nxt, x_bfp)

            if up_to == "l1":
                return x8p if x_bfp is None else x_bfp

            # stage-2 entry: conv1/downsample consume the packed tensor and
            # exit to the unpacked stride-2 grid; conv2 onward is standard
            name2, _s2 = blocks[n1]
            h8 = pconv_to_int8(f"{name2}/conv1", f"{name2}/conv2", x8p, "a2x")
            y_f = conv_f32(f"{name2}/conv2", h8, stride=1)
            res_f = pconv_f32(
                f"{name2}/downsample_conv", x8p[:, :-1, :-1], "a2x_1x1"
            )
            out_f = jax.nn.relu(y_f + res_f)
            if not self.int8_residual:
                x_bf = out_f.astype(jnp.bfloat16)
            if n1 + 1 < len(blocks):
                nxt = f"{blocks[n1 + 1][0]}/conv1"
                x8 = quant_to(nxt, out_f if self.int8_residual else x_bf)
            if up_to == "l2_entry":
                return out_f
            start = n1 + 1

        # ---- residual stages -----------------------------------------------
        if start == 0:
            out_f = None
        for bi, (name, stride) in list(enumerate(blocks))[start:]:
            s_in = 1.0 / q[f"{name}/conv1"]["in_inv_scale"]
            if basic:
                h8 = conv_to_int8(f"{name}/conv1", f"{name}/conv2", x8, stride)
                y_f = conv_f32(f"{name}/conv2", h8, stride=1)
            else:
                h8 = conv_to_int8(f"{name}/conv1", f"{name}/conv2", x8, 1)
                h8 = conv_to_int8(f"{name}/conv2", f"{name}/conv3", h8, stride)
                y_f = conv_f32(f"{name}/conv3", h8, stride=1)
            if f"{name}/downsample_conv" in q:
                # same input tensor as conv1 → same calibrated scale: reuse x8
                res_f = conv_f32(f"{name}/downsample_conv", x8, stride)
            elif self.int8_residual:
                res_f = x8.astype(jnp.float32) * s_in
            else:
                res_f = x_bf.astype(jnp.float32)
            out_f = jax.nn.relu(y_f + res_f)
            if not self.int8_residual:
                x_bf = out_f.astype(jnp.bfloat16)
            if bi + 1 < len(blocks):
                nxt = f"{blocks[bi + 1][0]}/conv1"
                src = out_f if self.int8_residual else x_bf
                x8 = quant_to(nxt, src)
            stage = name.split("_")[0]
            stage_done = (
                bi + 1 == len(blocks)
                or not blocks[bi + 1][0].startswith(stage + "_")
            )
            if stage_done and up_to == {"layer1": "l1"}.get(stage, stage):
                return out_f

        if features:
            return out_f.astype(jnp.bfloat16)
        f = jnp.mean(out_f, axis=(1, 2))
        return f @ q["fc"]["kernel"] + q["fc"]["bias"]


def prequantize_input(qvariables, image):
    """Quantize a uint8 slide ONCE at conv1's calibrated input scale.

    The stem input quantize is elementwise, so it commutes with patch
    gathering: predicting from the pre-quantized int8 slide is bit-exact vs
    quantizing each gathered patch (``QuantizedResNet.apply`` int8 branch;
    asserted in tests and on full 8192-slide maps). It is NOT a speed lever:
    measured same-run through predict_full_fused it is ~11% SLOWER than raw
    u8 ingestion (benchmarks/int8_epilogue_gap.py r5 rows) — the per-patch
    quantize fuses into the gather/stem for free, while the int8 slide
    breaks that fusion. Provided for callers that need a quantized slide
    artifact (e.g. shipping a pre-processed tensor), not for throughput.
    float inputs are assumed already /255-normalized (training
    convention)."""
    x = jnp.asarray(image)
    inv0 = qvariables["params"]["conv1"]["in_inv_scale"]
    scale = inv0 / 255.0 if x.dtype == jnp.uint8 else inv0
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * scale), -127, 127
    ).astype(jnp.int8)


def quantize_resnet(
    model,
    variables,
    calib_batches,
    int8_residual: bool = False,
    pack_l1: bool = False,
):
    """Post-training-quantize a trained float ResNet.

    model/variables: from ``get_model``/``init_model`` (or a restored
    checkpoint); calib_batches: iterable of (B, H, W, 3) float arrays in
    [0, 1] (a handful of training batches is plenty). ``int8_residual``
    selects the residual-stream precision (QuantizedResNet docstring).
    ``pack_l1`` runs stage 1 space-to-depth-packed — bit-identical outputs,
    ~2x the stage-1 conv rate at fcn tile extents (use for the fcn serving
    mode; at patch extents the unpacked convs are already fast).

    Returns ``(qmodel, qvariables)`` — drop-in for every fused pipeline:
    ``predict_full_fused(img, qmodel, qvariables, ...)``."""
    folded = _folded_params(model, variables)
    absmax = calibrate(model, variables, calib_batches)

    qparams: dict[str, Any] = {}
    for name, (w, b) in folded.items():
        if name == "fc":
            qparams["fc"] = {"kernel": w, "bias": b}
            continue
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w / s_w[None, None, None, :]), -127, 127).astype(
            jnp.int8
        )
        s_x = max(absmax.get(name, 1.0), 1e-12) / 127.0
        qparams[name] = {
            "kernel_q": w_q,
            "dequant": (s_w * s_x).astype(jnp.float32),  # (outch,)
            "bias": b,
            "in_inv_scale": jnp.float32(1.0 / s_x),
        }
    return (
        QuantizedResNet(model, int8_residual=int8_residual, pack_l1=pack_l1),
        {"params": qparams},
    )
