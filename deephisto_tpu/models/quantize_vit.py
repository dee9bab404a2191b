"""Post-training int8 quantization for the ViT family — serving mode #2.

Where the FLOPs are at the production 196-token shape (dim 384): the Dense
matmuls — qkv (3d² per token), proj (d²), mlp (8d²) — carry ~92% of the
model's multiply-adds; attention's n²d score/AV matmuls are ~8%. So the
serving mode quantizes exactly the Dense weights/activations (W8A8,
per-output-channel weight scales, per-tensor calibrated activation scales)
and leaves LayerNorm, softmax/attention, GELU, and the residual stream in
bf16/f32 — the standard transformer W8A8 recipe, mapped onto the v5e MXU's
s8×s8→s32 path (2× the bf16 rate).

Every dequant → nonlinearity → requant runs as one f32 epilogue fused into
the adjacent matmul (same structure as the ResNet serving mode,
models/quantize.py). The residual stream stays bf16: it is the error-
accumulation path, and its adds are bandwidth-trivial next to the matmuls.

Reference parity note: the reference has no transformer at all (its backbone
is torchvision resnet18, reference models/patch_cls_simple/model.py:1-11);
the ViT and this serving mode are framework extensions, benchmarked in
benchmarks/README.md.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .vit import FLASH_MIN_SEQ, ViT, _attention, _on_tpu

LN_EPS = 1e-6  # flax.linen.LayerNorm default, vit.py blocks


def _layer_norm(x, p):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    return y * jnp.asarray(p["scale"], jnp.float32) + jnp.asarray(
        p["bias"], jnp.float32
    )


def _split_heads(qkv, b, n, heads, dim):
    dh = dim // heads
    qkv = qkv.reshape(b, n, 3, heads, dh).transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]


BN_EPS = 1e-5  # the conv stem's nn.BatchNorm epsilon, vit.py
GN_EPS = 1e-6  # flax nn.GroupNorm default, used by the conv_gn stem


def _n_stem_convs(model: ViT) -> int:
    return (
        model.patch.bit_length() - 1
        if model.stem in ("conv", "conv_gn")
        else 0
    )


def _group_norm(x, scale, bias, groups, eps=GN_EPS):
    """flax nn.GroupNorm inference math in f32: per-sample statistics over
    (H, W, channels-within-group). Sample-local, so it CANNOT fold into the
    conv the way BatchNorm does — the conv_gn W8A8 stem keeps it as an f32
    epilogue between int8 convs."""
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * scale + bias


def _fold_stem(model: ViT, variables):
    """Fold each stem BN into its (bias-free) 3×3/2 conv — the standard
    inference fold (same math as models/quantize.py's ResNet fold):
    w' = w·γ/√(σ²+ε) per output channel, b' = β − μ·γ/√(σ²+ε).
    conv_gn stems have no foldable statistics → empty (handled separately)."""
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    folded = []
    if model.stem != "conv":
        return folded
    for i in range(_n_stem_convs(model)):
        w = jnp.asarray(p[f"stem_conv{i}"]["kernel"], jnp.float32)
        bn = p[f"stem_bn{i}"]
        mean = jnp.asarray(bs[f"stem_bn{i}"]["mean"], jnp.float32)
        var = jnp.asarray(bs[f"stem_bn{i}"]["var"], jnp.float32)
        g = jnp.asarray(bn["scale"], jnp.float32) * jax.lax.rsqrt(var + BN_EPS)
        folded.append((w * g, jnp.asarray(bn["bias"], jnp.float32) - mean * g))
    return folded


def _float_forward(model: ViT, variables, x, record=None):
    """Float forward mirroring vit.py's ViT.__call__ at inference (BN folded
    for the conv stem), optionally recording per-matmul input absmax into
    ``record`` (the calibration pass)."""
    p = variables["params"]

    def note(name, t):
        if record is not None:
            record[name] = jnp.maximum(
                record.get(name, jnp.float32(0.0)), jnp.max(jnp.abs(t))
            )

    x = jnp.asarray(x, jnp.float32)
    if model.stem == "conv":
        for i, (w, b) in enumerate(_fold_stem(model, variables)):
            note(f"stem{i}", x)
            x = jax.nn.relu(
                jax.lax.conv_general_dilated(
                    x, w, (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b
            )
        note("embed", x)
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(p["embed"]["kernel"], jnp.float32), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(p["embed"]["bias"], jnp.float32)
    elif model.stem == "conv_gn":
        for i in range(_n_stem_convs(model)):
            note(f"stem{i}", x)
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(p[f"stem_conv{i}"]["kernel"], jnp.float32),
                (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            gn = p[f"stem_gn{i}"]
            x = jax.nn.relu(_group_norm(
                x, jnp.asarray(gn["scale"], jnp.float32),
                jnp.asarray(gn["bias"], jnp.float32),
                groups=math.gcd(32, x.shape[-1]),
            ))
        note("embed", x)
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(p["embed"]["kernel"], jnp.float32), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(p["embed"]["bias"], jnp.float32)
    else:
        note("embed", x)
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(p["embed"]["kernel"], jnp.float32),
            (model.patch, model.patch), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(p["embed"]["bias"], jnp.float32)
    b, gh, gw, d = x.shape
    n = gh * gw
    x = x.reshape(b, n, d) + jnp.asarray(p["pos_embed"], jnp.float32)
    for i in range(model.depth):
        bp = p[f"block{i}"]
        y = _layer_norm(x, bp["ln1"])
        note(f"block{i}/qkv", y)
        qkv = y @ jnp.asarray(bp["attn"]["qkv"]["kernel"], jnp.float32) + jnp.asarray(
            bp["attn"]["qkv"]["bias"], jnp.float32
        )
        q, k, v = _split_heads(qkv, b, n, model.heads, model.dim)
        att = _attention(q, k, v, use_flash=False)
        att = att.transpose(0, 2, 1, 3).reshape(b, n, model.dim)
        note(f"block{i}/proj", att)
        x = x + att @ jnp.asarray(
            bp["attn"]["proj"]["kernel"], jnp.float32
        ) + jnp.asarray(bp["attn"]["proj"]["bias"], jnp.float32)
        y = _layer_norm(x, bp["ln2"])
        note(f"block{i}/fc1", y)
        y = y @ jnp.asarray(bp["fc1"]["kernel"], jnp.float32) + jnp.asarray(
            bp["fc1"]["bias"], jnp.float32
        )
        y = jax.nn.gelu(y, approximate=True)
        note(f"block{i}/fc2", y)
        x = x + y @ jnp.asarray(bp["fc2"]["kernel"], jnp.float32) + jnp.asarray(
            bp["fc2"]["bias"], jnp.float32
        )
    x = _layer_norm(x, p["ln"])
    x = x.mean(axis=1)
    return x @ jnp.asarray(p["head"]["kernel"], jnp.float32) + jnp.asarray(
        p["head"]["bias"], jnp.float32
    )


def calibrate_vit(model, variables, batches):
    """{matmul_name: input absmax} over calibration batches ([0,1] NHWC)."""

    @jax.jit
    def one(x):
        rec = {}
        _float_forward(model, variables, x, record=rec)
        return rec

    absmax: dict[str, float] = {}
    for b in batches:
        for k, v in one(jnp.asarray(b)).items():
            absmax[k] = max(absmax.get(k, 0.0), float(v))
    return absmax


class QuantizedViT:
    """``.apply``-compatible int8 ViT; construct via :func:`quantize_vit`.

    Accepts raw uint8 input (``wants_uint8``; /255 folds into the embed
    quantization scale) or float in [0, 1]."""

    wants_uint8 = True

    def __init__(self, model: ViT):
        self._model = model

    def __hash__(self):
        return hash((type(self).__name__, self._model))

    def __eq__(self, other):
        return type(other) is type(self) and other._model == self._model

    def apply(self, variables, x, train: bool = False):
        assert not train, "QuantizedViT is inference-only"
        q = variables["params"]
        model = self._model

        def quant(name, xf):
            inv = q[name]["in_inv_scale"]
            return jnp.clip(
                jnp.round(xf.astype(jnp.float32) * inv), -127, 127
            ).astype(jnp.int8)

        def qdot(name, xf):
            """int8 matmul with fused f32 dequant+bias epilogue → f32."""
            layer = q[name]
            y = jax.lax.dot_general(
                quant(name, xf), layer["kernel_q"],
                (((xf.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return y.astype(jnp.float32) * layer["dequant"] + layer["bias"]

        # ---- embed: int8 patch conv (u8 fast path) ----------------------
        def quant_in(layer, xf):
            inv = layer["in_inv_scale"]
            if xf.dtype == jnp.uint8:  # /255 folds into the input scale
                inv = inv / 255.0
            return jnp.clip(
                jnp.round(xf.astype(jnp.float32) * inv), -127, 127
            ).astype(jnp.int8)

        def qconv(layer, xf, stride, padding):
            y = jax.lax.conv_general_dilated(
                quant_in(layer, xf), layer["kernel_q"], stride, padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return y.astype(jnp.float32) * layer["dequant"] + layer["bias"]

        for i in range(_n_stem_convs(model)):
            if model.stem == "conv_gn":
                # int8 conv, then GroupNorm as an f32 epilogue (sample-local
                # stats can't fold into the kernel the way BatchNorm does)
                y = qconv(q[f"stem{i}"], x, (2, 2), "SAME")
                gn = q[f"stem_gn{i}"]
                x = jax.nn.relu(_group_norm(
                    y, gn["scale"], gn["bias"],
                    groups=math.gcd(32, gn["scale"].shape[-1]),
                ))
            else:
                # BN-folded int8 stem conv; dequant+bias+relu is one f32
                # epilogue
                x = jax.nn.relu(qconv(q[f"stem{i}"], x, (2, 2), "SAME"))
        emb_stride = (
            (1, 1)
            if model.stem in ("conv", "conv_gn")
            else (model.patch, model.patch)
        )
        xe = qconv(q["embed"], x, emb_stride, "VALID")
        b, gh, gw, d = xe.shape
        n = gh * gw
        x = (xe.reshape(b, n, d) + q["pos_embed"]).astype(jnp.bfloat16)

        use_flash = _on_tpu() and n >= FLASH_MIN_SEQ
        for i in range(model.depth):
            bp = q[f"block{i}"]
            y = _layer_norm(x, bp["ln1"])
            qkv = qdot(f"block{i}/qkv", y)
            qq, kk, vv = _split_heads(
                qkv.astype(jnp.bfloat16), b, n, model.heads, model.dim
            )
            att = _attention(qq, kk, vv, use_flash=use_flash)
            att = att.transpose(0, 2, 1, 3).reshape(b, n, model.dim)
            x = x + qdot(f"block{i}/proj", att).astype(jnp.bfloat16)
            y = _layer_norm(x, bp["ln2"])
            y = jax.nn.gelu(qdot(f"block{i}/fc1", y), approximate=True)
            x = x + qdot(f"block{i}/fc2", y).astype(jnp.bfloat16)

        x = _layer_norm(x, q["ln"])
        f = x.mean(axis=1)
        return f @ q["head"]["kernel"] + q["head"]["bias"]


def quantize_vit(model: ViT, variables, calib_batches):
    """Post-training-quantize a trained float ViT → ``(qmodel, qvariables)``,
    drop-in for the fused pipelines (wants_uint8 serving mode)."""
    p = variables["params"]
    absmax = calibrate_vit(model, variables, calib_batches)

    def qweights(name, kernel, bias):
        w = jnp.asarray(kernel, jnp.float32)
        # per-output-channel symmetric scales on the last axis
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        s_x = max(absmax.get(name, 1.0), 1e-12) / 127.0
        return {
            "kernel_q": w_q,
            "dequant": (s_w * s_x).astype(jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32),
            "in_inv_scale": jnp.float32(1.0 / s_x),
        }

    qp: dict = {
        "embed": qweights("embed", p["embed"]["kernel"], p["embed"]["bias"]),
        "pos_embed": jnp.asarray(p["pos_embed"], jnp.float32),
    }
    for i, (w, b) in enumerate(_fold_stem(model, variables)):
        qp[f"stem{i}"] = qweights(f"stem{i}", w, b)
    if model.stem == "conv_gn":
        for i in range(_n_stem_convs(model)):
            w = jnp.asarray(p[f"stem_conv{i}"]["kernel"], jnp.float32)
            qp[f"stem{i}"] = qweights(
                f"stem{i}", w, jnp.zeros((w.shape[-1],), jnp.float32)
            )
            gn = p[f"stem_gn{i}"]
            qp[f"stem_gn{i}"] = {
                "scale": jnp.asarray(gn["scale"], jnp.float32),
                "bias": jnp.asarray(gn["bias"], jnp.float32),
            }
    qp |= {
        "ln": {
            "scale": jnp.asarray(p["ln"]["scale"], jnp.float32),
            "bias": jnp.asarray(p["ln"]["bias"], jnp.float32),
        },
        "head": {
            "kernel": jnp.asarray(p["head"]["kernel"], jnp.float32),
            "bias": jnp.asarray(p["head"]["bias"], jnp.float32),
        },
    }
    for i in range(model.depth):
        bp = p[f"block{i}"]
        qp[f"block{i}"] = {
            "ln1": {
                "scale": jnp.asarray(bp["ln1"]["scale"], jnp.float32),
                "bias": jnp.asarray(bp["ln1"]["bias"], jnp.float32),
            },
            "ln2": {
                "scale": jnp.asarray(bp["ln2"]["scale"], jnp.float32),
                "bias": jnp.asarray(bp["ln2"]["bias"], jnp.float32),
            },
        }
        qp[f"block{i}/qkv"] = qweights(
            f"block{i}/qkv", bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"]
        )
        qp[f"block{i}/proj"] = qweights(
            f"block{i}/proj", bp["attn"]["proj"]["kernel"], bp["attn"]["proj"]["bias"]
        )
        qp[f"block{i}/fc1"] = qweights(
            f"block{i}/fc1", bp["fc1"]["kernel"], bp["fc1"]["bias"]
        )
        qp[f"block{i}/fc2"] = qweights(
            f"block{i}/fc2", bp["fc2"]["kernel"], bp["fc2"]["bias"]
        )
    return QuantizedViT(model), {"params": qp}
