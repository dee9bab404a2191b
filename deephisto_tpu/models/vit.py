"""Vision Transformer patch classifier (second model family, TPU-native).

A framework extension beyond the reference's single ResNet family: a compact
ViT with **length-adaptive attention**: sequences of ``FLASH_MIN_SEQ`` tokens
or more run through JAX's official Pallas flash-attention kernel
(`jax.experimental.pallas.ops.tpu.flash_attention`, the tiled online-softmax
kernel that never materializes the (N, N) score matrix); shorter sequences —
including the production 224²/16 = 196-token shape — use plain jnp attention,
which measured 2.2× FASTER there (the score matrix is tiny and the kernel's
padding/launch overhead dominates; see FLASH_MIN_SEQ). CPU test meshes always
take the jnp path; the kernel itself stays parity-tested in interpret mode.

Architecture: conv patch-embedding (16px tokens), pre-LN transformer blocks,
mean pooling, linear head. bf16 compute, f32 params, NHWC input like every
other model here, so the samplers/fused-epoch/predict pipelines work
unchanged (``get_model(..., arch='vit')``).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# Below this sequence length the plain jnp attention BEATS the Pallas flash
# kernel on TPU; from here up the kernel wins — WITH TUNED BLOCK SIZES
# (_flash_block_sizes): the kernel's default BlockSizes run a flat ~8.5
# TFLOP/s on v5e at every length, losing to jnp everywhere, while tuned
# blocks sustain 45-64 TFLOP/s. Measured v5e crossover sweep
# (benchmarks/attention_sweep_tpu.jsonl, differential timing, (b,6,n,64)
# shapes at constant total tokens):
#
#     n      jnp TFLOP/s   flash(default)   flash(tuned)
#     196       24.7            4.1              —
#     256       23.8             —              18.1
#     512       26.9            8.2             45.3
#     768       28.1             —              35.3
#     1024      28.2            8.1             54.2
#     2048      29.4            8.5             57.8
#     4096      28.9            8.5             64.1
#
# The production 224²/16 = 196-token predict shape pads to 256 and stays on
# the jnp path (also measured end-to-end: 12.0k vs 5.5k patches/s in the
# kernel's disfavor); 512+ tokens (patch=8 configs) take the tuned kernel.
FLASH_MIN_SEQ = 512


def _flash_block_sizes(n: int):
    """Measured-optimal v5e BlockSizes for the flash kernel at padded length
    ``n`` (multiple of 128). The sweep is insensitive to the exact combo once
    block_kv >= 1024 and block_q >= 512 (±5%); block_b > 1 never helped.
    The backward (dkv/dq) blocks mirror the forward ones — they must be
    explicit or differentiating the kernel fails ("not all backward blocks
    are specified"); training a patch-8 ViT (784 tokens) hits the kernel
    under grad."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    def pick(cap):
        for b in (1024, 512, 384, 256, 128):
            if b <= cap and n % b == 0:
                return b
        return 128

    bq = pick(512)
    bk = pick(1024)
    return BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk,
        block_k_dq=bk,
        block_q_dq=bq,
    )


def _attention(q, k, v, use_flash: bool):
    """(B, H, N, Dh) attention; Pallas flash kernel on TPU, jnp elsewhere.

    Flash-attention block sizes need the sequence padded to the block grid; we
    pad N up to a multiple of 128 with zero tokens and mask them out of the
    softmax via an additive bias (ab).
    """
    scale = q.shape[-1] ** -0.5
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        b, h, n, dh = q.shape
        # pad to a multiple of 512, not 128: the tuned 512/1024 blocks must
        # DIVIDE the padded length (the kernel verifies this — the backward
        # pass rejects q_seq_len=896 with block 512), and the sweep showed
        # sub-256 blocks run at a fraction of the rate. Pad tokens are
        # masked out via SegmentIds either way.
        n_pad = (-n) % 512
        if n_pad:
            pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
            qp = jnp.pad(q, pad)
            kp = jnp.pad(k, pad)
            vp = jnp.pad(v, pad)
            # segment ids mask the pad tokens out of the real tokens' softmax
            # (pads attend among themselves; their rows are sliced off) at
            # O(N) memory — a dense additive bias would re-materialize the
            # (N, N) score matrix the flash kernel exists to avoid
            ids = (jnp.arange(n + n_pad) >= n).astype(jnp.int32)
            ids = jnp.broadcast_to(ids[None], (b, n + n_pad))
            seg = SegmentIds(q=ids, kv=ids)
            out = flash_attention(
                qp, kp, vp, segment_ids=seg, causal=False, sm_scale=scale,
                block_sizes=_flash_block_sizes(n + n_pad),
            )
            return out[:, :, :n, :]
        return flash_attention(
            q, k, v, causal=False, sm_scale=scale,
            block_sizes=_flash_block_sizes(n),
        )

    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


class MHA(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        dh = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        out = _attention(q, k, v, use_flash=_on_tpu() and n >= FLASH_MIN_SEQ)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + MHA(self.dim, self.heads, self.dtype, name="attn")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class ViT(nn.Module):
    """Compact ViT for patch classification.

    stem="linear" is the classic patchify embedding (one patch×patch conv —
    the round-3 recipe and the surface the TP/PP/quantize paths assume).
    stem="conv" replaces it with log2(patch) 3×3 stride-2 conv+BN+relu layers
    and a 1×1 projection ("Early convolutions help transformers see better",
    Xiao et al. 2021) — same token grid, much better from-scratch optimization
    on small datasets (the round-3 ViT plateaued at 0.47 sustained on the
    hard regime vs r18's 0.72; see benchmarks/time_to_accuracy.py vit2 arms).
    stem="conv_gn" is the same conv stack with GroupNorm in place of
    BatchNorm: no batch statistics, so the GPipe microbatch split is exact
    and pipeline parallelism composes (parallel/pipeline.py rejects
    BatchNorm stems for exactly that reason); accuracy on the hard regime is
    measured in the same study (time_to_accuracy vit2gn arm).
    """

    num_classes: int
    patch: int = 16
    dim: int = 384
    depth: int = 6
    heads: int = 6
    dtype: Any = jnp.bfloat16
    stem: str = "linear"

    @nn.compact
    def __call__(self, x, train: bool = False, tokens: bool = False):
        x = x.astype(self.dtype)
        if tokens:
            # serving entry for pre-computed stem features (b, gh, gw, dim):
            # fold_vit_stem runs the BN-folded / s2d-packed stem outside the
            # flax module and re-enters here at the shared transformer tail
            # (the unused stem params are simply not requested — flax apply
            # tolerates that)
            pass
        elif self.stem in ("conv", "conv_gn"):
            n_down = self.patch.bit_length() - 1
            if 1 << n_down != self.patch:
                raise ValueError(
                    f"conv stem needs a power-of-2 patch, got {self.patch}"
                )
            for i in range(n_down):
                ch = max(self.dim >> (n_down - 1 - i), 32)
                x = nn.Conv(
                    ch, (3, 3), (2, 2), use_bias=False, dtype=self.dtype,
                    name=f"stem_conv{i}",
                )(x)
                if self.stem == "conv_gn":
                    # sample-local statistics: exact under any microbatch
                    # split, so PP composes (class docstring). gcd keeps the
                    # group count dividing narrow first-stage channels (48).
                    import math

                    x = nn.GroupNorm(
                        num_groups=math.gcd(32, ch), dtype=self.dtype,
                        name=f"stem_gn{i}",
                    )(x)
                else:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=self.dtype, name=f"stem_bn{i}",
                    )(x)
                x = nn.relu(x)
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="embed")(x)
        else:
            x = nn.Conv(
                self.dim,
                (self.patch, self.patch),
                (self.patch, self.patch),
                dtype=self.dtype,
                name="embed",
            )(x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, gh * gw, self.dim),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        for i in range(self.depth):
            x = Block(self.dim, self.heads, dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x).astype(
            jnp.float32
        )


ViTSmall = partial(ViT, dim=384, depth=6, heads=6)
ViTBase = partial(ViT, dim=768, depth=12, heads=12)


class FoldedStemViT:
    """``.apply``-compatible bf16 serving rewrite of the conv-stem ViT.

    The recommended from-scratch recipe (stem="conv") costs ~10% vs the
    linear stem through the fused predict pipeline (round 4,
    benchmarks/vit_stem_serving_tpu.jsonl). This applies the same playbook
    that fixed the ResNet stem (models/quantize.py pack_l1 docstring):

    * inference-mode BatchNorm affines fold into the stem conv kernels
      (exact in f32; one bias add replaces the BN pass),
    * the first conv — a 3×3 stride-2 on THREE input channels, the worst
      MXU fill in the model — runs on 2×2 space-to-depth-packed input as a
      2×2 stride-1 conv over 12 channels (pure kernel relocation, exact:
      SAME stride-2 on even extent pads (0, 1) → taps {0, 1, 2}, raw rows
      {2i, 2i+1, 2i+2} = packed rows i, i+1; the packing itself is strided
      slices, not a 5-D transpose — see _pack_a's layout lesson),
    * raw uint8 ingestion (``wants_uint8``): /255 folds into the first
      kernel, so the fused pipelines skip the float conversion pass.

    Construct via :func:`fold_vit_stem`; the transformer tail re-enters the
    original flax module at ``tokens=True`` — weights are shared, results
    match the float model to bf16 rounding (parity: tests/test_vit.py)."""

    wants_uint8 = True

    def __init__(self, model: ViT):
        if model.stem != "conv":
            raise ValueError(
                "fold_vit_stem serves stem='conv' (BatchNorm folds; "
                f"got stem={model.stem!r})"
            )
        self._model = model

    def __hash__(self):
        return hash((type(self).__name__, self._model))

    def __eq__(self, other):
        return type(other) is type(self) and other._model == self._model

    # the fused pipelines key program caches on (model, n_classes, ...)
    @property
    def stem(self):
        return self._model.stem

    def apply(self, variables, x, train: bool = False):
        assert not train, "FoldedStemViT is inference-only"
        f = variables["params"]
        dt = self._model.dtype

        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError(
                f"s2d stem needs even spatial extents, got {x.shape}"
            )
        if x.dtype == jnp.uint8:
            k0 = f["stem0_kernel_u8"]  # /255 folded in
        else:
            k0 = f["stem0_kernel"]
        # 2x2 space-to-depth: strided slices + channel concat (lane si*2+sj)
        parts = [x[:, si::2, sj::2, :] for si in (0, 1) for sj in (0, 1)]
        xp = jnp.concatenate(parts, axis=-1).astype(dt)
        y = jax.lax.conv_general_dilated(
            xp, k0.astype(dt), (1, 1), [(0, 1), (0, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.nn.relu(y + f["stem0_bias"].astype(dt))
        i = 1
        while f"stem{i}_kernel" in f:
            y = jax.lax.conv_general_dilated(
                y, f[f"stem{i}_kernel"].astype(dt), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = jax.nn.relu(y + f[f"stem{i}_bias"].astype(dt))
            i += 1
        y = jax.lax.conv_general_dilated(
            y, f["embed_kernel"].astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + f["embed_bias"].astype(dt)
        return self._model.apply(f["inner"], y, tokens=True)


def fold_vit_stem(model: ViT, variables: dict):
    """Build the :class:`FoldedStemViT` serving rewrite (docstring there).

    Returns ``(folded_model, folded_variables)`` — a drop-in for the fused
    predict pipelines. Folding is host-side f32; the original variables ride
    along for the transformer tail."""
    import numpy as np

    fm = FoldedStemViT(model)
    params = variables["params"]
    stats = variables["batch_stats"]
    n_down = model.patch.bit_length() - 1
    folded: dict = {}
    for i in range(n_down):
        k = np.asarray(params[f"stem_conv{i}"]["kernel"], np.float64)
        bn_p, bn_s = params[f"stem_bn{i}"], stats[f"stem_bn{i}"]
        g = np.asarray(bn_p["scale"], np.float64)
        b = np.asarray(bn_p["bias"], np.float64)
        m = np.asarray(bn_s["mean"], np.float64)
        v = np.asarray(bn_s["var"], np.float64)
        s = g / np.sqrt(v + 1e-5)
        kf = k * s  # (kh, kw, ci, co) * (co,)
        bias = b - m * s
        if i == 0:
            kh, kw, ci, co = kf.shape  # (3, 3, 3, ch)
            kp = np.zeros((2, 2, 4 * ci, co))
            for dy in range(kh):
                for dx in range(kw):
                    lane = (dy % 2) * 2 + dx % 2
                    kp[dy // 2, dx // 2, lane * ci : (lane + 1) * ci] = kf[
                        dy, dx
                    ]
            folded["stem0_kernel"] = jnp.asarray(kp, jnp.float32)
            folded["stem0_kernel_u8"] = jnp.asarray(kp / 255.0, jnp.float32)
            folded["stem0_bias"] = jnp.asarray(bias, jnp.float32)
        else:
            folded[f"stem{i}_kernel"] = jnp.asarray(kf, jnp.float32)
            folded[f"stem{i}_bias"] = jnp.asarray(bias, jnp.float32)
    folded["embed_kernel"] = jnp.asarray(params["embed"]["kernel"])
    folded["embed_bias"] = jnp.asarray(params["embed"]["bias"])
    folded["inner"] = variables
    return fm, {"params": folded}
