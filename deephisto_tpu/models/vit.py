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
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        if self.stem in ("conv", "conv_gn"):
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
