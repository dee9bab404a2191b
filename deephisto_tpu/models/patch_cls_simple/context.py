"""Context-consistent training: make a patch classifier fcn-native.

A model trained on bare 224² patches bakes the conv zero-padding at patch
borders into its features; evaluated fully convolutionally (predict/fcn.py),
its windows see real tissue where training showed it zeros, and the maps
diverge (measured on the demo checkpoint: window-level argmax agreement with
the patch forward ~81%, map ground-truth accuracy 57%→44% —
benchmarks/fcn_agreement_tpu.jsonl). BN-stat recalibration alone makes it
worse (the head was trained against patch-statistics features).

The TPU-native fix is to TRAIN THE WAY YOU SERVE: sample patches WITH real
surrounding context, run the backbone convolutionally on the padded window,
and classify from the center ``patch_size`` block of the stride-32 feature
map — exactly the features the fcn predict mode computes. ``ContextWindowModel``
wraps any ResNet-family model with that forward; it is ``.apply``-compatible
with the fused train/eval programs (make_fused_epoch/make_fused_eval take it
unchanged), so context fine-tuning is the same one-program epoch as normal
training.

Production recipe: set ``model.context: 64`` in the training config — the
trainer samples context windows around the SAME labeled patches
(``make_sample_fn(context=...)``, labels keep the bare-patch intersection
rule), edge-pads the disk test patches, and saves a plain base-model
checkpoint — then serve with predict_full_fcn: the fcn map becomes the
model's native output instead of an approximation
(study: benchmarks/config_ctx64.yaml + benchmarks/README.md). A gentle
fine-tune of an existing patch-trained checkpoint (benchmarks/fcn_finetune.py)
closes the mode gap too, but costs absolute accuracy on small datasets.
"""

from __future__ import annotations

import jax.numpy as jnp

FEATURE_STRIDE = 32  # ResNet total stride (predict/fcn.py)


class ContextWindowModel:
    """``.apply``-compatible wrapper: classify the CENTER ``patch_size`` block
    of a larger context window from convolutional features.

    Input: (B, patch_size + 2*context, patch_size + 2*context, 3); both
    ``patch_size`` and ``context`` must be multiples of 32."""

    def __init__(self, model, patch_size: int = 224, context: int = 64):
        if patch_size % FEATURE_STRIDE or context % FEATURE_STRIDE or context < 0:
            raise ValueError(
                "patch_size and context must be non-negative multiples of 32"
            )
        self._model = model
        self.patch_size = patch_size
        self.context = context

    def __hash__(self):
        return hash((type(self).__name__, self._model, self.patch_size, self.context))

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other._model == self._model
            and other.patch_size == self.patch_size
            and other.context == self.context
        )

    @property
    def inner(self):
        return self._model

    def apply(self, variables, x, train: bool = False, mutable=None, **kw):
        fs = FEATURE_STRIDE
        c = self.context // fs
        wf = self.patch_size // fs
        kwargs = dict(train=train, features=True)
        if mutable is not None:
            kwargs["mutable"] = mutable
        out = self._model.apply(variables, x, **kwargs)
        feat, updates = out if mutable is not None else (out, None)
        feat = feat[:, c : c + wf, c : c + wf]
        pooled = jnp.mean(feat.astype(jnp.float32), axis=(1, 2))
        p = variables["params"]["fc"]
        logits = pooled @ jnp.asarray(p["kernel"], jnp.float32) + jnp.asarray(
            p["bias"], jnp.float32
        )
        if mutable is not None:
            return logits, updates
        return logits
