"""Does the fused train step pay the s2d relayout tax too?

The predict-side finding (fcn_probe3): the stem's space-to-depth transpose
costs ~4 ms per 256-patch batch when its input is a sliced/gathered
intermediate. The train step feeds gathered patches through /255 + flips +
the same stem, so a packed sampler could save the same. This probe times the
full train body (fwd+bwd+adam, ResNet-18 s2d, b256) with:

  raw      (256, 224, 224, 3) uint8 patches (today's sampler contract)
  packed   (256, 56, 56, 48) uint8 pre-packed patches (pre_packed apply),
           flips as packed-space reverses + channel perms (exact)
  raw_noaug / packed_noaug — isolate the flip cost

VERDICT (v5e-1, train_packed_probe_tpu.jsonl): packed does NOT pay for
training. raw 22.1 ms/step vs packed 23.3 with flips (packed-space flips
need 48-channel perms, costing more than the stem relayout saves); noaug
packed is only +1.6% (20.9 vs 21.3 ms) even with FREE resident inputs —
production would additionally pay the packed-gather loss measured on the
exact predict path (-5..-22%, PackedSlide docstring). Samplers keep the
raw (B,224,224,3) uint8 contract.

Timing: ONE compiled K-step scan program chained through its own carry
(state in, state out) — calls×K steps share a single executable, and the
differential (3 calls − 1 call = 2K steps) cancels the per-dispatch tunnel
cost. Static-n variants are invalid here: each n recompiles, and the compile
lands inside the timed region. Appends to train_packed_probe_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.train.metrics import cross_entropy_loss

    out = (
        Path(__file__).parent / f"train_packed_probe_{jax.default_backend()}.jsonl"
    ).open("a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    def diff_time(step_state, state0, k_steps):
        """step_state: state -> (state, loss_sum), ONE compiled executable.

        Chain it through its carry; differential (3 calls - 1 call) / 2K
        cancels dispatch. Forced completion by fetching the loss scalar."""

        def run(n_calls):
            s, tot = state0, 0.0
            for _ in range(n_calls):
                s, loss = step_state(s)
            return float(loss)  # forces the whole chain

        run(1)  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); run(1); t1 = time.perf_counter()
            run(3); t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * k_steps))
        return best

    rng = np.random.default_rng(0)
    B, PS = 256, 224
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    labels0 = jnp.asarray(rng.integers(0, 5, B), jnp.int32)

    raw0 = jnp.asarray(rng.integers(0, 255, (B, PS, PS, 3), dtype=np.uint8))
    pk0 = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(raw0).reshape(B, PS // 4, 4, PS // 4, 4, 3)
            .transpose(0, 1, 3, 2, 4, 5)
        ).reshape(B, PS // 4, PS // 4, 48)
    )
    # packed-space horizontal flip = reverse packed cols + rx -> 3-rx
    ch = np.arange(48)
    ry, rx, c = ch // 12, (ch // 3) % 4, ch % 3
    perm_w = jnp.asarray((ry * 4 + (3 - rx)) * 3 + c)
    perm_h = jnp.asarray(((3 - ry) * 4 + rx) * 3 + c)

    for label in ("raw", "packed", "raw_noaug", "packed_noaug"):
        packed = label.startswith("packed")
        aug = not label.endswith("_noaug")
        state0 = create_train_state(
            model, jax.tree.map(jnp.array, variables), 1e-3
        )

        K = 24

        @jax.jit
        def step_state(state, packed=packed, aug=aug):
            def body(carry, k):
                state = carry
                src = pk0 if packed else raw0
                patches = src + jax.random.randint(k, (), 0, 1).astype(jnp.uint8)
                x = patches.astype(jnp.float32) / 255.0
                if aug:
                    kh, kv = jax.random.split(jax.random.fold_in(k, 1))
                    if packed:
                        x = jnp.where(
                            jax.random.bernoulli(kh), x[:, :, ::-1, perm_w], x
                        )
                        x = jnp.where(
                            jax.random.bernoulli(kv), x[:, ::-1, :, perm_h], x
                        )
                    else:
                        x = jnp.where(jax.random.bernoulli(kh), x[:, :, ::-1, :], x)
                        x = jnp.where(jax.random.bernoulli(kv), x[:, ::-1, :, :], x)

                def loss_fn(params):
                    logits, updates = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        x, train=True, mutable=["batch_stats"],
                        **({"pre_packed": True} if packed else {}),
                    )
                    return cross_entropy_loss(logits, labels0), updates

                (loss, updates), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                state = state.apply_gradients(grads=grads)
                state = state.replace(batch_stats=updates["batch_stats"])
                return state, loss

            # derive the scan keys from the carried step count so every
            # chained call runs distinct steps through the SAME executable
            keys = jax.random.split(
                jax.random.fold_in(jax.random.key(0), state.step), K
            )
            state, losses = jax.lax.scan(body, state, keys)
            return state, losses.sum()

        try:
            dt = diff_time(step_state, state0, K)
            emit({"case": label, "s_per_step": round(dt, 6),
                  "patches_per_s": round(B / dt, 1)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:300]})

    out.close()


if __name__ == "__main__":
    main()
