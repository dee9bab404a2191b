"""fcn 16384² stage isolation, round 2 (fcn16k_probe.py had two bugs/gaps):

* stage1_only/stage1_asm jits closed over the 805 MB packed slide, which
  ships as a CONSTANT in the remote-compile request → HTTP 413. Pass the
  slide as an argument instead.
* tile=512 variants test the session-3 conv-shape finding (stage-1-class
  convs run ~2x faster per FLOP at half the spatial extent; CLAUDE.md) on
  the full program: t512/h32 has the same 1.27x halo-compute overhead as
  t1024/h64 but (144,144,48) packed tiles instead of (288,288,48).

Probe-1 facts this builds on (fcn16k_probe_tpu.jsonl): stage23_only 0.028 s
of the 0.343 s tb8/h64 program (stage 1 is ~92%); tb16 and h32 each worth
~+2.5% alone.

Direct best-of-N with forced scalar completion; all cases in ONE process
(tunnel drift — CLAUDE.md). Appends to fcn16k_probe2_<backend>.jsonl.
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
    from deephisto_tpu.models.quantize import quantize_resnet
    from deephisto_tpu.predict import fcn as F

    out = (
        Path(__file__).parent / f"fcn16k_probe2_{jax.default_backend()}.jsonl"
    ).open("a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    def best_of(fn, reps=3):
        t0 = time.perf_counter()
        fn()  # compile + warm
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), warm

    rng = np.random.default_rng(0)
    H = W = 16384
    PS = 224
    n_equiv = F.fcn_equivalent_patches(H, W)

    image = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)  # host-packed
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    calib = [rng.random((32, PS, PS, 3)).astype(np.float32)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)

    # ---- full-program variants (each stages its own grid, then frees it) --
    for label, tile, halo, tb in (
        ("fcn_t1024_h64_tb16", 1024, 64, 16),   # probe-1 best pair check
        ("fcn_t1024_h32_tb16", 1024, 32, 16),   # do tb16 and h32 stack?
        ("fcn_t512_h32_tb32", 512, 32, 32),     # spatial-extent hypothesis
        ("fcn_t512_h32_tb64", 512, 32, 64),
        ("fcn_t512_h64_tb32", 512, 64, 32),
        ("fcn_t2048_h64_tb4", 2048, 64, 4),     # the other direction
    ):
        try:
            staged = F.stage_for_fcn(image, tile=tile, halo=halo)
            float(jnp.asarray(staged.packed)[0, 0, 0].astype(jnp.float32))

            def run(staged=staged, tile=tile, halo=halo, tb=tb):
                _, score = F.predict_full_fcn(
                    staged, qmodel, qvars, n_classes=5, patch_size=PS,
                    tile=tile, halo=halo, tile_batch=tb,
                )
                float(jnp.asarray(score).sum())

            dt, warm = best_of(run)
            emit({"case": label, "best_s": round(dt, 4),
                  "equiv_patches_per_s": round(n_equiv / dt, 1),
                  "compile_or_warm_s": round(warm, 1)})
            del staged
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})

    # ---- stage isolation at the headline grid (t1024/h64, tb sweep) -------
    TILE, halo = 1024, 64
    staged = F.stage_for_fcn(image, tile=TILE, halo=halo)
    padded_arr = jnp.asarray(staged.packed)
    float(padded_arr[0, 0, 0].astype(jnp.float32))
    fs = F.FEATURE_STRIDE
    ft = TILE // fs
    ty = tx = H // TILE
    n_tiles = ty * tx
    hh = halo // fs

    def make_stage1(tb, assemble):
        n_steps = n_tiles // tb
        idx = jnp.asarray(np.arange(n_tiles).reshape(n_steps, tb))

        @jax.jit
        def prog(padded, variables):
            def tile_step(_, idxs):
                def slice_one(t):
                    return jax.lax.dynamic_slice(
                        padded,
                        ((t // tx) * (TILE // 4), (t % tx) * (TILE // 4), 0),
                        ((TILE + 2 * halo) // 4, (TILE + 2 * halo) // 4,
                         padded.shape[-1]),
                    )

                xin = jax.vmap(slice_one)(idxs)
                xin = F.model_input(qmodel, xin)
                f = F._backbone_features(qmodel, variables, xin,
                                         pre_packed=True)
                return None, f[:, hh: hh + ft, hh: hh + ft].astype(jnp.bfloat16)

            _, tiles_f = jax.lax.scan(tile_step, None, idx)
            if not assemble:
                return tiles_f.sum()
            c = tiles_f.shape[-1]
            feat = (
                tiles_f.reshape(n_tiles, ft, ft, c)
                .reshape(ty, tx, ft, ft, c)
                .transpose(0, 2, 1, 3, 4)
                .reshape(ty * ft, tx * ft, c)
            )
            return feat.sum()

        return prog

    for label, tb, assemble in (
        ("stage1_only_tb8", 8, False),
        ("stage1_asm_tb8", 8, True),
        ("stage1_only_tb16", 16, False),
    ):
        try:
            prog = make_stage1(tb, assemble)
            dt, warm = best_of(lambda: float(prog(padded_arr, qvars)))
            emit({"case": label, "best_s": round(dt, 4),
                  "equiv_patches_per_s": round(n_equiv / dt, 1),
                  "compile_or_warm_s": round(warm, 1)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})

    out.close()


if __name__ == "__main__":
    main()
