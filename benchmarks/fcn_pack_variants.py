"""_pack_a implementation shootout inside the real fcn scan.

fcn_int8_stages.py (with the "pack" cut) attributes most of the stage-1
cost to the per-step ``_pack_a`` 2x2 space-to-depth of the stem output —
the SAME 5-D reshape/transpose pathology s2d_pack_image hit at the slide
level (fcn.py docstring: TPU assigns the intermediate a tiled layout that
pads the (2, 2, c) minor dims). Candidates, all bit-exact:

  transpose   current: pad + reshape(b,hp,2,wp,2,c) + transpose
  slices      pad + 4 strided slices + channel concat (s2d_pack_image's fix)

Measured as cut programs (slice→quant→stem→pack→[l1]) over the real
16384² staged slide, same process. Appends to
fcn_pack_variants_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def emit(out, row):
    row = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **row}
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def _pack_a_slices(x):
    import jax.numpy as jnp

    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [xp[:, si::2, sj::2, :] for si in (0, 1) for sj in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


def main():
    from bench import wait_for_healthy_device

    wait_for_healthy_device()

    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models import quantize as qz
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.quantize import quantize_resnet
    from deephisto_tpu.predict.fcn import stage_for_fcn
    from deephisto_tpu.predict.pipeline import model_input

    out = Path(__file__).with_name(
        f"fcn_pack_variants_{jax.default_backend()}.jsonl"
    )

    HW, TILE, HALO, TB = 16384, 1024, 32, 16
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    rng = np.random.default_rng(0)
    calib = [rng.random((8, 224, 224, 3), np.float32) for _ in range(2)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)

    slide = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)
    staged = stage_for_fcn(slide, tile=TILE, halo=HALO)
    packed = staged.packed
    float(jnp.sum(packed[0, 0].astype(jnp.float32)))
    del slide

    ty = tx = HW // TILE
    n_steps = (ty * tx) // TB
    idx = np.arange(ty * tx).reshape(n_steps, TB)
    pk = 4

    # sanity: the two packs are bit-identical
    xt = jnp.asarray(rng.random((2, 16, 16, 3), np.float32))
    a = np.asarray(qz._pack_a(xt))
    b = np.asarray(_pack_a_slices(xt))
    assert np.array_equal(a, b), "slice pack != transpose pack"
    emit(out, {"case": "pack_parity", "equal": True})

    def make_cut_program(cut):
        @jax.jit
        def program(padded, qv):
            def step(acc, idxs):
                def slice_one(t):
                    return jax.lax.dynamic_slice(
                        padded,
                        ((t // tx) * (TILE // pk), (t % tx) * (TILE // pk), 0),
                        ((TILE + 2 * HALO) // pk, (TILE + 2 * HALO) // pk,
                         padded.shape[-1]),
                    )

                xin = jax.vmap(slice_one)(idxs)
                y = qmodel.apply(
                    qv, model_input(qmodel, xin), pre_packed=True, up_to=cut
                )
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.asarray(idx))
            return acc

        return program

    orig = qz._pack_a
    for name, fn in [("transpose", orig), ("slices", _pack_a_slices)]:
        qz._pack_a = fn
        for cut in ("stem", "pack", "l1"):
            prog = make_cut_program(cut)
            tC = time.perf_counter()
            float(prog(packed, qvars))
            warm = time.perf_counter() - tC
            best = float("inf")
            for _ in range(4):
                t1 = time.perf_counter()
                float(prog(packed, qvars))
                best = min(best, time.perf_counter() - t1)
            emit(out, {"case": f"{name}_{cut}", "best_s": round(best, 4),
                       "compile_or_warm_s": round(warm, 1)})
    qz._pack_a = orig


if __name__ == "__main__":
    main()
