"""End-to-end MFU account of the int8 fcn flagship (VERDICT r4 item 1).

The headline program (16384², t1024/h32/tb16, pack=8 staged, int8 pack_l1
s2d8) was measured at ~110 int8 TOPS achieved while its own stage-1 conv
primitive runs 319.6 TOPS isolated (fcn_l1_sweep_tpu.jsonl). This probe
produces, in ONE process (tunnel drift — CLAUDE.md):

1. ``fcn_mfu`` — the end-to-end account: executed dense TOPS (what the MXU
   actually multiplies, embedded-kernel zeros included) vs the v5e-1 int8
   peak, plus the original-equivalent and useful (no-halo-overlap) rates.
   Same row for the bf16 fcn program vs bf16 peak.
2. The cut ladder (quantize.py ``up_to``) at the TRUE headline config —
   fcn_int8_stages.py ran pack=4; the headline is pack=8/s2d8 — so stage
   shares and per-stage achieved TOPS attribute the gap.
3. Stage-1 rate isolation at the REAL scan shapes, one variable at a time
   (differential fori_loop, bodies sized >= ~150 ms per CLAUDE.md):
   the 319.6 TOPS probe used (8, 144, 144, 256) with an integer
   shift-requant epilogue; the real loop runs (16, 137, 137, 256) pack_A /
   (16, 136, 136, 256) pack_B with f32 dequant+relu+requant epilogues and a
   bf16 residual carry. Cases:
     pair_trunc        chained a2b/b2a convs, bare .astype(int8) epilogue
     pair_shift        same, integer shift-requant (the isolated probe's)
     pair_f32          same, the real per-channel f32 requant epilogue
     block_real        the real stage-1 block body (bf16 residual carry,
                       edge masks, requant to next scale) — apply()'s loop
     block_int8res     int8-residual variant (no bf16 carry)
     pair_shift_even   pair_shift at even extents (16, 144/145) — isolates
                       the odd-extent tax
     epi_only          the f32 requant epilogue alone on an s32-sized
                       tensor (bandwidth bound for the elementwise pass)

v5e-1 peaks used: 394 int8 TOPS / 197 bf16 TFLOP/s.
Appends to fcn_mfu_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HW = 16384
TILE, HALO, TB = 1024, 32, 16
PEAK_INT8_TOPS = 394.0
PEAK_BF16_TFLOPS = 197.0


def fcn_r18_tile_gmacs(tile: int, halo: int, packed: bool = True):
    """Analytic per-tile MAC count (G) of the r18 s2d fcn backbone.

    packed=True counts what the MXU EXECUTES under pack_l1/s2d8 (dense
    embedded kernels, structured zeros multiplied); packed=False counts the
    plain s2d trunk (the original-equivalent work). Shapes follow
    quantize.py's packed pipeline: stem b2a 48->64, stage-1 a2b/b2a x2
    blocks, stage-2 entry a2x + 3x3 + 1x1 ds, then standard stages."""
    P = tile + 2 * halo
    s = P // 4            # s2d stem grid (272 at t1024/h32)
    A, B = s // 2 + 1, s // 2   # pack_A / pack_B extents (137 / 136)
    S2, S3, S4 = s // 2, s // 4, s // 8
    g = 0.0
    if packed:
        g += A * A * 4 * 192 * 256                 # stem as embedded b2a
        g += 2 * (B * B + A * A) * 4 * 256 * 256   # stage 1: 2 blocks a2b+b2a
        g += B * B * 4 * 256 * 128                 # stage-2 entry a2x
        g += S2 * S2 * 256 * 128                   # ds as a2x_1x1
    else:
        g += s * s * 4 * 48 * 64                   # stem conv 2x2
        g += 4 * s * s * 9 * 64 * 64               # stage 1: 4 convs 3x3
        g += S2 * S2 * 9 * 64 * 128                # stage-2 entry 3x3
        g += S2 * S2 * 64 * 128                    # ds 1x1
    g += S2 * S2 * 9 * 128 * 128 * 3               # st2: entry conv2 + blk2
    g += S3 * S3 * (9 * 128 * 256 + 128 * 256 + 9 * 256 * 256 * 3)
    g += S4 * S4 * (9 * 256 * 512 + 256 * 512 + 9 * 512 * 512 * 3)
    return g / 1e9


def emit(out, row):
    row = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **row}
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    from bench import wait_for_healthy_device

    wait_for_healthy_device()

    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.quantize import quantize_resnet
    from deephisto_tpu.predict.fcn import (
        fcn_equivalent_patches,
        predict_full_fcn,
        stage_for_fcn,
    )

    out = Path(__file__).with_name(f"fcn_mfu_{jax.default_backend()}.jsonl")

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    rng = np.random.default_rng(0)
    calib = [rng.random((8, 224, 224, 3), np.float32) for _ in range(2)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)

    n_tiles = (HW // TILE) ** 2
    gmacs_exec = fcn_r18_tile_gmacs(TILE, HALO, packed=True) * n_tiles
    gmacs_orig = fcn_r18_tile_gmacs(TILE, HALO, packed=False) * n_tiles
    gmacs_useful = fcn_r18_tile_gmacs(TILE, 0, packed=False) * n_tiles
    eq = fcn_equivalent_patches(HW, HW)

    slide = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    staged8 = stage_for_fcn(slide, tile=TILE, halo=HALO, pack=8)
    float(jnp.sum(staged8.packed[0, 0].astype(jnp.float32)))
    emit(out, {"case": "stage_slide_pack8_s",
               "s": round(time.perf_counter() - t0, 2)})

    # ---- 1. end-to-end MFU rows -----------------------------------------
    def best_of(fn, n=4):
        fn()
        b = float("inf")
        for _ in range(n):
            t1 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t1)
        return b

    def run_int8():
        predict_full_fcn(staged8, qmodel, qvars, n_classes=5, tile=TILE,
                         halo=HALO, tile_batch=TB)

    b = best_of(run_int8)
    emit(out, {
        "case": "fcn_mfu_int8", "best_s": round(b, 4),
        "equiv_patches_per_s": round(eq / b, 1),
        "exec_tops": round(2 * gmacs_exec / b / 1e3, 1),
        "pct_int8_peak": round(2 * gmacs_exec / b / 1e3 / PEAK_INT8_TOPS * 100, 1),
        "orig_equiv_tops": round(2 * gmacs_orig / b / 1e3, 1),
        "useful_tops": round(2 * gmacs_useful / b / 1e3, 1),
        "gmacs": {"exec": round(gmacs_exec, 1), "orig": round(gmacs_orig, 1),
                  "useful_nohalo": round(gmacs_useful, 1)},
    })

    # bf16 comparison row (same staging benefit: pack=4 staged, float model)
    staged4 = stage_for_fcn(slide, tile=TILE, halo=HALO, pack=4)
    float(jnp.sum(staged4.packed[0, 0].astype(jnp.float32)))

    def run_bf16():
        predict_full_fcn(staged4, model, variables, n_classes=5, tile=TILE,
                         halo=HALO, tile_batch=TB)

    b = best_of(run_bf16)
    emit(out, {
        "case": "fcn_mfu_bf16", "best_s": round(b, 4),
        "equiv_patches_per_s": round(eq / b, 1),
        "exec_tflops": round(2 * gmacs_orig / b / 1e3, 1),
        "pct_bf16_peak": round(
            2 * gmacs_orig / b / 1e3 / PEAK_BF16_TFLOPS * 100, 1),
    })
    del staged4

    # ---- 2. cut ladder at the headline config (s2d8) --------------------
    from deephisto_tpu.predict.fcn import FEATURE_STRIDE, tile_logits
    from deephisto_tpu.predict.pipeline import model_input

    fs = FEATURE_STRIDE
    ty = tx = HW // TILE
    n_steps = n_tiles // TB
    idx = np.arange(n_tiles).reshape(n_steps, TB)
    ft = TILE // fs
    hh = HALO // fs
    pk = 8
    fck = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)
    packed = staged8.packed

    # per-cut executed GMACs (cumulative) for per-stage achieved TOPS
    P = TILE + 2 * HALO
    s_ = P // 4
    A, B_ = s_ // 2 + 1, s_ // 2
    S2, S3, S4 = s_ // 2, s_ // 4, s_ // 8
    g_stem = A * A * 4 * 192 * 256 / 1e9
    g_l1 = 2 * (B_ * B_ + A * A) * 4 * 256 * 256 / 1e9
    g_l2e = (B_ * B_ * 4 * 256 * 128 + S2 * S2 * (256 * 128 + 9 * 128 * 128)) / 1e9
    g_l2b2 = S2 * S2 * 9 * 128 * 128 * 2 / 1e9
    g_l3 = S3 * S3 * (9 * 128 * 256 + 128 * 256 + 9 * 256 * 256 * 3) / 1e9
    g_l4 = S4 * S4 * (9 * 256 * 512 + 256 * 512 + 9 * 512 * 512 * 3) / 1e9
    cum = {
        "slice": 0.0, "quant": 0.0, "stem": g_stem, "l1": g_stem + g_l1,
        "l2_entry": g_stem + g_l1 + g_l2e,
        "layer3": g_stem + g_l1 + g_l2e + g_l2b2 + g_l3,
        "layer4": g_stem + g_l1 + g_l2e + g_l2b2 + g_l3 + g_l4,
        "features": g_stem + g_l1 + g_l2e + g_l2b2 + g_l3 + g_l4,
        "project": g_stem + g_l1 + g_l2e + g_l2b2 + g_l3 + g_l4,
    }

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
                if cut == "slice":
                    y = xin
                elif cut == "project":
                    y = tile_logits(
                        qmodel, qv, xin, hh, ft, fck, pre_packed="s2d8"
                    )
                else:
                    y = qmodel.apply(
                        qv, model_input(qmodel, xin), pre_packed="s2d8",
                        features=(cut == "features"),
                        up_to=None if cut == "features" else cut,
                    )
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.asarray(idx))
            return acc

        return program

    cuts = ["slice", "quant", "stem", "l1", "l2_entry", "layer3", "layer4",
            "features", "project"]
    best = {}
    for cut in cuts:
        prog = make_cut_program(cut)
        tC = time.perf_counter()
        float(prog(packed, qvars))
        warm = time.perf_counter() - tC
        bb = float("inf")
        for _ in range(4):
            t1 = time.perf_counter()
            float(prog(packed, qvars))
            bb = min(bb, time.perf_counter() - t1)
        best[cut] = bb
        emit(out, {"case": f"cut8_{cut}", "best_s": round(bb, 4),
                   "compile_or_warm_s": round(warm, 1)})
    diffs, tops = {}, {}
    for a, b2 in zip(cuts, cuts[1:]):
        d = best[b2] - best[a]
        diffs[b2] = round(d, 4)
        dg = (cum[b2] - cum[a]) * n_tiles
        if dg > 0 and d > 1e-4:
            tops[b2] = round(2 * dg / d / 1e3, 1)
    emit(out, {"case": "stage_diffs8_s", **diffs})
    emit(out, {"case": "stage_tops8", **tops,
               "note": "executed dense TOPS per stage from cut diffs; "
                       "int8 peak 394"})
    del packed, staged8, slide

    # ---- 3. stage-1 rate isolation at real shapes -----------------------
    def diff_time(fn, reps):
        float(fn(1))
        t0 = time.perf_counter(); float(fn(reps)); t1 = time.perf_counter()
        float(fn(2 * reps)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    q1 = qvars["params"]["layer1_0/conv1"]
    q2 = qvars["params"]["layer1_0/conv2"]
    from deephisto_tpu.models.quantize import (
        _edge_masks_a,
        _embed_kernel,
        _PACK_PAD,
    )

    Ka = _embed_kernel(q1["kernel_q"], "a2b")   # (2,2,256,256) int8
    Kb = _embed_kernel(q2["kernel_q"], "b2a")
    dq1 = jnp.tile(q1["dequant"], 4)
    dq2 = jnp.tile(q2["dequant"], 4)
    b1 = jnp.tile(q1["bias"], 4)
    b2 = jnp.tile(q2["bias"], 4)
    inv_n = qvars["params"]["layer1_1/conv1"]["in_inv_scale"]
    inv_2 = q2["in_inv_scale"]

    def conv(x, K, pad):
        return jax.lax.conv_general_dilated(
            x, K, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def pair_ops(Aext, Bext, tb):
        return 2 * tb * (Bext * Bext + Aext * Aext) * 4 * 256 * 256

    def make_pair(epi, Aext=137, tb=TB):
        xa0 = jnp.asarray(
            rng.integers(-100, 100, (tb, Aext, Aext, 256)), jnp.int8
        )

        @jax.jit
        def loop(reps, xa0=xa0):
            def body(i, xa):
                yb = epi(conv(xa, Ka, _PACK_PAD["a2b"]), dq1 * inv_2, b1 * inv_2)
                ya = epi(conv(yb, Kb, _PACK_PAD["b2a"]), dq2 * inv_n, b2 * inv_n)
                return ya

            return jax.lax.fori_loop(0, reps, body, xa0).astype(
                jnp.float32).mean()

        return loop

    def epi_trunc(y32, dq, bias):
        return y32.astype(jnp.int8)

    def epi_shift(y32, dq, bias):
        return jnp.clip(y32 >> 7, -127, 127).astype(jnp.int8)

    def epi_f32(y32, dq, bias):
        y = y32.astype(jnp.float32) * dq + bias
        return jnp.clip(jnp.round(jax.nn.relu(y)), -127, 127).astype(jnp.int8)

    cases = [
        ("pair_trunc", make_pair(epi_trunc), pair_ops(137, 136, TB)),
        ("pair_shift", make_pair(epi_shift), pair_ops(137, 136, TB)),
        ("pair_f32", make_pair(epi_f32), pair_ops(137, 136, TB)),
        ("pair_shift_even", make_pair(epi_shift, Aext=145),
         pair_ops(145, 144, TB)),
        ("pair_shift_tb8_144", make_pair(epi_shift, Aext=145, tb=8),
         pair_ops(145, 144, 8)),
    ]

    # the real block body (bf16 residual carry + masks), as in apply()
    row_m, col_m = _edge_masks_a(137, 137, 64, jnp.float32)

    def make_block(int8_res):
        xa0 = jnp.asarray(rng.integers(-100, 100, (TB, 137, 137, 256)), jnp.int8)
        xbf0 = jnp.asarray(
            rng.standard_normal((TB, 137, 137, 256)) * 0.1, jnp.bfloat16
        )

        @jax.jit
        def loop(reps, xa0=xa0, xbf0=xbf0):
            def body(i, carry):
                x8p, xbf = carry
                h8 = epi_f32(conv(x8p, Ka, _PACK_PAD["a2b"]),
                             dq1 * inv_2, b1 * inv_2)
                y = conv(h8, Kb, _PACK_PAD["b2a"]).astype(jnp.float32)
                y = y * dq2 + b2
                if int8_res:
                    res = x8p.astype(jnp.float32) * (1.0 / inv_2)
                else:
                    res = xbf.astype(jnp.float32)
                o = jax.nn.relu(y + res) * row_m * col_m
                nbf = o.astype(jnp.bfloat16)
                n8 = jnp.clip(jnp.round(o * inv_n), -127, 127).astype(jnp.int8)
                return (n8, nbf)

            n8, nbf = jax.lax.fori_loop(0, reps, body, (xa0, xbf0))
            return n8.astype(jnp.float32).mean() + nbf.astype(jnp.float32).mean()

        return loop

    cases.append(("block_real", make_block(False), pair_ops(137, 136, TB)))
    cases.append(("block_int8res", make_block(True), pair_ops(137, 136, TB)))

    for label, loop, ops in cases:
        reps = max(16, int(0.2 / max(ops / 250e12, 1e-5)))
        try:
            dt = diff_time(loop, reps)
            emit(out, {"case": label, "reps": reps,
                       "s_per_iter": round(dt, 6),
                       "tops": round(ops / dt / 1e12, 1)})
        except Exception as e:  # noqa: BLE001
            emit(out, {"case": label, "error": str(e)[:200]})

    # ---- 4. epilogue-only bandwidth -------------------------------------
    x8 = jnp.asarray(rng.integers(-100, 100, (TB, 136, 136, 256)), jnp.int8)

    @jax.jit
    def epi_loop(reps, x8=x8):
        def body(i, x):
            y32 = x.astype(jnp.int32)  # stands in for the conv accumulator
            return epi_f32(y32, dq1, b1)

        return jax.lax.fori_loop(0, reps, body, x8).astype(jnp.float32).mean()

    n_el = int(np.prod(x8.shape))
    reps = max(16, int(0.2 / max(n_el * 2 / 800e9, 1e-5)))
    dt = diff_time(epi_loop, reps)
    emit(out, {"case": "epi_only", "reps": reps, "s_per_iter": round(dt, 6),
               "gb_per_s_at_2B_per_el": round(n_el * 2 / dt / 1e9, 1),
               "note": "int8 in->int8 out via f32 epilogue; 2 B/el is the "
                       "in+out byte floor"})


if __name__ == "__main__":
    main()
