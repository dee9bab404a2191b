"""Serving daemon tests (deephisto_tpu/serve/): engine parity with the
direct predict calls, HTTP wire contract, staging LRU, checkpoint loading.

Runs a real ThreadingHTTPServer on a loopback port with a tiny ResNet —
what the daemon returns over the wire must equal what the library returns
in-process (the engine is a thin stateful shell over the same fused
programs; any drift is a bug)."""

import io
import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.models.resnet import BasicBlock, ResNet
from deephisto_tpu.predict import predict_full_fused
from deephisto_tpu.predict.fcn import predict_full_fcn
from deephisto_tpu.serve import ServingEngine
from deephisto_tpu.serve.server import serve_in_thread

H, W = 160, 130
PS = 64
NC = 5
FCN = dict(tile=64, halo=32, tile_batch=2)


@pytest.fixture(scope="module")
def model_vars():
    model = ResNet(
        stage_sizes=(1, 1, 1, 1), block_cls=BasicBlock, num_classes=NC,
        num_filters=8, stem="s2d",
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    return model, variables


@pytest.fixture(scope="module")
def cfg():
    return {
        "model": {"n_classes": NC, "depth": 18, "stem": "s2d"},
        "dataset": {"patch_size": PS},
    }


@pytest.fixture(scope="module")
def engine(model_vars, cfg):
    model, variables = model_vars
    return ServingEngine(model, variables, cfg, **FCN)


@pytest.fixture(scope="module")
def image():
    return np.random.default_rng(11).integers(0, 255, (H, W, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def http(engine):
    srv, base = serve_in_thread(engine)
    yield base
    srv.shutdown()


def _post(url, body, content_type="application/x-npy", method="POST"):
    req = urllib.request.Request(
        url, data=body, method=method,
        headers={"Content-Type": content_type} if body is not None else {},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


# --------------------------------------------------------------------------
# engine-level parity


@pytest.mark.smoke
def test_fcn_mode_matches_direct_call(engine, model_vars, image):
    model, variables = model_vars
    amap, meta = engine.predict_slide(image, mode="fcn")
    ref, _ = predict_full_fcn(
        image, model, variables, NC, patch_size=PS, **FCN
    )
    np.testing.assert_array_equal(amap, np.asarray(ref, np.uint8))
    assert amap.dtype == np.uint8
    assert meta["mode"] == "fcn" and meta["h"] == H and meta["w"] == W


def test_dense_mode_matches_direct_call(engine, model_vars, image):
    model, variables = model_vars
    amap, meta = engine.predict_slide(image, mode="dense")
    ref, _ = predict_full_fused(image, model, variables, NC, patch_size=PS)
    np.testing.assert_array_equal(amap, np.asarray(ref, np.uint8))
    assert meta["mode"] == "dense"


def test_random_mode_runs(engine, image):
    amap, meta = engine.predict_slide(image, mode="random")
    assert amap.dtype == np.uint8 and amap.shape == meta_shape(meta)


def meta_shape(meta):
    return tuple(meta["map_shape"])


def test_patch_predict_matches_model(engine, model_vars):
    model, variables = model_vars
    img = np.random.default_rng(3).integers(0, 255, (PS, PS, 3), dtype=np.uint8)
    out = engine.predict_patch(img)
    logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(img[None]).astype(jnp.float32) / 255.0, train=False,
    )
    assert out["class"] == int(jnp.argmax(logits, -1)[0])
    assert len(out["probs"]) == NC
    np.testing.assert_allclose(sum(out["probs"]), 1.0, atol=1e-3)


def test_patch_resizes_arbitrary_input(engine):
    img = np.random.default_rng(4).integers(0, 255, (100, 80, 3), dtype=np.uint8)
    out = engine.predict_patch(img)
    assert 0 <= out["class"] < NC


def test_staged_slide_matches_unstaged(engine, image):
    engine.stage_slide("s1", image)
    assert engine._staged["s1"].tiles is not None  # pre_tile under the cutoff
    amap_staged, _ = engine.predict_slide(key="s1", mode="fcn")
    amap, _ = engine.predict_slide(image, mode="fcn")
    np.testing.assert_array_equal(amap_staged, amap)


def test_giant_slide_stages_untiled(engine, image, monkeypatch):
    # above PRE_TILE_MAX_PIXELS the engine must fall back to the untiled
    # staging (raw+packed+tile grid co-reside ~3x slide bytes during
    # pre-tiling and OOM v5e HBM at 32768² — fcn_tiled_tpu.jsonl); the
    # untiled path is bit-equal, so the map must not change
    import deephisto_tpu.serve.engine as eng_mod

    monkeypatch.setattr(eng_mod, "PRE_TILE_MAX_PIXELS", 1)
    engine.stage_slide("giant", image)
    st = engine._staged["giant"]
    assert st.tiles is None and st.packed is not None
    amap_staged, _ = engine.predict_slide(key="giant", mode="fcn")
    amap, _ = engine.predict_slide(image, mode="fcn")
    np.testing.assert_array_equal(amap_staged, amap)


def test_stage_lru_evicts(model_vars, cfg, image):
    model, variables = model_vars
    eng = ServingEngine(model, variables, cfg, max_staged_slides=2, **FCN)
    for k in ("a", "b", "c"):
        eng.stage_slide(k, image)
    assert list(eng.info()["staged_slides"]) == ["b", "c"]
    with pytest.raises(KeyError):
        eng.predict_slide(key="a", mode="fcn")
    assert eng.evict_slide("b") and not eng.evict_slide("b")


def test_input_validation(engine, image):
    with pytest.raises(ValueError):
        engine.predict_slide(image, mode="nope")
    with pytest.raises(ValueError):
        engine.predict_slide()  # neither image nor key
    with pytest.raises(ValueError):
        engine.predict_slide(image.astype(np.float32))  # not uint8
    with pytest.raises(ValueError):
        engine.predict_slide(image, key="s1")  # both


# --------------------------------------------------------------------------
# HTTP wire contract


def test_http_healthz_and_model(http, engine):
    st, _, body = _post(http + "/healthz", None, method="GET")
    assert st == 200 and json.loads(body)["ok"] is True
    st, _, body = _post(http + "/v1/model", None, method="GET")
    info = json.loads(body)
    assert st == 200
    assert info["n_classes"] == NC and info["patch_size"] == PS
    assert info["default_mode"] == "fcn"


def test_http_patch_roundtrip(http, engine):
    img = np.random.default_rng(3).integers(0, 255, (PS, PS, 3), dtype=np.uint8)
    st, _, body = _post(http + "/v1/patch", _npy(img))
    out = json.loads(body)
    assert st == 200
    assert out == engine.predict_patch(img)


def test_http_patch_accepts_png(http, engine):
    from PIL import Image

    img = np.random.default_rng(5).integers(0, 255, (PS, PS, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    st, _, body = _post(http + "/v1/patch", buf.getvalue(), "image/png")
    assert st == 200
    assert json.loads(body) == engine.predict_patch(img)


def test_http_slide_npy_roundtrip(http, engine, model_vars, image):
    model, variables = model_vars
    st, headers, body = _post(http + "/v1/slide?mode=fcn", _npy(image))
    assert st == 200
    assert headers["Content-Type"] == "application/x-npy"
    meta = json.loads(headers["X-DeepHisto-Meta"])
    amap = np.load(io.BytesIO(body))
    ref, _ = predict_full_fcn(image, model, variables, NC, patch_size=PS, **FCN)
    np.testing.assert_array_equal(amap, np.asarray(ref, np.uint8))
    assert meta["h"] == H and meta["w"] == W


def test_http_slide_json_format(http, image):
    st, _, body = _post(http + "/v1/slide?mode=fcn&format=json", _npy(image))
    out = json.loads(body)
    assert st == 200
    assert np.asarray(out["class_map"]).shape == tuple(out["meta"]["map_shape"])


def test_http_stage_then_predict_by_key(http, engine, image):
    st, _, body = _post(http + "/v1/stage?key=ws1", _npy(image))
    assert st == 200 and "ws1" in json.loads(body)["staged"]
    st, headers, body = _post(http + "/v1/slide?key=ws1", b"")
    assert st == 200
    amap_direct, _ = engine.predict_slide(image, mode="fcn")
    np.testing.assert_array_equal(np.load(io.BytesIO(body)), amap_direct)
    st, _, body = _post(http + "/v1/stage/ws1", None, method="DELETE")
    assert st == 200 and json.loads(body)["evicted"] == "ws1"


def test_http_slide_from_path(http, engine, image, tmp_path_factory):
    from deephisto_tpu.slide.dhs import write_dhs

    path = tmp_path_factory.mktemp("serve") / "slide.dhs"
    write_dhs(image, path, max_layer=2)
    req = json.dumps({"path": str(path), "layer": 1}).encode()
    st, _, body = _post(http + "/v1/slide?mode=fcn", req, "application/json")
    assert st == 200
    amap_direct, _ = engine.predict_slide(image, mode="fcn")
    np.testing.assert_array_equal(np.load(io.BytesIO(body)), amap_direct)


def test_http_errors(http):
    st, _, body = _post(http + "/v1/nope", b"")
    assert st == 404
    st, _, body = _post(http + "/v1/patch", b"garbage")
    assert st == 400 and "npy" in json.loads(body)["error"]
    st, _, body = _post(http + "/v1/slide?key=missing", b"")
    assert st == 400
    st, _, body = _post(http + "/v1/stage", _npy(np.zeros((4, 4, 3), np.uint8)))
    assert st == 400  # binary stage without ?key=


# --------------------------------------------------------------------------
# checkpoint loading


def test_from_checkpoint(tmp_path):
    import yaml

    from deephisto_tpu.models.patch_cls_simple.model import get_model
    from deephisto_tpu.train.checkpoint import save_model

    # a REAL factory-built r18 (what the trainer checkpoints), so the
    # restored tree matches the model from_checkpoint rebuilds
    real = get_model(NC, depth=18, stem="s2d")
    rv = real.init(jax.random.key(1), jnp.zeros((1, PS, PS, 3)))
    ckpt = tmp_path / "best_model.msgpack"
    save_model(ckpt, rv["params"], rv["batch_stats"])
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "model": {"n_classes": NC, "depth": 18, "stem": "s2d"},
        "dataset": {"patch_size": PS},
    }))
    eng = ServingEngine.from_checkpoint(cfg_path, ckpt, **FCN)
    img = np.random.default_rng(9).integers(0, 255, (PS, PS, 3), dtype=np.uint8)
    out = eng.predict_patch(img)
    ref = real.apply(
        {"params": rv["params"], "batch_stats": rv["batch_stats"]},
        jnp.asarray(img[None]).astype(jnp.float32) / 255.0, train=False,
    )
    assert out["class"] == int(jnp.argmax(ref, -1)[0])


def test_from_checkpoint_orbax_dir(tmp_path):
    """A mesh-scale training artifact (orbax checkpoint DIRECTORY,
    train/orbax_ckpt.py) serves directly: from_checkpoint detects the dir and
    does a weights-only restore of the latest step."""
    import yaml

    from deephisto_tpu.models.patch_cls_simple.model import get_model
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.train import orbax_ckpt as oc

    real = get_model(NC, depth=18, stem="s2d")
    rv = real.init(jax.random.key(1), jnp.zeros((1, PS, PS, 3)))
    state = create_train_state(real, rv, learning_rate=1e-3)
    ckpt_dir = tmp_path / "orbax"
    mgr = oc.checkpoint_manager(ckpt_dir, async_save=False)
    oc.save_train_state(mgr, 5, state, epoch=2)
    mgr.close()

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "model": {"n_classes": NC, "depth": 18, "stem": "s2d"},
        "dataset": {"patch_size": PS},
    }))
    eng = ServingEngine.from_checkpoint(cfg_path, ckpt_dir, **FCN)
    img = np.random.default_rng(9).integers(0, 255, (PS, PS, 3), dtype=np.uint8)
    out = eng.predict_patch(img)
    ref = real.apply(
        {"params": rv["params"], "batch_stats": rv["batch_stats"]},
        jnp.asarray(img[None]).astype(jnp.float32) / 255.0, train=False,
    )
    assert out["class"] == int(jnp.argmax(ref, -1)[0])
    np.testing.assert_allclose(
        out["probs"], np.asarray(jax.nn.softmax(ref, -1)[0], np.float32),
        atol=1e-5,
    )


def test_patch_request_coalescing(model_vars, cfg):
    """Concurrent predict_patch calls must coalesce into few LANES-wide
    dispatches (engine._PatchBatcher) and return exactly the per-patch
    results of the sequential path."""
    import threading

    model, variables = model_vars
    eng = ServingEngine(model, variables, cfg, patch_lanes=8,
                        patch_wait_ms=50.0, **FCN)
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (PS, PS, 3), dtype=np.uint8)
            for _ in range(16)]

    sequential = [eng.predict_patch(im) for im in imgs]  # builds the program

    dispatches = []
    inner = eng._patch_batcher._run

    def counting(batch):
        dispatches.append(len(batch))
        return inner(batch)

    eng._patch_batcher._run = counting
    results = [None] * len(imgs)
    barrier = threading.Barrier(len(imgs))

    def worker(i):
        barrier.wait()
        results[i] = eng.predict_patch(imgs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for seq, conc in zip(sequential, results):
        assert seq["class"] == conc["class"]
        np.testing.assert_allclose(seq["probs"], conc["probs"], atol=1e-5)
    assert sum(dispatches) == 16
    assert len(dispatches) <= 4, (
        f"16 concurrent requests took {len(dispatches)} dispatches "
        f"({dispatches}) — coalescing is not happening"
    )
    assert max(dispatches) <= 8


def test_patch_batcher_surfaces_errors():
    """A failing batch program must raise in every waiting request, not hang
    or kill the daemon thread."""
    from deephisto_tpu.serve.engine import _PatchBatcher

    calls = []

    def run(batch):
        calls.append(len(batch))
        if len(calls) == 1:
            raise RuntimeError("boom")
        return np.ones((len(batch), 2), np.float32)

    b = _PatchBatcher(run, lanes=4, wait_ms=1.0)
    with pytest.raises(RuntimeError, match="boom"):
        b.submit(np.zeros((4, 4, 3), np.uint8))
    # the daemon thread survived and serves the next request
    out = b.submit(np.zeros((4, 4, 3), np.uint8))
    assert out.shape == (2,)


# --------------------------------------------------------------------------
# int8 serving + ViT fallback


def test_int8_engine_fcn(model_vars, cfg, image):
    model, variables = model_vars
    calib = np.random.default_rng(0).integers(
        0, 255, (8, PS, PS, 3), dtype=np.uint8
    )
    eng = ServingEngine(model, variables, cfg, int8=True, calib=calib, **FCN)
    assert eng.info()["int8"] is True
    amap, meta = eng.predict_slide(image, mode="fcn")
    assert meta["int8"] is True
    assert amap.dtype == np.uint8 and amap.shape == tuple(meta["map_shape"])
    # the pack_l1 and exact int8 variants are bit-identical by construction
    # (models/quantize.py pack_l1 docstring) — serving must honor that
    amap2, _ = eng.predict_slide(image, mode="dense")
    assert amap2.dtype == np.uint8


def test_int8_engine_stages_pack8(model_vars, cfg, image):
    # pack_l1-quantized fcn serving consumes the pack=8 ("s2d8") staging —
    # the headline path; staged and unstaged maps must agree bit-exactly
    model, variables = model_vars
    calib = np.random.default_rng(0).integers(
        0, 255, (8, PS, PS, 3), dtype=np.uint8
    )
    eng = ServingEngine(model, variables, cfg, int8=True, calib=calib, **FCN)
    assert eng.qmodel_fcn.pack_l1 is True
    eng.stage_slide("p8", image)
    assert eng._staged["p8"].pack == 8
    amap_staged, _ = eng.predict_slide(key="p8", mode="fcn")
    amap, _ = eng.predict_slide(image, mode="fcn")
    np.testing.assert_array_equal(amap_staged, amap)


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~26s engine build; the pack_l1 gating logic is also unit-covered
def test_int8_engine_bottleneck_skips_pack_l1(cfg, image):
    # r50-family (Bottleneck) has no packed stage 1 — int8 serving must not
    # crash at init (it did: pack_l1=True unconditionally) and must serve
    # fcn unpacked, staging at pack=4
    from deephisto_tpu.models.resnet import Bottleneck

    model = ResNet(
        stage_sizes=(1, 1, 1, 1), block_cls=Bottleneck, num_classes=NC,
        num_filters=8, stem="s2d",
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    calib = np.random.default_rng(0).integers(
        0, 255, (4, PS, PS, 3), dtype=np.uint8
    )
    eng = ServingEngine(model, variables, cfg, int8=True, calib=calib, **FCN)
    assert eng.qmodel_fcn.pack_l1 is False
    eng.stage_slide("b", image)
    assert eng._staged["b"].pack == 4
    amap_staged, _ = eng.predict_slide(key="b", mode="fcn")
    amap, meta = eng.predict_slide(image, mode="fcn")
    assert meta["int8"] is True
    np.testing.assert_array_equal(amap_staged, amap)


def test_stage_requires_s2d_stem(cfg, image):
    # a standard-stem model cannot consume the s2d-packed staging — the
    # engine must refuse loudly at stage time, not fail inside predict
    model = ResNet(
        stage_sizes=(1, 1, 1, 1), block_cls=BasicBlock, num_classes=NC,
        num_filters=8, stem="imagenet",
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    icfg = {"model": {"n_classes": NC, "depth": 18, "stem": "imagenet"},
            "dataset": {"patch_size": PS}}
    eng = ServingEngine(model, variables, icfg, **FCN)
    with pytest.raises(ValueError, match="s2d"):
        eng.stage_slide("k", image)
    amap, _ = eng.predict_slide(image, mode="fcn")  # unstaged path still fine
    assert amap.dtype == np.uint8


def test_vit_engine_falls_back_to_dense(image):
    from deephisto_tpu.models.vit import ViT

    model = ViT(num_classes=NC, patch=16, dim=32, depth=1, heads=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    vcfg = {"model": {"n_classes": NC, "arch": "vit"},
            "dataset": {"patch_size": PS}}
    eng = ServingEngine(model, variables, vcfg, mode="fcn")
    assert eng.default_mode == "dense"  # fcn needs a conv feature map
    assert "fcn" not in eng.info()["modes"]
    with pytest.raises(ValueError):
        eng.predict_slide(image, mode="fcn")
    amap, meta = eng.predict_slide(image, mode="dense")
    assert amap.dtype == np.uint8 and meta["mode"] == "dense"
    with pytest.raises(ValueError):
        eng.stage_slide("k", image)


def test_over_budget_routes_to_streamed(model_vars, cfg, image):
    model, variables = model_vars
    eng = ServingEngine(model, variables, cfg, stream_above_bytes=1, **FCN)
    amap_s, meta = eng.predict_slide(image, mode="fcn")
    assert meta["streamed"] is True
    resident = ServingEngine(model, variables, cfg, **FCN)
    amap_r, meta_r = resident.predict_slide(image, mode="fcn")
    assert meta_r["streamed"] is False
    # the streamed program's contract is bit-identical maps (streaming.py)
    np.testing.assert_array_equal(amap_s, amap_r)
