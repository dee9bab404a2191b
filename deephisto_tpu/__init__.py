"""deephisto_tpu — a TPU-native framework for histological whole-slide-image analysis.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of xubiker/deephisto:
gigapixel pyramidal slide I/O, polygonal class annotations, four patch-sampling
strategies (random/dense over annotated regions, random/dense over whole
slides), patch-classifier training, and full-WSI sliding-window inference with
stitched class maps — with sampling, preprocessing and compute running
on-device and scaled over a ``jax.sharding.Mesh``.

Layer map (bottom → top), mirroring the reference's five layers
(see /root/repo/SURVEY.md §1):

    L0  slide/      pyramidal slide I/O (synthetic, in-memory, on-disk tiled)
    L1  anno/       annotation classes, palette, visualization
        geometry/   exact polygon math (host numpy + device jnp)
    L2  samplers/   the four patch samplers, on-device coordinate generation
        ops/        Pallas/XLA kernels: patch gather, stitch, weighted sampling
    L3  models/     flax ResNet family + patch_cls_simple training program
        train/      train state, plateau LR, checkpointing, metrics
    L4  predict/    full-WSI inference; examples/ CLI shims at repo root
        parallel/   mesh construction + sharding rules
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: TPU compiles of the fused pipelines
    take minutes through remote-compile tunnels; caching makes every CLI rerun
    start hot. Opt out with DEEPHISTO_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("DEEPHISTO_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        # one cache per platform: CPU AOT executables compiled by a remote
        # helper carry target features the local host may lack (SIGILL risk
        # if a TPU-session CPU artifact is loaded by a plain-CPU session)
        platform = os.environ.get("JAX_PLATFORMS", "tpu").split(",")[0] or "tpu"
        suffix = platform
        if platform == "cpu":
            # CPU AOT executables bake in the compile host's ISA AND model
            # tuning features (+prefer-no-gather etc.) that /proc/cpuinfo
            # flags alone don't capture; loading another host's artifact
            # risks SIGILL (observed: avx512/amx mismatch warnings from
            # cpu_aot_loader even with flags-salted dirs, MULTICHIP_r03).
            # Salt v2: hash flags + model name + microcode, and purge the
            # pre-v2 generations so stale cross-VM artifacts never load.
            try:
                import hashlib

                with open("/proc/cpuinfo") as f:
                    keys = ("flags", "model name", "microcode")
                    ident = "".join(ln for ln in f if ln.startswith(keys))
                suffix += "_v2_" + hashlib.sha1(ident.encode()).hexdigest()[:8]
            except OSError:
                pass
        base = os.path.expanduser("~/.cache/deephisto_tpu")
        cache_dir = os.environ.get(
            "DEEPHISTO_COMPILE_CACHE", os.path.join(base, f"jax_cache_{suffix}")
        )
        if platform == "cpu" and "DEEPHISTO_COMPILE_CACHE" not in os.environ:
            # one-time migration: drop only pre-v2 generations (no host
            # fingerprint in the name). v2 dirs of OTHER hosts sharing the
            # cache base are valid for those hosts — leave them alone.
            import glob
            import shutil

            for stale in glob.glob(os.path.join(base, "jax_cache_cpu*")):
                name = os.path.basename(stale)
                if not name.startswith("jax_cache_cpu_v2_"):
                    shutil.rmtree(stale, ignore_errors=True)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
