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
            # CPU AOT executables bake in the compile host's ISA features;
            # sessions land on heterogeneous VMs, and loading another host's
            # artifact risks SIGILL (observed: avx512/amx feature mismatch
            # warnings from cpu_aot_loader). Salt the dir per CPU type.
            try:
                import hashlib

                with open("/proc/cpuinfo") as f:
                    flags = next(
                        (ln for ln in f if ln.startswith("flags")), "")
                suffix += "_" + hashlib.sha1(flags.encode()).hexdigest()[:8]
            except OSError:
                pass
        cache_dir = os.environ.get(
            "DEEPHISTO_COMPILE_CACHE",
            os.path.expanduser(f"~/.cache/deephisto_tpu/jax_cache_{suffix}"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
