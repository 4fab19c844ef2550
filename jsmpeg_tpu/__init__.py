"""jsmpeg_tpu: a TPU-native MPEG1/MP2 decode engine.

Capability-equivalent to phoboslab/jsmpeg (MPEG-TS demux, MPEG1 video,
MP2 audio, players/sources/renderers), re-designed TPU-first: serial
bitstream parsing on host, batched integer transform/motion/color kernels
on device via JAX/XLA/Pallas, GOP- and tile-parallel scaling over device
meshes.
"""

__version__ = '0.1.0'


def _ensure_compile_cache() -> None:
    """Point jax at the persistent compilation cache even when the env var
    came too late.

    On this box the axon sitecustomize imports jax at interpreter startup,
    BEFORE any entry point's ``os.environ.setdefault('JAX_COMPILATION_
    CACHE_DIR', ...)`` runs -- so the config reads None and every
    tunneled-TPU compile (~100 s/variant) is silently re-paid in every
    process.  Setting the config value directly works at any point before
    the first compile.  Only fills in a default; an explicitly configured
    dir (env or jax.config) wins."""
    import os
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                'jax_compilation_cache_dir',
                os.environ.get('JAX_COMPILATION_CACHE_DIR',
                               os.path.expanduser('~/.cache/jax_comp')))
    except Exception:       # noqa: BLE001 -- jax absent/old: cache is moot
        pass


_ensure_compile_cache()
