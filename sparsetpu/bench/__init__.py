

def configure_cache():
    """Enable the persistent XLA compile cache (remote compiles through the
    tunnel cost 60-300 s each; the cache makes re-runs start warm)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
