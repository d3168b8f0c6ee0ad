"""Repo-local persistent XLA compile cache setup, shared by the perf harnesses.

One definition instead of three copies (bench.py, tools/measure.py,
tools/ab_unet.py): the cache lives in <repo>/.cache/jax_bench because the
workspace survives across driver rounds while /tmp does not — a warm cache
turns the ~200 s UNet headline compile into a program load. Set through
jax.config, NOT the env var default: this environment's sitecustomize
imports jax before any script body runs, so JAX_COMPILATION_CACHE_DIR set
by the script would be read too late. A user-provided
JAX_COMPILATION_CACHE_DIR in the environment wins (it was set before
python started, so jax already honors it — we must not clobber it).
"""

import os


def setup_repo_compile_cache() -> str:
    """Point jax's persistent compile cache at <repo>/.cache/jax_bench
    (unless the user already chose a dir via JAX_COMPILATION_CACHE_DIR).
    Returns the directory in effect."""
    import jax

    user_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    cache_dir = user_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".cache", "jax_bench")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return cache_dir
