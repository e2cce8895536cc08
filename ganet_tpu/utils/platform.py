"""Backend/platform selection helpers.

Some environments (including this build box) pre-register a TPU PJRT
plugin in sitecustomize and force JAX_PLATFORMS before user code runs, so
the env var alone cannot select a backend.  `apply_platform_overrides()`
gives CLIs an escape hatch: set GANET_PLATFORM=cpu (optionally
GANET_FAKE_DEVICES=8) to run anywhere via the jax config API, which wins
over the latched env var as long as the target backend hasn't been
initialized yet."""

from __future__ import annotations

import os


def apply_platform_overrides(
    platform: str | None = None, fake_devices: int | None = None
) -> None:
    import jax

    platform = platform or os.environ.get("GANET_PLATFORM")
    fake = fake_devices or int(os.environ.get("GANET_FAKE_DEVICES", "0"))
    if fake and platform in (None, "cpu"):
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={fake}"
            ).strip()
        platform = "cpu"
    if platform:
        jax.config.update("jax_platforms", platform)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache (big-model compiles take minutes,
    both on the 2-core CPU and through the remote-TPU tunnel).

    The cache is keyed per backend platform: entries written through the
    remote-TPU tunnel can carry the REMOTE host's CPU feature set, and
    loading those in a local CPU process warns about (and risks) SIGILL.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "GANET_COMPILE_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
    )
    cache_dir = os.path.join(os.path.abspath(cache_dir), jax.default_backend())
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
