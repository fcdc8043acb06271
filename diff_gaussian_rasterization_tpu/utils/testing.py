"""Test helpers."""


def enable_x64():
    """Context manager enabling float64, across JAX versions."""
    try:
        from jax.experimental import enable_x64 as ctx  # jax < 0.7
        return ctx()
    except ImportError:
        from jax._src.config import enable_x64 as ctx
        return ctx(True)
