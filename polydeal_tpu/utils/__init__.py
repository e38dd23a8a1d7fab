from polydeal_tpu.utils.static import StaticArray, wrap_static, unwrap_static

__all__ = ["StaticArray", "wrap_static", "unwrap_static"]
