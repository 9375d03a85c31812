from chromosome3d_tpu.utils.logging import banner, get_logger

__all__ = ["banner", "get_logger"]
