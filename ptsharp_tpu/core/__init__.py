from ptsharp_tpu.core import vec, sampling, color, transform

__all__ = ["vec", "sampling", "color", "transform"]
