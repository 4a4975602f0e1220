from ptsharp_tpu.accel import bvh, traverse

__all__ = ["bvh", "traverse"]
