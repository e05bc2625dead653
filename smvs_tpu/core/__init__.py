from smvs_tpu.core.camera import Camera, depth_mve_to_z, depth_z_to_mve
from smvs_tpu.core.synthetic import SyntheticScene, make_two_view_scene

__all__ = [
    "Camera",
    "depth_mve_to_z",
    "depth_z_to_mve",
    "SyntheticScene",
    "make_two_view_scene",
]
