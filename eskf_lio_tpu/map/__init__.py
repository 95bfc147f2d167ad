"""The device-resident voxel-hash local map."""

from eskf_lio_tpu.map.voxel_map import VoxelMap

__all__ = ["VoxelMap"]
