"""Multi-device scaling: the voxel map partitioned over a jax.sharding.Mesh
with collective-reduced VGICP normal equations."""
