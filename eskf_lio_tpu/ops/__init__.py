"""Numeric building blocks: Lie-group math, voxel hashing, scan preprocessing
kernels.  Everything here is pure-functional jnp code (or a Pallas kernel with
a jnp fallback) over fixed-shape arrays — safe to use inside jit/shard_map."""
