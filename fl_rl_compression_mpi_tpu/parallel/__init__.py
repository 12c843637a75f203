"""Distribution: device meshes, shard_map codec drivers, multi-host runtime."""
