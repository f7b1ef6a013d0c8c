"""Device-mesh sharding: batch-DP over frames, spatial sharding for 4K."""

from .mesh import (chain_band_halo, chain_band_halo_stateful, frame_mesh,
                   grid_batch_fn, grid_mesh, shard_layer_batch,
                   sharded_batch_fn, spatial_batch_fn, spatial_blur_sharded,
                   spatial_stateful_fn)
