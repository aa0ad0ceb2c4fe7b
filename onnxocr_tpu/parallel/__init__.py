"""Device-mesh sharding: dp x tp training and batched serving."""
