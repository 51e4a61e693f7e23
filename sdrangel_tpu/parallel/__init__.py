"""Multi-device scaling: mesh construction, halo exchange, sharded banks."""
