"""Multi-chip parallel rendering over a jax.sharding.Mesh."""
