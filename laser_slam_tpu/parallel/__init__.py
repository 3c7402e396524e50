"""Fleet batching (vmap) and multi-chip sharding (Mesh/pjit)."""
