"""TPU render engine: scene flattening, JAX wavefront kernels, packing."""
