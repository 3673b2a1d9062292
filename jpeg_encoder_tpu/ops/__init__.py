"""Device-side (JAX/XLA/Pallas) compute ops of the TPU JPEG encoder."""
