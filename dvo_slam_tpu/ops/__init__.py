"""Device-side math ops (jax.numpy + Pallas)."""
