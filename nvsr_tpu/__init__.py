"""nvsr_tpu — TPU-native Neural Volume Super-Resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
princeton-computational-imaging/Neural-Volume-Super-Resolution
(reference surveyed in SURVEY.md): multi-scene triplane NeRFs with shared
decoder MLPs and an EDSR-style feature-plane super-resolution network,
plus a Mip-NeRF / vanilla-NeRF baseline path.

Design (TPU-first, not a port):
  * All hot-path math is pure-functional jnp / Pallas, jitted end-to-end
    (ray generation -> plane gather -> decode -> composite -> resample).
  * Feature planes are explicit pytree state threaded through jitted
    functions, never module attributes.
  * Chunking is `lax.map` over static-shape ray blocks; multi-chip scaling
    is a `jax.sharding.Mesh` over the ray batch with replicated decoder/SR
    params (see nvsr_tpu.parallel).
"""

__version__ = "0.1.0"
