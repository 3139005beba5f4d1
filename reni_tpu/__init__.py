"""RENI-TPU: a TPU-native (JAX/XLA/Pallas) framework for rotation-equivariant
natural illumination models.

A from-scratch rebuild of the capabilities of JADGardner/RENI (NeurIPS 2022),
designed TPU-first:

- the conditional spherical SIREN decoder is a pure functional pytree model
  whose invariant input encoding is *algebraically decomposed* so the Gram /
  latent-only terms are computed once per image instead of once per pixel
  (mathematically identical to the reference's concat encoding, hundreds of
  times fewer FLOPs in the first layer);
- training tasks (fit-decoder / fit-latent / fit-inverse) are jit-compiled,
  lax.scan-stepped update loops with the whole (small) dataset resident in HBM;
- data parallelism and direction-axis ("sequence") parallelism are expressed
  with jax.sharding over a device Mesh — XLA inserts the collectives;
- the hot SIREN trunk has a fused Pallas kernel path;
- the inverse-rendering task uses a precomputed rasterization (native C++
  rasterizer with a pure-JAX fallback) feeding a tiled Blinn-Phong shader.

Public surface mirrors the reference's two usage modes: a config-driven
multi-task trainer (`reni_tpu.cli.run`) and a bare functional model API
(`reni_tpu.models`) for downstream use as an illumination prior.
"""

__version__ = "0.1.0"

from reni_tpu.core import sphere, encodings  # noqa: F401
from reni_tpu.models.reni import RENIConfig, RENIModel, build_model  # noqa: F401
