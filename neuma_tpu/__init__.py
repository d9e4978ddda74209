"""NeuMA-TPU: a TPU-native differentiable physics-to-pixels framework.

Re-implements the capabilities of NeuMA (NeurIPS 2024, reference layout at
/root/reference) as an idiomatic JAX/XLA/Pallas framework:

- ``neuma_tpu.sim``       -- differentiable MLS-MPM (P2G scatter / grid ops / G2P gather)
- ``neuma_tpu.materials`` -- analytic + neural (NCLaw-style) constitutive laws with LoRA
- ``neuma_tpu.render``    -- Particle-GS: particle-driven 3D Gaussian splatting
- ``neuma_tpu.train``     -- two-stage dynamics grounding (init velocity + LoRA finetune)
- ``neuma_tpu.parallel``  -- SPMD sharding over a TPU mesh (particles / grid / tiles)
"""

__version__ = "0.1.0"
