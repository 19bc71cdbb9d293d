"""resolution_pde_tpu: a TPU-native JAX/XLA/Pallas framework for resolution
generalization in neural PDE solvers.

Re-designed from scratch for TPU (reference: RohanVKashyap/resolution-pde,
a single-node PyTorch research codebase). The compute path is jnp/XLA with
Pallas kernels for the hot ops; scaling is expressed via jax.sharding over a
device Mesh rather than replication wrappers.

Subpackages:
  ops        -- numerical kernels: spectral convs, FFT resize, SSM kernels, losses
  models     -- flax.linen neural-operator models: FNO, FFNO, CNO, UNet, S4 family
  data       -- HDF5 ingestion, Markov pairing, resolution-bucketed pipelines
  train      -- jitted train/eval steps, schedules, checkpointing
  evaluation -- super-resolution sweep, autoregressive rollout, frequency analysis
  parallel   -- mesh construction and sharding rules
  datagen    -- on-TPU pseudo-spectral PDE solvers (data generation)
  configs    -- typed config composition (model x dataset x training)
"""

__version__ = "0.1.0"
