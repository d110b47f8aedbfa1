"""diffrl_tpu — a TPU-native differentiable-simulation RL framework.

From-scratch JAX/XLA re-design of the capabilities of NVlabs/DiffRL (SHAC):
a differentiable articulated rigid-body engine (generalized coordinates,
penalty contacts, MTU muscles) that steps thousands of environments in
lockstep under jit/vmap with analytic gradients through lax.scan rollouts,
plus the SHAC/BPTT/PPO/SAC training algorithms and multi-chip scaling over
jax.sharding meshes.
"""

__version__ = "0.1.0"

from . import ops
