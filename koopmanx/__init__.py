"""koopmanx — a TPU-native Koopman-operator MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``MichaelMillerCSU/Koopman-online-updated-MPC`` (learning MPC of nonlinear
systems with time-varying parameters using the Koopman operator):
neural/RBF/polynomial lifting, batch EDMD + online RLS model updates,
condensed-QP tracking MPC with a batched first-order solver, terminal-cost
synthesis, and closed-loop simulation fused into single compiled programs
that scale over TPU meshes via vmap/shard_map.
"""
__version__ = "0.1.0"

from .types import LinearModel, QPData, QPSolution, RLSState, model_from_rls
