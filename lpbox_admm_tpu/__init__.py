"""lpbox_admm_tpu: TPU-native Lp-Box ADMM framework with learned early fixing.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SCLBD/Accelerated-Lpbox-ADMM (Li & Wu, arXiv:2207.02087): batched Lp-Box
ADMM solvers for binary integer programs, learned (MHA/MLP) and
rule-based early fixing, and the three reference workloads --
combinatorial-auction LPs, image-segmentation BQPs, and sparse
adversarial attacks -- built batch-first for TPU meshes.
"""

from .config import (ATTACK_CONFIG, AttackConfig, LP_CONFIG, PolicyConfig,
                     SEG_CONFIG, SolverConfig)

__version__ = "0.1.0"

__all__ = [
    "SolverConfig", "AttackConfig", "PolicyConfig",
    "LP_CONFIG", "SEG_CONFIG", "ATTACK_CONFIG",
]
