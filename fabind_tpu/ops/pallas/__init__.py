"""Pallas TPU kernels.

One kernel lives here (edge_gate.phi_rank1_pallas, the interfacial-attention
coordinate gate) together with its measured verdict: after the gate is
*expressed* as a lane reduction (MLPBlock.finish_scalar) XLA runs it at 25 us
vs 126 us for the hand kernel at production shapes, and every other hot op in
the model profiles at MXU peak (~176 TF/s) or HBM bound — so the default
compute path is pure XLA. See DESIGN.md "Pallas decision" for the numbers
and the re-audit procedure (--profile-dir on the CLIs).
"""

from fabind_tpu.ops.pallas.edge_gate import (phi_rank1_pallas,
                                             phi_rank1_reference,
                                             phi_rank1_tpu)

__all__ = ["phi_rank1_pallas", "phi_rank1_reference", "phi_rank1_tpu"]
