"""Pallas TPU kernels used by the production paths.

- ``diffwave_stack``: the full DiffWave gated-residual stack (30 layers)
  as one VMEM-resident kernel — serves DiffWave sampling via
  models/diffwave_fused.py (measured 5.1x -> 7.6x sampler RTF on v5e;
  PERFORMANCE.md).

(Experimental kernels that did not win their on-chip A/B live in
sddm_tpu/experimental/.)"""

from .diffwave_stack import diffwave_stack, diffwave_stack_reference

__all__ = ["diffwave_stack", "diffwave_stack_reference"]
