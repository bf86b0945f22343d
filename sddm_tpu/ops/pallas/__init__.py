"""Pallas TPU kernels used by the production paths.

(Experimental kernels that did not win their on-chip A/B live in
sddm_tpu/experimental/.)"""
