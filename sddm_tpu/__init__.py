"""sddm_tpu — a TPU-native (JAX/Flax/Pallas/pjit) framework for conditional
diffusion speech enhancement, with the capabilities of
yangye1098/Speech-Denoising-Diffusion-Model-2 re-designed TPU-first.

Layer map (mirrors reference layers, see SURVEY.md §1):
  - diffusion/   : schedules + q/p transition math (pure functions over jnp tables)
  - models/      : denoiser zoo (Flax) + SDDM composites with lax.scan samplers
  - ops/         : framing/overlap-add, STFT/mel, log-modulus, Pallas kernels
  - data/        : datasets, loaders, wav IO (host-side streaming of raw audio)
  - parallel/    : mesh construction + sharding helpers (pjit data parallel)
  - train/       : trainers, train state, Orbax checkpoint rotation
  - utils/       : JSON config system, logging, metric tracking, TB writer
"""

__version__ = "0.1.0"
