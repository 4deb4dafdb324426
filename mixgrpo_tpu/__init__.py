"""mixgrpo_tpu — TPU-native MixGRPO.

A from-scratch JAX/XLA/Pallas framework with the capabilities of MixGRPO
(arXiv:2507.21802, reference impl: zqqqqz2000/MixGRPO): GRPO RLHF fine-tuning
of the FLUX.1 rectified-flow diffusion transformer with a mixed ODE-SDE
sliding-window sampler, multi-reward scoring, and mesh-sharded training.

Layout
------
- ``solvers``  — flow-matching schedules + ODE/SDE/DPM-Solver steps with
  Gaussian log-probs; one jitted ``lax.scan`` rollout.
- ``rl``       — sliding-window scheduler, group-relative advantages,
  PPO-style clipped loss, reward mixing.
- ``models``   — FLUX MMDiT, VAE, T5/CLIP text encoders (pure-functional
  param pytrees, HF safetensors weight loading).
- ``ops``      — Pallas TPU kernels (flash attention, fused ops).
- ``rewards``  — HPSv2 / PickScore / ImageReward / CLIP-score as batched JAX
  forwards + UnifiedReward HTTP client.
- ``parallel`` — mesh setup, FSDP-style NamedSharding, Ulysses SP.
- ``data``     — prompt-embedding preprocessing cache + RL dataset.
- ``utils``    — Orbax checkpointing, metrics, logging.
"""

__version__ = "0.1.0"
