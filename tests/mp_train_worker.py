"""Worker process for the true multi-process training test.

Spawned by tests/test_multiprocess.py: N processes x 2 virtual CPU devices
each rendezvous via jax.distributed and run one GRPO training step on a
global mesh, exercising the pod data path (host-local prompt shards ->
host_local_array_to_global_array -> SPMD rollout/update ->
global_array_to_host_local_array for host-side reward scoring).

Usage: python mp_train_worker.py <pid> <nproc> <port> <workdir>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid, nproc, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mixgrpo_tpu.config import (  # noqa: E402
    DataConfig, GRPOConfig, OptimConfig, RunConfig, TrainConfig, WindowConfig,
)
from mixgrpo_tpu.data.dataset import LatentDataset, PromptLoader  # noqa: E402
from mixgrpo_tpu.models.flux.model import FluxConfig  # noqa: E402
from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder  # noqa: E402
from mixgrpo_tpu.parallel.mesh import MeshConfig  # noqa: E402
from mixgrpo_tpu.train import GRPOTrainer  # noqa: E402


def reward_fn(images01, captions):
    r = np.asarray(np.mean(np.asarray(images01, np.float64), axis=(1, 2, 3)))
    return {"synthetic": r}, {"synthetic": np.ones_like(r)}


cfg = TrainConfig(
    data=DataConfig(data_json_path=os.path.join(workdir, "cache"),
                    train_batch_size=1),
    optim=OptimConfig(max_train_steps=1, gradient_accumulation_steps=2,
                      learning_rate=1e-4, gradient_checkpointing=False),
    grpo=GRPOConfig(h=64, w=64, sampling_steps=6, num_generations=4,
                    use_group=True, init_same_noise=True,
                    training_strategy="part",
                    advantage_rerange_strategy="balance", clip_range=0.2),
    window=WindowConfig(iters_per_group=2, group_size=2, roll_back=True),
    run=RunConfig(output_dir=os.path.join(workdir, f"out{pid}"),
                  checkpointing_steps=100),
    mesh=MeshConfig(dp=2, fsdp=2, sp=1, tp=1),
)
flux_cfg = FluxConfig.tiny()
vae_cfg = VAEConfig.tiny(latent_channels=flux_cfg.in_channels // 4)
vae_params = init_vae_decoder(jax.random.key(5), vae_cfg)
cfg.reward.reward_model = "multi_reward"

trainer = GRPOTrainer(
    cfg, flux_cfg=flux_cfg, vae_cfg=vae_cfg, vae_params=vae_params,
    reward_fn=reward_fn, text_len=8, attn_impl="xla", dtype=jnp.float32,
)
trainer.reward_weights = {"synthetic": 1.0}

ds = LatentDataset(os.path.join(workdir, "cache"))
loader = PromptLoader(
    ds, 1, seed=0, process_index=pid, process_count=nproc
)
batch = next(iter(loader))

before = float(jnp.sum(jnp.abs(jax.tree.leaves(trainer.params)[3])))
ts = trainer.window.get_current_timesteps()
metrics = trainer.train_one_step(batch, ts)
after = float(jnp.sum(jnp.abs(jax.tree.leaves(trainer.params)[3])))

with open(os.path.join(workdir, f"metrics_{pid}.json"), "w") as f:
    json.dump(
        {
            "reward": metrics["reward"],
            "loss": metrics.get("loss", float("nan")),
            "param_checksum": after,
            "param_delta": abs(after - before),
        },
        f,
    )
print(f"worker {pid} done", flush=True)
