"""Worker for the recipe-structured multi-controller test (VERDICT r4 #4).

Spawned by tests/test_multiprocess.py::test_two_process_recipe_run: two
real jax processes x 4 virtual CPU devices each form a global
(dp=2, fsdp=4) mesh — the recipe's axis structure — and run THREE GRPO
iterations with the full production loop shape: sliding-window walk,
per-host prompt shards, cross-host reward/metric gather, one Orbax
multi-host save mid-run, then a fresh-trainer restore that replays the
final iteration and must land bitwise on the uninterrupted run.

Cross-host bitwise check: params are fsdp-sharded and dp-replicated, so
the two hosts (one dp row each) hold byte-identical shard sets.  Each
iteration every host hashes its addressable param shards keyed by
(leaf path, global shard index) — the md5 hex must agree across hosts
after every apply (a per-host RNG/data-skew or non-participating-host
bug shows up here, which single-controller dryruns cannot catch).

Reference equivalent surface: fastvideo/utils/communications.py:240-334
plus the pdsh/torchrun L0 launch (SURVEY.md §1); the reference has no
test for any of it.

Usage: python mp_recipe_worker.py <pid> <nproc> <port> <workdir>
"""

import hashlib
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

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
from mixgrpo_tpu.parallel.mesh import MeshConfig  # noqa: E402
from mixgrpo_tpu.train import GRPOTrainer  # noqa: E402


def reward_fn(images01, captions):
    # no VAE in this worker: scores act on raw (B, S, C) latent rows
    a = np.asarray(images01, np.float64)
    r = a.reshape(a.shape[0], -1).mean(axis=1)
    return {"synthetic": r}, {"synthetic": np.ones_like(r)}


def shard_digest(params) -> str:
    """md5 over every addressable param shard, keyed by (path, index).

    dp-replicated + fsdp-sharded params give both hosts the same logical
    shard set (the dp axis does not appear in any shard's index tuple),
    so the digests must be byte-identical across hosts.
    """
    items = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        for sh in leaf.addressable_shards:
            idx = tuple(
                (s.start or 0, s.stop) for s in sh.index if isinstance(s, slice)
            )
            items.append((jax.tree_util.keystr(path), idx,
                          np.asarray(sh.data).tobytes()))
    items.sort(key=lambda t: (t[0], t[1]))
    h = hashlib.md5()
    for path, idx, blob in items:
        h.update(path.encode())
        h.update(repr(idx).encode())
        h.update(blob)
    return h.hexdigest()


def make_cfg(out_name: str) -> TrainConfig:
    return TrainConfig(
        data=DataConfig(data_json_path=os.path.join(workdir, "cache"),
                        train_batch_size=1),
        optim=OptimConfig(max_train_steps=3, gradient_accumulation_steps=2,
                          learning_rate=1e-4, gradient_checkpointing=False),
        grpo=GRPOConfig(h=64, w=64, sampling_steps=6, num_generations=4,
                        use_group=True, init_same_noise=True,
                        training_strategy="part",
                        advantage_rerange_strategy="balance", clip_range=0.2),
        # window walks every iteration so three steps exercise the
        # scheduler's movement + roll_back bookkeeping across hosts
        window=WindowConfig(iters_per_group=1, group_size=2, roll_back=True),
        run=RunConfig(output_dir=os.path.join(workdir, out_name),
                      checkpointing_steps=100, export_safetensors="off"),
        mesh=MeshConfig(dp=2, fsdp=4, sp=1, tp=1),
    )


def build_trainer(cfg, resume=False):
    if resume:
        cfg.run.resume_from_checkpoint = "latest"
    cfg.reward.reward_model = "multi_reward"
    flux_cfg = FluxConfig.tiny()
    t = GRPOTrainer(
        cfg, flux_cfg=flux_cfg, vae_cfg=None, vae_params=None,
        reward_fn=reward_fn, text_len=8, attn_impl="xla", dtype=jnp.float32,
    )
    t.reward_weights = {"synthetic": 1.0}
    return t


def batches(n):
    ds = LatentDataset(os.path.join(workdir, "cache"))
    loader = PromptLoader(ds, 1, seed=0, process_index=pid,
                          process_count=nproc)
    it = iter(loader)
    return [next(it) for _ in range(n)]


def run_iteration(trainer, batch):
    """One production-loop iteration (train.py::_train_loop ordering)."""
    ts = trainer.window.get_current_timesteps()
    trainer.window.update_iteration(
        rng=trainer.cfg.grpo.seed + trainer.global_step
    )
    metrics = trainer.train_one_step(batch, ts)
    trainer.global_step += 1
    return metrics


out = {"digests": [], "rewards": [], "windows": []}
cfg = make_cfg("shared_out")
trainer = build_trainer(cfg)
data = batches(3)

for i in range(3):
    m = run_iteration(trainer, data[i])
    out["digests"].append(shard_digest(trainer.params))
    out["rewards"].append(m["reward"])
    out["windows"].append(trainer.window.cur_timestep)
    if i == 1:
        # mid-run Orbax multi-host save: every host writes its own shards
        # into ONE shared directory (utils/checkpoint.py)
        trainer.save_checkpoint(blocking=True)
        out["ckpt_digest"] = shard_digest(trainer.params)
        out["ckpt_window"] = trainer.window.to_dict()

# fresh trainer (different live state), restore from the shared checkpoint,
# replay iteration 3: must land bitwise on the uninterrupted run
trainer.ckpt.close()
resumed = build_trainer(make_cfg("shared_out"), resume=True)
out["resume_step"] = resumed.global_step
out["resumed_digest"] = shard_digest(resumed.params)
m = run_iteration(resumed, data[2])
out["resumed_final_digest"] = shard_digest(resumed.params)
out["resumed_reward"] = m["reward"]
resumed.ckpt.close()

with open(os.path.join(workdir, f"recipe_metrics_{pid}.json"), "w") as f:
    json.dump(out, f)
print(f"worker {pid} done", flush=True)
