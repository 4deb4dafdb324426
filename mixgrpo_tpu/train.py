"""MixGRPO training app: rollout -> rewards -> advantages -> PPO updates.

TPU-native counterpart of the reference trainer
(zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:341-892 ``train_one_step``
+ ``main``).  One iteration:

  1. take a prompt batch from the embedding cache, expand x num_generations
     (repeat-interleave group expansion, :368-384);
  2. rollout the whole group in ONE jitted scan with the sliding-window
     ODE/SDE mask (the reference loops 12 single-sample rollouts);
  3. decode final latents with the JAX VAE, score with the reward zoo
     (batched device forwards; reference loops PIL images);
  4. group-relative advantages (advantage_aggr / reward_aggr mixing);
  5. optional pos/neg balancing of the sample order (:524-532);
  6. batched PPO updates: each gradient-accumulation group of
     (sample x window-timestep) pairs is one fused forward+backward
     (gradient-equivalent to the reference's 48 sequential backwards);
  7. metrics, periodic Orbax checkpoint (with window state — resumable,
     unlike the reference's NotImplementedError, :781-783).

Group advantages never cross hosts (groups are host-local, as in the
reference where each rank rolls out its own generations), so the only
cross-host collectives are the gradient mean (inserted by SPMD) and the
reward logging gather.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.config import TrainConfig, window_state_from_config
from mixgrpo_tpu.data.dataset import LatentDataset, PromptLoader
from mixgrpo_tpu.models.flux.latents import denormalize_latents, unpack_latents
from mixgrpo_tpu.models.flux.model import FluxConfig, init_flux
from mixgrpo_tpu.models.flux.vae import VAEConfig, postprocess_images, vae_decode
from mixgrpo_tpu.parallel import (
    get_local_batch, make_mesh, put_global_batch, set_activation_mesh,
    shard_params,
)
from mixgrpo_tpu.rl.advantage import (
    global_advantages, group_advantages, masked_mix_advantages,
    masked_mix_rewards,
)
from mixgrpo_tpu.rl.balance import balance_pos_neg
from mixgrpo_tpu.rl.window import SlidingWindowState
from mixgrpo_tpu.sampler import FluxSampler
from mixgrpo_tpu.solvers.schedule import (
    deterministic_mask, flash_post_schedule, sigma_schedule,
)
from mixgrpo_tpu.trainer import (
    build_update_batch, make_optimizer, make_update_fns,
)
from mixgrpo_tpu.utils.checkpoint import CheckpointManager, export_flux_safetensors
from mixgrpo_tpu.utils.logging import MetricLogger, main_print


class GRPOTrainer:
    def __init__(
        self,
        cfg: TrainConfig,
        *,
        flux_cfg: Optional[FluxConfig] = None,
        params=None,
        vae_cfg: Optional[VAEConfig] = None,
        vae_params=None,
        reward_fn: Optional[Callable] = None,
        reward_models: Optional[Dict] = None,
        text_len: int = 512,
        attn_impl: str = "auto",
        dtype=jnp.bfloat16,
        use_lora: bool = False,
        lora_rank: int = 16,
        lora_alpha: float = 16.0,
    ):
        """``reward_fn(images01, captions) -> (rewards_dict, successes_dict)``
        overrides the model zoo (used for tests / synthetic rewards)."""
        self.cfg = cfg
        self.flux_cfg = flux_cfg or FluxConfig.flux_dev()
        self.mesh = make_mesh(cfg.mesh)
        # pin attention activations (batch->dp/fsdp, heads->tp, seq->sp) so
        # SPMD never falls back to involuntary full rematerialization on the
        # joint-sequence concat (round-2 dryrun warning)
        set_activation_mesh(self.mesh)
        self.dtype = dtype

        if params is None:
            params = init_flux(jax.random.key(cfg.grpo.seed), self.flux_cfg)
        self.params = shard_params(params, self.mesh)

        self.vae_cfg = vae_cfg
        self.vae_params = vae_params
        self.reward_fn = reward_fn
        self.reward_models = reward_models or {}
        self.reward_weights = cfg.reward.weights()

        self.sampler_cfg = cfg.sampler_config()
        self.sampler = FluxSampler(
            self.flux_cfg, self.sampler_cfg,
            height=cfg.grpo.h, width=cfg.grpo.w, text_len=text_len,
            guidance_scale=cfg.grpo.guidance_scale,
            dtype=dtype, attn_impl=attn_impl,
        )
        self.optimizer = make_optimizer(
            learning_rate=cfg.optim.learning_rate,
            weight_decay=cfg.optim.weight_decay,
            max_grad_norm=cfg.optim.max_grad_norm,
            lr_scheduler=cfg.optim.lr_scheduler,
            warmup_steps=cfg.optim.lr_warmup_steps,
            total_steps=cfg.optim.max_train_steps,
            lr_num_cycles=cfg.optim.lr_num_cycles,
            lr_power=cfg.optim.lr_power,
        )
        loss_scale = float(cfg.grpo.loss_coef)
        remat = "dots" if cfg.optim.gradient_checkpointing else False
        self.use_lora = use_lora
        if use_lora:
            from mixgrpo_tpu.lora import apply_lora, init_lora
            from mixgrpo_tpu.trainer import make_lora_update_fns

            lora = init_lora(
                jax.random.key(cfg.grpo.seed + 1), self.params,
                rank=lora_rank, alpha=lora_alpha,
            )
            self.lora_factors = lora["factors"]
            self.lora_meta = {"rank": lora["rank"], "alpha": lora["alpha"]}
            self.opt_state = self.optimizer.init(self.lora_factors)
            self.lora_update = make_lora_update_fns(
                self.flux_cfg, self.sampler_cfg, cfg.ppo_config(),
                self.optimizer, self.sampler.rope_cos, self.sampler.rope_sin,
                guidance_scale=cfg.grpo.guidance_scale, dtype=dtype,
                attn_impl=attn_impl, remat=remat, loss_scale=loss_scale,
            )
            self._merge = jax.jit(
                lambda base, f: apply_lora(base, {**self.lora_meta, "factors": f})
            )
        else:
            from mixgrpo_tpu.parallel.sharding import shard_opt_state

            # mesh-placed by the param rules so the first update_step output
            # has the same signature (optax.init leaves scalar state on one
            # device, which would recompile the full-depth update once)
            self.opt_state = shard_opt_state(
                self.optimizer.init(self.params), self.mesh
            )
            self.update_step, self.accum_step, self.apply_step = make_update_fns(
                self.flux_cfg, self.sampler_cfg, cfg.ppo_config(), self.optimizer,
                self.sampler.rope_cos, self.sampler.rope_sin,
                guidance_scale=cfg.grpo.guidance_scale, dtype=dtype,
                attn_impl=attn_impl, remat=remat,
                loss_scale=loss_scale,
            )
        self.ema_params = None
        if cfg.optim.ema_decay > 0 and not use_lora:
            from mixgrpo_tpu.utils.ema import ema_init

            self.ema_params = ema_init(self.params)
        self._quantize = None
        if cfg.grpo.rollout_quant == "int8":
            from mixgrpo_tpu.ops.quant import quantize_flux_params

            self._quantize = jax.jit(quantize_flux_params)
        elif cfg.grpo.rollout_quant != "none":
            raise ValueError(f"unknown rollout_quant {cfg.grpo.rollout_quant!r}")
        self._export_warned = False  # set after a failed safetensors export
        self.window: SlidingWindowState = window_state_from_config(cfg)
        self.base_sigmas = sigma_schedule(cfg.grpo.sampling_steps, cfg.grpo.shift)
        self.global_step = 0
        self._decode = jax.jit(self._decode_impl) if vae_params is not None else None

        run_dir = os.path.join(
            cfg.run.output_dir,
            f"{cfg.grpo.training_strategy}_{cfg.run.experiment_name}",
        )
        self.run_dir = run_dir
        self.ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
        # wandb run id: generated once, persisted in args.json, reused on
        # resume so the stream continues (train_grpo_flux.py:663-667,753-760)
        self.wandb_run_id = self._load_or_create_run_id()
        self.metrics = MetricLogger(
            run_dir, run_name=cfg.run.experiment_name,
            wandb_key=cfg.run.wandb_key, resume_id=self.wandb_run_id,
        )
        if jax.process_index() == 0:
            import json as _json

            os.makedirs(run_dir, exist_ok=True)
            blob = _json.loads(cfg.to_json())
            blob["wandb_run_id"] = self.wandb_run_id
            with open(os.path.join(run_dir, "args.json"), "w") as f:
                _json.dump(blob, f, indent=2)

        if cfg.run.resume_from_checkpoint:
            self._resume()

    # ------------------------------------------------------------------

    def _load_or_create_run_id(self) -> str:
        """Reuse the persisted wandb run id when resuming, else mint one."""
        import json as _json
        import uuid

        path = os.path.join(self.run_dir, "args.json")
        if self.cfg.run.resume_from_checkpoint and os.path.exists(path):
            try:
                with open(path) as f:
                    rid = _json.load(f).get("wandb_run_id")
                if rid:
                    return rid
            except (OSError, ValueError) as e:
                main_print(f"could not read wandb_run_id from args.json: {e}")
        return uuid.uuid4().hex[:8]

    def _resume(self):
        tmpl = self.lora_factors if self.use_lora else self.params
        p, o, win_d, step = self.ckpt.restore(
            params_template=jax.tree.map(jnp.zeros_like, tmpl),
            opt_state_template=jax.tree.map(jnp.zeros_like, self.opt_state),
            ema_template=(
                jax.tree.map(jnp.zeros_like, self.ema_params)
                if self.ema_params is not None else None
            ),
        )
        if self.use_lora:
            self.lora_factors = p
        else:
            self.params = p
        self.opt_state, self.global_step = o, step
        ema = self.ckpt.last_ema()
        if ema is not None:
            self.ema_params = ema
        if win_d:
            self.window = SlidingWindowState.from_dict(win_d)
        main_print(f"resumed from step {step}")

    def _decode_impl(self, vae_params, latents_packed):
        # vae_params must flow through the jit ARGUMENT (closing over
        # self.vae_params would bake ~100 MB of constants into the program)
        lat = unpack_latents(latents_packed, self.cfg.grpo.h, self.cfg.grpo.w)
        img = vae_decode(vae_params, self.vae_cfg, denormalize_latents(lat),
                         dtype=self.dtype)
        return postprocess_images(img)

    def _schedule_for_window(self, timesteps_train):
        """Build (sigmas, deterministic, num_steps) for this iteration."""
        T = self.cfg.grpo.sampling_steps
        if self.cfg.grpo.training_strategy == "part":
            det = deterministic_mask(T, timesteps_train)
        else:  # "all" = DanceGRPO: every step SDE (train_grpo_flux.py:255-256)
            det = np.zeros(T, dtype=bool)
        dpm = self.cfg.dpm
        if "dpmsolver" in dpm.dpm_algorithm_type and dpm.dpm_apply_strategy == "post":
            sig, n, det = flash_post_schedule(
                self.base_sigmas, det, self.cfg.grpo.shift,
                dpm.dpm_post_compress_ratio, pad_to=T,
            )
            return sig, det, n
        return self.base_sigmas, det, T

    def _compute_rewards(self, images01, captions):
        """Returns (rewards_dict, successes_dict) of np arrays."""
        if self.reward_fn is not None:
            return self.reward_fn(images01, captions)
        from mixgrpo_tpu.rewards.base import compute_reward

        _, _, rd, sd = compute_reward(
            images01, captions, self.reward_models, self.reward_weights
        )
        return (
            {k: np.asarray(v) for k, v in rd.items()},
            {k: np.asarray(v) for k, v in sd.items()},
        )

    # ------------------------------------------------------------------

    def train_one_step(self, batch, timesteps_train=None) -> Dict[str, float]:
        cfg = self.cfg
        G = cfg.grpo.num_generations if cfg.grpo.use_group else 1
        n_prompts = batch["prompt_embed"].shape[0]
        B = n_prompts * G

        # group expansion (repeat_interleave, :368-384).  The batch is
        # process-local (each host loads its own prompt shard); jitted SPMD
        # functions consume global arrays, so placement goes through
        # put_global_batch (host_local_array_to_global_array on pods).
        txt_local = np.asarray(
            np.repeat(batch["prompt_embed"], G, axis=0), dtype=self.dtype
        )
        pooled_local = np.asarray(
            np.repeat(batch["pooled"], G, axis=0), dtype=self.dtype
        )
        captions = [c for c in batch["captions"] for _ in range(G)]
        txt = put_global_batch(self.mesh, txt_local)
        pooled = put_global_batch(self.mesh, pooled_local)

        if timesteps_train is None:
            timesteps_train = self.window.get_current_timesteps()
        sigmas, det, num_steps = self._schedule_for_window(timesteps_train)

        rng = jax.random.fold_in(
            jax.random.key(cfg.grpo.sampler_seed), self.global_step
        )
        k_noise, k_roll, k_bal = jax.random.split(rng, 3)
        if jax.process_count() > 1:
            # per-host noise for the host's own prompt rows (reference: each
            # rank rolls out its own shard with its own generator)
            k_noise = jax.random.fold_in(k_noise, jax.process_index())
        rollout_params = (
            self._merge(self.params, self.lora_factors)
            if self.use_lora else self.params
        )
        if self._quantize is not None:
            rollout_params = self._quantize(rollout_params)
        z0 = self.sampler.init_noise(
            k_noise, B, same_noise_groups=G if cfg.grpo.init_same_noise else None
        )
        z0 = put_global_batch(self.mesh, z0)

        t0 = time.time()
        with self.mesh:
            out = self.sampler.chunked_rollout(
                rollout_params, z0, txt, pooled, sigmas, det, num_steps, k_roll,
                chunk=cfg.grpo.rollout_chunk, mesh=self.mesh,
            )
            if self._decode is not None:
                images01 = self._decode(self.vae_params, out.final_latents)
            else:
                images01 = out.final_latents
        sampling_time = time.time() - t0
        main_print(f"##### Sampling time per iteration: {sampling_time:.2f} s")

        # reward scoring is host-side and captions are process-local, so
        # score this host's own image rows (global_array_to_host_local_array
        # keeps row order aligned with the local captions)
        images_local = get_local_batch(self.mesh, images01)

        if self._decode is not None and getattr(self, "save_images", False):
            self._save_first_image(images_local)

        rewards_dict, successes_dict = self._compute_rewards(images_local, captions)

        # advantages (:440-501) with per-model success masking: failed
        # reward calls (e.g. UnifiedReward HTTP errors) are dropped from
        # group statistics and contribute zero advantage — the reference
        # collects successes_dict but leaves consumption as a TODO
        # (train_grpo_flux.py:299-318); eval masks means the same way
        # (eval_reward.py:264-276).
        rd = {k: jnp.asarray(v) for k, v in rewards_dict.items()}
        sd = {
            k: jnp.asarray(successes_dict.get(k, np.ones_like(rewards_dict[k])))
            for k in rewards_dict
        }
        if cfg.grpo.use_group:
            rewards = masked_mix_rewards(rd, sd, self.reward_weights)
            if cfg.reward.multi_reward_mix == "advantage_aggr":
                adv = masked_mix_advantages(
                    rd, sd, self.reward_weights, G, cfg.grpo.trimmed_ratio,
                )
            else:
                adv = group_advantages(rewards, G, cfg.grpo.trimmed_ratio)
        else:
            assert cfg.reward.multi_reward_mix == "reward_aggr", (
                "advantage_aggr requires use_group (:495-496)"
            )
            rewards = masked_mix_rewards(rd, sd, self.reward_weights)
            from jax.experimental import multihost_utils

            gathered = (
                multihost_utils.process_allgather(rewards)
                if jax.process_count() > 1 else rewards
            )
            adv = global_advantages(rewards, gathered.reshape(-1))

        # training timesteps (:514-522); ignore_last drops the final MDP
        # step's pair (the reference realizes this via an unconditional
        # double truncation, train_grpo_flux.py:407-410 / SURVEY.md §8.5)
        if cfg.grpo.training_strategy == "part":
            train_ts = [
                t for t in timesteps_train
                if not (cfg.grpo.ignore_last and t >= num_steps - 1)
            ]
        else:
            if cfg.grpo.frozen_init_timesteps > 0:
                train_ts = list(range(cfg.grpo.frozen_init_timesteps))
            else:
                train_ts = list(
                    range(int(self.cfg.grpo.sampling_steps * cfg.grpo.timestep_fraction))
                )

        # sample-order rerange (:524-532)
        order = np.arange(B)
        strat = cfg.grpo.advantage_rerange_strategy
        if cfg.grpo.training_strategy == "part" and strat != "null":
            host_rng = np.random.default_rng(
                np.asarray(jax.random.key_data(k_bal))[-1]
            )
            order = balance_pos_neg(
                np.asarray(adv), host_rng, use_random=(strat == "random")
            )

        # per-sample timestep permutation for "all" strategy (:503-509)
        if cfg.grpo.training_strategy == "all":
            host_rng = np.random.default_rng(
                np.asarray(jax.random.key_data(k_bal))[-1] + 1
            )
            perms = np.stack([
                host_rng.permutation(self.cfg.grpo.sampling_steps)
                for _ in range(B)
            ])

        # batched PPO updates: accumulate `gradient_accumulation_steps`
        # samples per optimizer step
        accum = max(cfg.optim.gradient_accumulation_steps, 1)
        W = len(train_ts)
        if W == 0:
            # window start == max_timesteps yields an empty window for a few
            # iterations until roll_back fires — the reference silently
            # no-ops here (grpo_states.py:95-99 + train loop over []);
            # skip the update but keep reward logging.
            main_print(
                f"empty training window at cur_timestep="
                f"{self.window.cur_timestep}; skipping update"
            )
        agg: Dict[str, float] = {}
        n_updates = 0
        sig_dev = jnp.asarray(sigmas, jnp.float32)
        multi_host = jax.process_count() > 1
        if multi_host and W > 0:
            # rollout outputs are globally sharded; sample selection (order,
            # perms, advantages) is host-local, so pull this host's rows and
            # rebuild each update group as a global array below.
            lat_h = get_local_batch(self.mesh, out.all_latents)
            lp_h = get_local_batch(self.mesh, out.all_log_probs)
            txt_h, pooled_h = txt_local, pooled_local
        else:
            lat_h, lp_h = out.all_latents, out.all_log_probs
            txt_h, pooled_h = txt, pooled
        with self.mesh:
            for gstart in range(0, B if W > 0 else 0, accum):
                gidx = order[gstart : gstart + accum]
                if len(gidx) == 0:
                    continue
                sample_idx = np.repeat(gidx, W)
                if cfg.grpo.training_strategy == "all":
                    t_idx = np.concatenate([perms[i][:W] for i in gidx])
                else:
                    t_idx = np.tile(np.asarray(train_ts), len(gidx))
                ub = build_update_batch(
                    lat_h, lp_h, adv, txt_h, pooled_h, sample_idx, t_idx,
                )
                if multi_host:
                    ub = jax.tree.map(
                        lambda a: put_global_batch(self.mesh, a), ub
                    )
                if self.use_lora:
                    self.lora_factors, self.opt_state, m = self.lora_update(
                        self.lora_factors, self.opt_state, self.lora_meta,
                        self.params, ub, sig_dev,
                    )
                else:
                    self.params, self.opt_state, m = self.update_step(
                        self.params, self.opt_state, ub, sig_dev
                    )
                n_updates += 1
                for k, v in m.items():
                    agg[k] = agg.get(k, 0.0) + float(v)

        metrics = {k: v / max(n_updates, 1) for k, v in agg.items()}
        # reward means are gathered across hosts for logging, matching the
        # reference's all_gathered reward stream (train_grpo_flux.py:417-437)
        def _global_mean(x) -> float:
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                x = multihost_utils.process_allgather(jnp.asarray(x))
            return float(jnp.mean(jnp.asarray(x)))

        def _gather(x):
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                return np.asarray(multihost_utils.process_allgather(jnp.asarray(x)))
            return np.asarray(x)

        metrics["reward"] = _global_mean(rewards)
        for name, vals in rewards_dict.items():
            # success-masked per-model mean (reference eval_reward.py:264-276)
            v = _gather(np.asarray(vals, np.float64)).reshape(-1)
            s = _gather(np.asarray(sd[name], np.float64)).reshape(-1)
            metrics[f"reward/{name}"] = (
                float((v * s).sum() / s.sum()) if s.sum() > 0 else 0.0
            )
        metrics["cur_timestep"] = self.window.cur_timestep
        metrics["cur_iter_in_group"] = self.window.cur_iter_in_group
        metrics["sampling_time"] = sampling_time
        self._dump_reward_stream(captions, rewards_dict, sd, rewards, metrics)
        return metrics

    # ------------------------------------------------------------------

    def _dump_reward_stream(self, captions, rewards_dict, sd, rewards, metrics):
        """Append-only reward text streams (train_grpo_flux.py:427-437).

        ``rewards.txt`` (process 0) mirrors the reference's per-step
        per-model gathered means; ``rewards_samples_rank{p}.jsonl`` (every
        process, its own prompt shard) additionally records each sample's
        caption and raw per-model scores — the per-sample dump the
        reference lacks, useful for spotting reward hacking.
        """
        try:
            if jax.process_index() == 0:
                with open(os.path.join(self.run_dir, "rewards.txt"), "a") as f:
                    f.write(f"step {self.global_step}\n")
                    for name in rewards_dict:
                        f.write(f"{name}: {metrics[f'reward/{name}']}\n")
                    f.write(f"reward: {metrics['reward']}\n")
            import json as _json

            path = os.path.join(
                self.run_dir, f"rewards_samples_rank{jax.process_index()}.jsonl"
            )
            mixed = np.asarray(rewards).reshape(-1)
            with open(path, "a") as f:
                for i, cap in enumerate(captions):
                    row = {
                        "step": self.global_step,
                        "caption": cap,
                        "reward": float(mixed[i]) if i < len(mixed) else None,
                    }
                    for name, vals in rewards_dict.items():
                        row[name] = float(np.asarray(vals).reshape(-1)[i])
                        row[f"{name}_ok"] = float(
                            np.asarray(sd[name]).reshape(-1)[i]
                        )
                    f.write(_json.dumps(row) + "\n")
        except OSError as e:
            main_print(f"reward stream write failed: {e}")

    # ------------------------------------------------------------------

    def _save_first_image(self, images01):
        """First decoded image per host per step (train_grpo_flux.py:290-293)."""
        try:
            from PIL import Image

            img_dir = os.path.join(self.run_dir, "images")
            os.makedirs(img_dir, exist_ok=True)
            arr = np.asarray(images01[0])
            Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(
                    img_dir,
                    f"flux_{self.global_step}_{jax.process_index()}.png",
                )
            )
        except Exception as e:  # image dumps are best-effort observability
            main_print(f"image save skipped: {e}")

    def train(self, loader: PromptLoader, save_images: bool = False):
        cfg = self.cfg
        self.save_images = save_images
        it = iter(loader)
        # Graceful preemption: TPU VMs get SIGTERM on maintenance events /
        # spot reclaim.  Finish the in-flight iteration, checkpoint, and
        # exit cleanly so --resume_from_checkpoint continues the window
        # walk (the reference has no preemption handling; a killed rank
        # loses everything since its resume raises NotImplementedError).
        import signal

        self._preempted = False

        def _on_term(signum, frame):
            self._preempted = True
            main_print(f"signal {signum}: will checkpoint and stop after "
                       "this iteration")

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_term)
            except ValueError:  # non-main thread (tests)
                pass
        prof_until = None  # step at which to stop the profiler trace
        # skip the first (compile) step; works on resume at any step
        prof_start = self.global_step + 1
        try:
            self._train_loop(cfg, it, prof_start, prof_until)
        finally:
            # always restore process signal handlers and close an open
            # profiler trace, even if a step raised mid-loop
            if getattr(self, "_prof_active", False):
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
                self._prof_active = False
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
        self.save_checkpoint()
        self.ckpt.close()  # joins any in-flight async periodic save
        self.metrics.close()

    def _train_loop(self, cfg, it, prof_start, prof_until):
        self._prof_active = False
        while self.global_step < cfg.optim.max_train_steps:
            if self._preempted:
                main_print(f"preempted at step {self.global_step}")
                break
            if cfg.run.profile_steps > 0 and self.global_step == prof_start:
                prof_dir = cfg.run.profile_dir or os.path.join(
                    self.run_dir, "profile"
                )
                jax.profiler.start_trace(prof_dir)
                self._prof_active = True
                prof_until = prof_start + cfg.run.profile_steps
                main_print(f"profiler trace -> {prof_dir}")
            if (
                self.global_step > 0
                and self.global_step % cfg.run.checkpointing_steps == 0
            ):
                self.save_checkpoint(blocking=False)
            # reference ordering (train_grpo_flux.py:833-835): capture the
            # window BEFORE advancing it, so the first group gets the full
            # iters_per_group iterations.  update_iteration is seeded so the
            # "random" strategy is reproducible and agrees across hosts
            # (replicated window inputs feed the SPMD-jitted rollout).
            timesteps_train = self.window.get_current_timesteps()
            self.window.update_iteration(
                rng=cfg.grpo.seed + self.global_step
            )
            batch = next(it)
            metrics = self.train_one_step(batch, timesteps_train)
            if self.ema_params is not None:
                from mixgrpo_tpu.utils.ema import ema_update

                self.ema_params = ema_update(
                    self.ema_params, self.params, self.cfg.optim.ema_decay,
                    step=self.global_step, start_step=self.cfg.optim.ema_start_step,
                )
            metrics.update(self.metrics.tick())
            self.metrics.log(self.global_step, metrics)
            main_print(
                f"step {self.global_step}: loss={metrics.get('loss', 0):.5f} "
                f"reward={metrics['reward']:.4f} window@{self.window.cur_timestep}"
            )
            self.global_step += 1
            if prof_until is not None and self.global_step >= prof_until:
                jax.profiler.stop_trace()
                self._prof_active = False
                prof_until = None

    def save_checkpoint(self, blocking: bool = True):
        train_state = self.lora_factors if self.use_lora else self.params
        self.ckpt.save(
            self.global_step, train_state, self.opt_state,
            window_state=self.window.to_dict(),
            extra={"use_lora": self.use_lora},
            ema_params=self.ema_params,
            blocking=blocking,
        )
        mode = self.cfg.run.export_safetensors
        if jax.process_index() == 0 and mode != "off" and not self._export_warned:
            path = os.path.join(
                self.run_dir, f"export_{self.global_step}",
                "diffusion_pytorch_model.safetensors",
            )
            try:
                export_flux_safetensors(
                    jax.device_get(self.params), self.flux_cfg, path
                )
            except Exception as e:
                if mode == "required":
                    raise RuntimeError(
                        f"safetensors export failed at step {self.global_step} "
                        f"(--export_safetensors required): {e}"
                    ) from e
                # auto: warn loudly, once per run — the 12B fp32 gather can
                # exceed small-host RAM, but skipping must not be silent
                if not self._export_warned:
                    self._export_warned = True
                    import warnings

                    warnings.warn(
                        "diffusers safetensors export FAILED and will be "
                        f"skipped for the rest of this run: {e!r}.  Pass "
                        "--export_safetensors off to silence, or required "
                        "to make this fatal; Orbax checkpoints are unaffected."
                    )
        main_print(f"checkpoint saved at step {self.global_step}")


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def build_reward_models(cfg: TrainConfig):
    """Instantiate the reward zoo from config paths (reference :86-173)."""
    from mixgrpo_tpu.rewards import (
        CLIPScoreReward, HPSReward, PickScoreReward, UnifiedReward,
    )

    merges = os.environ.get("CLIP_BPE_PATH")
    if not merges:
        # the FLUX HF layout ships the CLIP BPE table at tokenizer/merges.txt
        # (round-5 rehearsal finding: reward tokenizers crashed without
        # CLIP_BPE_PATH even though the table sits next to the model)
        cand = os.path.join(
            cfg.paths.pretrained_model_name_or_path, "tokenizer", "merges.txt"
        )
        merges = cand if os.path.exists(cand) else None
    out = {}
    active = cfg.reward.active_models()
    if "hpsv2" in active:
        out["hpsv2"] = HPSReward.from_checkpoint(cfg.reward.hps_path, merges)
    if "pick_score" in active:
        out["pick_score"] = PickScoreReward.from_checkpoint(
            cfg.reward.pick_score_path, merges
        )
    if "clip_score" in active:
        out["clip_score"] = CLIPScoreReward.from_checkpoint(
            cfg.reward.clip_score_path, merges
        )
    if "unified_reward" in active and cfg.reward.unified_reward_url:
        out["unified_reward"] = UnifiedReward(
            cfg.reward.unified_reward_url,
            cfg.reward.unified_reward_default_question_type or "score",
            cfg.reward.unified_reward_num_workers,
        )
    if "image_reward" in active:
        from mixgrpo_tpu.rewards.image_reward import ImageRewardModel

        out["image_reward"] = ImageRewardModel.from_checkpoint(
            cfg.reward.image_reward_path, cfg.reward.image_reward_med_config
        )
    return out


def main():
    from mixgrpo_tpu.config import build_arg_parser, config_from_args
    from mixgrpo_tpu.models.flux.load import load_flux_params, load_vae_decoder_params

    args = build_arg_parser().parse_args()
    cfg = config_from_args(args)

    from mixgrpo_tpu.presets import flux_family

    fam = flux_family()  # MIXGRPO_MODEL_PRESET (flux-dev | tiny rehearsal)
    flux_cfg = fam["flux"]
    params = load_flux_params(
        cfg.paths.dit_model_name_or_path
        or os.path.join(cfg.paths.pretrained_model_name_or_path, "transformer"),
        flux_cfg,
    )
    vae_cfg = fam["vae"]
    vae_params = load_vae_decoder_params(
        cfg.paths.vae_model_path
        or os.path.join(cfg.paths.pretrained_model_name_or_path, "vae"),
        vae_cfg,
    )
    trainer = GRPOTrainer(
        cfg, flux_cfg=flux_cfg, params=params,
        vae_cfg=vae_cfg, vae_params=vae_params,
        reward_models=build_reward_models(cfg),
        attn_impl=cfg.runtime.attn_impl,
        use_lora=cfg.runtime.use_lora,
        lora_rank=cfg.runtime.lora_rank,
        lora_alpha=cfg.runtime.lora_alpha,
    )
    ds = LatentDataset(cfg.data.data_json_path, cfg_rate=cfg.data.cfg_rate,
                       seed=cfg.grpo.seed)
    loader = PromptLoader(
        ds, cfg.data.train_batch_size, seed=cfg.grpo.seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    trainer.train(loader)


if __name__ == "__main__":
    main()
