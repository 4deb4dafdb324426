"""Real-checkpoint numerical parity harness.

The reference's correctness rests entirely on loading released weights
(zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:677-701 FLUX;
models/reward_model/hps_score.py:24-47 and friends for the reward zoo).
Every mixgrpo_tpu loader is unit-tested against synthetic checkpoints;
this app closes the remaining gap: given directories with the *real*
checkpoints, it computes small deterministic output fingerprints (a
flattened slice + mean/std of each model's output on fixed inputs) and
compares them against recorded goldens.

Workflow (documented in PERF.md):

  1. On a box with the released weights, validate outputs once (e.g.
     against diffusers/transformers), then record goldens:
         mixgrpo-verify-weights --record --goldens goldens_real.npz \
             --flux /ckpts/flux-dev/transformer \
             --flux-vae /ckpts/flux-dev/vae \
             --t5 /ckpts/flux-dev/text_encoder_2 \
             --clip-l /ckpts/flux-dev/text_encoder \
             --hps /ckpts/HPS_v2.1_compressed.pt \
             --pick-score /ckpts/PickScore_v1 \
             --clip-score /ckpts/DFN5B-CLIP-ViT-H-14-384.bin \
             --image-reward /ckpts/ImageReward.pt \
             --image-reward-med-config /ckpts/med_config.json \
             --hunyuan-llm /ckpts/llava-llama-3-8b-text-encoder
  2. Commit the small .npz; any later environment (new jax version, new
     TPU runtime, refactored loader) re-runs with --check and must match.

Checks are pure functions keyed by flag name; the same code path runs the
in-repo synthetic-golden test (tests/test_verify_weights.py).
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Callable, Dict, Optional

import numpy as np

SLICE = 64  # fingerprint length per output


def fingerprint(out: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Reduce arrays to committed-size fingerprints."""
    fp = {}
    for k, v in out.items():
        a = np.asarray(v, np.float64).reshape(-1)
        fp[f"{k}.slice"] = a[:SLICE].astype(np.float32)
        fp[f"{k}.mean"] = np.float32(a.mean())
        fp[f"{k}.std"] = np.float32(a.std())
    return fp


def _image(h: int, w: int, batch: int = 2) -> np.ndarray:
    """Deterministic synthetic image batch in [0, 1] (no RNG dependence)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (np.sin(xx / 7.0) + np.cos(yy / 11.0) + 2.0) / 4.0
    imgs = np.stack([np.clip(base * (0.6 + 0.4 * b), 0, 1) for b in range(batch)])
    return np.repeat(imgs[..., None], 3, axis=-1)


def _ids(vocab: int, n: int, seq: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(1, max(vocab - 2, 2), size=(n, seq)).astype(np.int32)


# ---------------------------------------------------------------------------
# checks: name -> fn(path, cfg=None, **aux) -> Dict[str, array]
# ---------------------------------------------------------------------------


def check_flux(path: str, cfg=None, depth=None, dtype=None):
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux import (
        FluxConfig, flux_forward, make_image_ids, make_text_ids, rope_tables,
    )
    from mixgrpo_tpu.models.flux.load import load_flux_params

    from mixgrpo_tpu.presets import flux_family

    cfg = cfg or flux_family()["flux"]
    params = load_flux_params(path, cfg)
    if depth is not None:
        dd, ds = depth
        params = dict(params)
        # (round-5 rehearsal finding: these stacks are keyed "double" /
        # "single" — the old "double_blocks" names KeyError'd, so the
        # --flux-depth path had never actually run)
        params["double"] = jax.tree.map(lambda x: x[:dd], params["double"])
        params["single"] = jax.tree.map(lambda x: x[:ds], params["single"])
        cfg = FluxConfig(**{
            **cfg.__dict__, "depth_double": dd, "depth_single": ds,
        })
    lh = lw = 16
    lt = 16
    key = jax.random.key(7)
    img = jax.random.normal(key, (1, (lh // 2) * (lw // 2), cfg.in_channels),
                            jnp.float32)
    txt = jax.random.normal(jax.random.fold_in(key, 1),
                            (1, lt, cfg.context_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.fold_in(key, 2),
                               (1, cfg.pooled_dim), jnp.float32)
    ids = np.concatenate([make_text_ids(lt), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims, cfg.theta)
    out = flux_forward(
        params, cfg, img, txt, pooled, jnp.full((1,), 0.5),
        jnp.full((1,), 3.5), cos, sin,
        dtype=dtype or jnp.float32, attn_impl="xla", remat=False,
    )
    return {"flux_out": out}


def check_flux_vae(path: str, cfg=None, dtype=None):
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux.load import load_vae_decoder_params
    from mixgrpo_tpu.models.flux.vae import VAEConfig, vae_decode

    from mixgrpo_tpu.presets import flux_family

    cfg = cfg or flux_family()["vae"]
    params = load_vae_decoder_params(path, cfg)
    lat = jax.random.normal(jax.random.key(11),
                            (1, 16, 16, cfg.latent_channels), jnp.float32)
    img = vae_decode(params, cfg, lat, dtype=dtype or jnp.float32)
    return {"flux_vae_out": img}


def check_t5(path: str, cfg=None, dtype=None):
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux.load import load_safetensors_dir
    from mixgrpo_tpu.models.text.t5 import T5Config, load_t5_hf, t5_encode

    from mixgrpo_tpu.presets import flux_family

    cfg = cfg or flux_family()["t5"]
    params = load_t5_hf(load_safetensors_dir(path), cfg)
    ids = _ids(cfg.vocab, 2, 24, seed=3)
    mask = np.ones_like(ids)
    mask[1, 16:] = 0
    out = t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                    dtype=dtype or jnp.float32)
    return {"t5_out": out}


def check_clip_l(path: str, cfg=None, dtype=None):
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux.load import load_safetensors_dir
    from mixgrpo_tpu.models.text.clip import CLIPConfig, clip_text_features
    from mixgrpo_tpu.models.text.clip_load import load_clip_hf_text_only

    from mixgrpo_tpu.presets import flux_family

    cfg = cfg or flux_family()["clip"]
    params = load_clip_hf_text_only(load_safetensors_dir(path), cfg)
    ids = np.sort(_ids(cfg.text.vocab, 2, cfg.text.context, seed=4), axis=1)
    pooled = clip_text_features(params, cfg, jnp.asarray(ids),
                                dtype=dtype or jnp.float32, project=False)
    return {"clip_l_pooled": pooled}


def _clip_reward_check(model, image_size: int):
    import jax.numpy as jnp

    imgs = jnp.asarray(_image(image_size, image_size))
    ids = np.sort(
        _ids(model.cfg.text.vocab, 2, model.cfg.text.context, seed=5), axis=1
    )
    scores = model.score(imgs, jnp.asarray(ids))
    return scores


def check_hps(path: str, cfg=None, dtype=None):
    from mixgrpo_tpu.rewards.clip_family import HPSReward

    model = HPSReward.from_checkpoint(path)
    return {"hps_scores": _clip_reward_check(model, model.cfg.vision.image_size)}


def check_pick_score(path: str, cfg=None, dtype=None):
    from mixgrpo_tpu.rewards.clip_family import PickScoreReward

    model = PickScoreReward.from_checkpoint(path)
    return {"pick_scores": _clip_reward_check(model, model.cfg.vision.image_size)}


def check_clip_score(path: str, cfg=None, dtype=None):
    from mixgrpo_tpu.rewards.clip_family import CLIPScoreReward

    model = CLIPScoreReward.from_checkpoint(path)
    return {"clip_scores": _clip_reward_check(model, model.cfg.vision.image_size)}


def check_image_reward(path: str, cfg=None, med_config=None, dtype=None):
    import jax.numpy as jnp

    from mixgrpo_tpu.rewards.image_reward import ImageRewardModel

    model = ImageRewardModel.from_checkpoint(path, med_config)
    imgs = jnp.asarray(_image(224, 224))
    ids = _ids(30522, 2, 35, seed=6)
    ids[:, 0] = 101  # [CLS]
    mask = np.ones_like(ids)
    scores = model.score(imgs, jnp.asarray(ids), jnp.asarray(mask))
    return {"image_reward_scores": scores}


def check_hunyuan_llm(path: str, cfg=None, dtype=None):
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux.load import load_safetensors_dir
    from mixgrpo_tpu.models.text.llama import (
        LlamaConfig, llama_hidden_states, load_llama_hf,
    )

    cfg = cfg or LlamaConfig.llava_llama3_8b()
    params = load_llama_hf(load_safetensors_dir(path), cfg)
    ids = _ids(min(cfg.vocab, 32000), 2, 24, seed=8)
    mask = np.ones_like(ids)
    mask[1, 18:] = 0
    out = llama_hidden_states(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        hidden_state_skip_layer=2, dtype=dtype or jnp.float32,
    )
    return {"hunyuan_llm_out": out}


def check_hunyuan_vae(path: str, cfg=None, dtype=None):
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.hunyuan.vae3d import (
        CausalVAEConfig, causal_vae_decode, causal_vae_encode,
        load_causal_vae_decoder, load_causal_vae_encoder,
    )

    cfg = cfg or CausalVAEConfig.hunyuan_video()
    dec = load_causal_vae_decoder(path, cfg)
    lat = jax.random.normal(jax.random.key(13), (1, 2, 8, 8,
                                                 cfg.latent_channels))
    out = {"hunyuan_vae_dec": causal_vae_decode(dec, cfg, lat,
                                                dtype=dtype or jnp.float32)}
    try:
        enc = load_causal_vae_encoder(path, cfg)
        vid = jax.random.normal(jax.random.key(14), (1, 5, 32, 32, 3))
        out["hunyuan_vae_enc"] = causal_vae_encode(
            enc, cfg, vid, sample=False, dtype=dtype or jnp.float32
        )
    except KeyError:
        pass  # decoder-only checkpoint
    return out


def check_hunyuan_dit(path: str, cfg=None, dtype=None):
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.hunyuan.load import load_hunyuan_video
    from mixgrpo_tpu.models.hunyuan.model import hunyuan_video_forward

    params, cfg = load_hunyuan_video(path, cfg)
    k = jax.random.key(17)
    z = jax.random.normal(k, (1, 2, 8, 8, cfg.in_channels))
    txt = jax.random.normal(k, (1, 6, cfg.text_states_dim))
    pooled = jax.random.normal(k, (1, cfg.text_states_dim_2))
    mask = jnp.ones((1, 6), jnp.int32)
    t = jnp.full((1,), 0.5)
    g = jnp.full((1,), 6.0) if cfg.guidance_embed else None
    out = hunyuan_video_forward(
        params, cfg, z, txt, pooled, t, g, text_mask=mask,
        dtype=dtype or jnp.float32, remat=False,
    )
    return {"hunyuan_dit_out": out}


def check_mochi(path: str, cfg=None, dtype=None):
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.mochi.load import load_mochi_checkpoint
    from mixgrpo_tpu.models.mochi.model import MochiConfig, mochi_forward

    cfg = cfg or MochiConfig.mochi_preview()
    params = load_mochi_checkpoint(path, cfg)
    k = jax.random.key(15)
    z = jax.random.normal(k, (1, 2, 8, 8, cfg.in_channels))
    txt = jax.random.normal(k, (1, 6, cfg.text_embed_dim))
    mask = jnp.ones((1, 6), jnp.int32)
    t = jnp.full((1,), 0.5)
    out = mochi_forward(params, cfg, z, txt, t, mask,
                        dtype=dtype or jnp.float32, remat=False)
    return {"mochi_out": out}


def check_mochi_vae(path: str, cfg=None, dtype=None):
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.mochi.vae import (
        MochiVAEConfig, load_mochi_vae_decoder, mochi_vae_decode,
    )

    cfg = cfg or MochiVAEConfig.mochi_preview()
    params = load_mochi_vae_decoder(path, cfg)
    lat = jax.random.normal(jax.random.key(16), (1, 2, 8, 8,
                                                 cfg.latent_channels))
    return {"mochi_vae_dec": mochi_vae_decode(params, cfg, lat,
                                              dtype=dtype or jnp.float32)}


CHECKS: Dict[str, Callable] = {
    "flux": check_flux,
    "flux_vae": check_flux_vae,
    "t5": check_t5,
    "clip_l": check_clip_l,
    "hps": check_hps,
    "pick_score": check_pick_score,
    "clip_score": check_clip_score,
    "image_reward": check_image_reward,
    "hunyuan_llm": check_hunyuan_llm,
    "hunyuan_vae": check_hunyuan_vae,
    "hunyuan_dit": check_hunyuan_dit,
    "mochi": check_mochi,
    "mochi_vae": check_mochi_vae,
}


def run_checks(
    specs: Dict[str, Dict[str, Any]],
    goldens_path: str,
    record: bool,
    rtol: float = 2e-3,
    atol: float = 2e-3,
) -> Dict[str, str]:
    """``specs``: check name -> kwargs for the check fn (must include
    ``path``).  Returns {check: "recorded"|"ok"|"MISMATCH: ..."}."""
    results: Dict[str, str] = {}
    fps: Dict[str, np.ndarray] = {}
    golden = None if record else dict(np.load(goldens_path))
    for name, kwargs in specs.items():
        out = CHECKS[name](**kwargs)
        fp = {f"{name}/{k}": v for k, v in fingerprint(out).items()}
        if record:
            fps.update(fp)
            results[name] = "recorded"
            continue
        errs = []
        for k, v in fp.items():
            if k not in golden:
                errs.append(f"{k}: missing from goldens")
                continue
            try:
                np.testing.assert_allclose(v, golden[k], rtol=rtol, atol=atol)
            except AssertionError:
                diff = float(np.max(np.abs(
                    np.asarray(v, np.float64) - np.asarray(golden[k], np.float64)
                )))
                errs.append(f"{k}: max|diff|={diff:.3e}")
        results[name] = "ok" if not errs else "MISMATCH: " + "; ".join(errs)
    if record:
        np.savez(goldens_path, **fps)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--goldens", required=True)
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--rtol", type=float, default=2e-3)
    ap.add_argument("--atol", type=float, default=2e-3)
    ap.add_argument("--flux")
    ap.add_argument("--flux-depth", default=None,
                    help="D,S truncated-depth fingerprint (memory bound)")
    ap.add_argument("--flux-vae")
    ap.add_argument("--t5")
    ap.add_argument("--clip-l")
    ap.add_argument("--hps")
    ap.add_argument("--pick-score")
    ap.add_argument("--clip-score")
    ap.add_argument("--image-reward")
    ap.add_argument("--image-reward-med-config")
    ap.add_argument("--hunyuan-llm")
    ap.add_argument("--hunyuan-vae")
    ap.add_argument("--hunyuan-dit",
                    help="HunyuanVideo transformer .pt file or directory")
    ap.add_argument("--mochi")
    ap.add_argument("--mochi-vae")
    args = ap.parse_args(argv)

    specs: Dict[str, Dict[str, Any]] = {}
    if args.flux:
        depth = None
        if args.flux_depth:
            d, s = args.flux_depth.split(",")
            depth = (int(d), int(s))
        specs["flux"] = {"path": args.flux, "depth": depth}
    for flag, name in [
        ("flux_vae", "flux_vae"), ("t5", "t5"), ("clip_l", "clip_l"),
        ("hps", "hps"), ("pick_score", "pick_score"),
        ("clip_score", "clip_score"), ("hunyuan_llm", "hunyuan_llm"),
        ("hunyuan_vae", "hunyuan_vae"), ("hunyuan_dit", "hunyuan_dit"),
        ("mochi", "mochi"),
        ("mochi_vae", "mochi_vae"),
    ]:
        v = getattr(args, flag)
        if v:
            specs[name] = {"path": v}
    if args.image_reward:
        specs["image_reward"] = {
            "path": args.image_reward,
            "med_config": args.image_reward_med_config,
        }
    if not specs:
        ap.error("no checkpoints given")

    results = run_checks(specs, args.goldens, args.record,
                         rtol=args.rtol, atol=args.atol)
    bad = 0
    for name, status in results.items():
        print(f"{name}: {status}")
        bad += status.startswith("MISMATCH")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
