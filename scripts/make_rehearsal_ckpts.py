"""Synthesize a released-layout checkpoint tree at the tiny preset.

Writes, under ``--out`` (the rehearsal ``CKPT_ROOT``), the exact directory
structure `scripts/first_deploy.sh` expects on a real deploy box
(README.md "Real-checkpoint parity procedure"):

    flux-dev/transformer/diffusion_pytorch_model.safetensors  (diffusers names)
    flux-dev/vae/diffusion_pytorch_model.safetensors          (diffusers names)
    flux-dev/text_encoder/model.safetensors                   (HF CLIPTextModel)
    flux-dev/text_encoder_2/model.safetensors                 (HF T5EncoderModel)
    flux-dev/tokenizer/merges.txt                             (CLIP BPE table)
    flux-dev/tokenizer_2/{tokenizer.json,tokenizer_config.json}
    HPS_v2.1_compressed.pt  (+ sibling open_clip_config.json) (OpenCLIP names)

All weights are random at the ``MIXGRPO_MODEL_PRESET=tiny`` geometry
(mixgrpo_tpu/presets.py) but every FILE FORMAT and LOADER PATH is the real
one, so the deploy script's every line executes before deploy day
(VERDICT r4 #8).  Run: python scripts/make_rehearsal_ckpts.py --out DIR
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def write_flux(fam, flux_dir):
    import jax

    from mixgrpo_tpu.models.flux.model import init_flux
    from mixgrpo_tpu.utils.checkpoint import export_flux_safetensors

    params = init_flux(jax.random.key(0), fam["flux"])
    # the real exporter writes the real diffusers naming
    export_flux_safetensors(
        params, fam["flux"],
        os.path.join(flux_dir, "transformer",
                     "diffusion_pytorch_model.safetensors"),
    )


def write_vae(fam, flux_dir):
    """Diffusers ``AutoencoderKL`` decoder names (models/flux/load.py
    ``load_vae_decoder_params`` is the consumer)."""
    from safetensors.numpy import save_file

    cfg = fam["vae"]
    rng = np.random.default_rng(1)
    st = {}

    def conv(name, cin, cout, k=3):
        st[f"{name}.weight"] = (
            rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05
        )
        st[f"{name}.bias"] = np.zeros(cout, np.float32)

    def gn(name, c):
        st[f"{name}.weight"] = np.ones(c, np.float32)
        st[f"{name}.bias"] = np.zeros(c, np.float32)

    def resnet(name, cin, cout):
        gn(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout)
        gn(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, k=1)

    top = cfg.block_out_channels[-1]
    conv("decoder.conv_in", cfg.latent_channels, top)
    resnet("decoder.mid_block.resnets.0", top, top)
    resnet("decoder.mid_block.resnets.1", top, top)
    a = "decoder.mid_block.attentions.0"
    gn(f"{a}.group_norm", top)
    for n in ("to_q", "to_k", "to_v", "to_out.0"):
        st[f"{a}.{n}.weight"] = (
            rng.normal(size=(top, top)).astype(np.float32) * 0.02
        )
        st[f"{a}.{n}.bias"] = np.zeros(top, np.float32)
    cin = top
    rev = list(reversed(cfg.block_out_channels))
    for bi, cout in enumerate(rev):
        for li in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{bi}.resnets.{li}", cin, cout)
            cin = cout
        if bi < len(rev) - 1:
            conv(f"decoder.up_blocks.{bi}.upsamplers.0.conv", cout, cout)
    gn("decoder.conv_norm_out", cfg.block_out_channels[0])
    conv("decoder.conv_out", cfg.block_out_channels[0], cfg.out_channels)

    d = os.path.join(flux_dir, "vae")
    os.makedirs(d, exist_ok=True)
    save_file(st, os.path.join(d, "diffusion_pytorch_model.safetensors"))


def write_t5(fam, flux_dir):
    """HF ``T5EncoderModel`` weights + a loadable fast tokenizer."""
    from safetensors.numpy import save_file
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    cfg = fam["t5"]
    hf = T5EncoderModel(HFT5Config(
        vocab_size=cfg.vocab, d_model=cfg.d_model, d_ff=cfg.d_ff,
        d_kv=cfg.head_dim, num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.rel_buckets,
        relative_attention_max_distance=cfg.rel_max_distance,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
    )).eval()
    d = os.path.join(flux_dir, "text_encoder_2")
    os.makedirs(d, exist_ok=True)
    save_file(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        os.path.join(d, "model.safetensors"),
    )

    # tokenizer_2: a word-level fast tokenizer whose ids stay inside the
    # tiny vocab; AutoTokenizer.from_pretrained() loads it offline
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = (
        "a an the of in on at and photo painting oil macro shot city skyline"
        " night neon reflections corgi wearing sunglasses beach lighthouse"
        " storm dew covered spider web dawn futuristic cat dog".split()
    )
    vocab = {"<unk>": 0, "<pad>": 1, "</s>": 2}
    for w in words:
        if w not in vocab and len(vocab) < cfg.vocab:
            vocab[w] = len(vocab)
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    td = os.path.join(flux_dir, "tokenizer_2")
    os.makedirs(td, exist_ok=True)
    tok.save(os.path.join(td, "tokenizer.json"))
    with open(os.path.join(td, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "model_max_length": 512,
            "pad_token": "<pad>", "unk_token": "<unk>", "eos_token": "</s>",
        }, f)


def write_clip_l(fam, flux_dir):
    """HF ``CLIPTextModel`` weights (FLUX's pooled-text encoder) + the
    CLIP BPE merges table at the real in-repo location tokenizer/merges.txt."""
    from safetensors.numpy import save_file
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = fam["clip"]
    hf = CLIPTextModel(CLIPTextConfig(
        vocab_size=cfg.text.vocab, hidden_size=cfg.text.width,
        intermediate_size=cfg.text.width * 4,
        num_hidden_layers=cfg.text.layers,
        num_attention_heads=cfg.text.heads,
        max_position_embeddings=cfg.text.context,
        hidden_act="quick_gelu",
    )).eval()
    d = os.path.join(flux_dir, "text_encoder")
    os.makedirs(d, exist_ok=True)
    save_file(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        os.path.join(d, "model.safetensors"),
    )

    td = os.path.join(flux_dir, "tokenizer")
    os.makedirs(td, exist_ok=True)
    # small real merges table; all other text rides the byte fallback.
    # vocab = 512 byte tokens + merges + 2 specials, inside text.vocab
    merges = ["#version: 0.2", "t h", "th e</w>", "a</w>", "o f</w>",
              "i n</w>", "o n</w>", "c a", "ca t</w>", "d o", "do g</w>"]
    with open(os.path.join(td, "merges.txt"), "w") as f:
        f.write("\n".join(merges) + "\n")


def write_hps(fam, out_root):
    """OpenCLIP-format HPS checkpoint (nested under 'state_dict') with a
    sibling open_clip_config.json the loader introspects."""
    import torch

    cfg = fam["clip"]
    v, t = cfg.vision, cfg.text
    rng = np.random.default_rng(2)
    st = {}

    def lin(name, cin, cout):
        st[f"{name}.weight"] = (
            rng.normal(size=(cout, cin)).astype(np.float32) * 0.02
        )
        st[f"{name}.bias"] = np.zeros(cout, np.float32)

    def ln(name, c):
        st[f"{name}.weight"] = np.ones(c, np.float32)
        st[f"{name}.bias"] = np.zeros(c, np.float32)

    def blocks(prefix, n, w):
        for i in range(n):
            b = f"{prefix}.resblocks.{i}"
            ln(f"{b}.ln_1", w)
            st[f"{b}.attn.in_proj_weight"] = (
                rng.normal(size=(3 * w, w)).astype(np.float32) * 0.02
            )
            st[f"{b}.attn.in_proj_bias"] = np.zeros(3 * w, np.float32)
            lin(f"{b}.attn.out_proj", w, w)
            ln(f"{b}.ln_2", w)
            lin(f"{b}.mlp.c_fc", w, 4 * w)
            lin(f"{b}.mlp.c_proj", 4 * w, w)

    npos = (v.image_size // v.patch) ** 2 + 1
    st["visual.conv1.weight"] = (
        rng.normal(size=(v.width, 3, v.patch, v.patch)).astype(np.float32) * 0.02
    )
    st["visual.class_embedding"] = (
        rng.normal(size=(v.width,)).astype(np.float32) * 0.02
    )
    st["visual.positional_embedding"] = (
        rng.normal(size=(npos, v.width)).astype(np.float32) * 0.02
    )
    ln("visual.ln_pre", v.width)
    blocks("visual.transformer", v.layers, v.width)
    ln("visual.ln_post", v.width)
    st["visual.proj"] = (
        rng.normal(size=(v.width, cfg.embed_dim)).astype(np.float32) * 0.02
    )
    st["token_embedding.weight"] = (
        rng.normal(size=(t.vocab, t.width)).astype(np.float32) * 0.02
    )
    st["positional_embedding"] = (
        rng.normal(size=(t.context, t.width)).astype(np.float32) * 0.02
    )
    blocks("transformer", t.layers, t.width)
    ln("ln_final", t.width)
    st["text_projection"] = (
        rng.normal(size=(t.width, cfg.embed_dim)).astype(np.float32) * 0.02
    )
    st["logit_scale"] = np.float32(np.log(1 / 0.07))

    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v_)) for k, v_ in st.items()}},
        os.path.join(out_root, "HPS_v2.1_compressed.pt"),
    )
    with open(os.path.join(out_root, "open_clip_config.json"), "w") as f:
        json.dump({"model_cfg": {
            "embed_dim": cfg.embed_dim,
            "quick_gelu": cfg.quick_gelu,
            "vision_cfg": {"width": v.width, "layers": v.layers,
                           "head_width": v.width // v.heads,
                           "patch_size": v.patch, "image_size": v.image_size},
            "text_cfg": {"width": t.width, "layers": t.layers,
                         "heads": t.heads, "vocab_size": t.vocab,
                         "context_length": t.context},
        }}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="rehearsal CKPT_ROOT")
    args = ap.parse_args()

    os.environ.setdefault("MIXGRPO_MODEL_PRESET", "tiny")
    from mixgrpo_tpu.presets import flux_family

    fam = flux_family()
    flux_dir = os.path.join(args.out, "flux-dev")
    for sub in ("transformer", "vae", "text_encoder", "text_encoder_2",
                "tokenizer", "tokenizer_2"):
        os.makedirs(os.path.join(flux_dir, sub), exist_ok=True)

    write_flux(fam, flux_dir)
    write_vae(fam, flux_dir)
    write_t5(fam, flux_dir)
    write_clip_l(fam, flux_dir)
    write_hps(fam, args.out)
    print(f"rehearsal checkpoint tree written under {args.out}")


if __name__ == "__main__":
    main()
