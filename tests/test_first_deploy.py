"""Deploy-day rehearsal: every line of scripts/first_deploy.sh executes.

VERDICT r4 #8: the deploy script is the designated path for closing the
two environment-blocked validation items (real-weight parity, first
on-pod run), so a deploy-day failure in the script itself is the most
predictable way to lose the win.  This test synthesizes the released
checkpoint layout at the tiny preset (scripts/make_rehearsal_ckpts.py,
MIXGRPO_MODEL_PRESET=tiny — same file formats, loaders, and CLI plumbing
as flux-dev) and runs the script end to end: verify-weights --record,
preprocess with the real T5/CLIP towers and tokenizers, a 3-step GRPO
smoke train with the HPS reward and a checkpoint, and one image served
over HTTP.  A second invocation exercises verify-weights --check against
the recorded goldens.

The round-5 rehearsal that produced this test caught five deploy-day
bugs: the --flux-depth KeyError, reward tokenizers crashing without
CLIP_BPE_PATH, console scripts missing on a bare checkout, --prompt_dir
rejecting a directory, and --mesh_fsdp -1 failing to resolve.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_first_deploy_rehearsal(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpts = tmp_path / "ckpts"
    work = tmp_path / "work"
    goldens = tmp_path / "goldens.npz"

    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("XLA_", "JAX_")) and k != "PALLAS_AXON_POOL_IPS"
    }
    env.update({
        "JAX_PLATFORMS": "cpu",
        "MIXGRPO_MODEL_PRESET": "tiny",
        "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        "CKPT_ROOT": str(ckpts),
        "GOLDENS": str(goldens),
        "FLUX_DEPTH": "1,2",  # actually truncates the tiny (2,4) stacks
        "PORT": "8719",
    })

    r = subprocess.run(
        [sys.executable, "scripts/make_rehearsal_ckpts.py", "--out", str(ckpts)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (ckpts / "flux-dev" / "transformer"
            / "diffusion_pytorch_model.safetensors").exists()

    # full procedure; first run records goldens
    r = subprocess.run(
        ["bash", "scripts/first_deploy.sh", str(work)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=2700,
    )
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-4000:]
    assert "ALL CHECKS PASSED" in out
    assert "recorded" in out  # --record mode ran
    assert goldens.exists()
    png = work / "first_image.png"
    assert png.exists() and png.stat().st_size > 10000
    ckpt_dirs = list((work / "smoke_train").rglob("checkpoints"))
    assert ckpt_dirs, "smoke train left no checkpoint directory"

    # second run: verify-weights --check against the recorded goldens
    env2 = dict(env, SKIP_PREPROCESS="1", SKIP_TRAIN="1", SKIP_SERVE="1")
    r = subprocess.run(
        ["bash", "scripts/first_deploy.sh", str(work)],
        cwd=repo, env=env2, capture_output=True, text=True, timeout=1200,
    )
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-4000:]
    assert "verify-weights check" in out
    for name in ("flux", "flux_vae", "t5", "clip_l", "hps"):
        assert f"{name}: ok" in out, out[-4000:]
