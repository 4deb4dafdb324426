"""True multi-process pod-path test: 2 jax processes x 2 CPU devices.

The reference never tests multi-node (SURVEY.md §4); here two real
processes rendezvous through jax.distributed and run a full GRPO training
step over a global 2x2 (dp, fsdp) mesh, validating the host-local ->
global array plumbing (ADVICE r1 medium: multi-host data path).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_step(tmp_path):
    from mixgrpo_tpu.data.dataset import EmbeddingCacheWriter
    from mixgrpo_tpu.models.flux.model import FluxConfig

    flux_cfg = FluxConfig.tiny()
    w = EmbeddingCacheWriter(str(tmp_path / "cache"))
    rng = np.random.default_rng(0)
    for i in range(4):
        w.add(
            rng.normal(size=(8, flux_cfg.context_dim)).astype(np.float32),
            rng.normal(size=(flux_cfg.pooled_dim,)).astype(np.float32),
            f"p{i}",
        )
    w.finish()

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_train_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("XLA_", "JAX_"))
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    metrics = [
        json.load(open(tmp_path / f"metrics_{pid}.json")) for pid in range(2)
    ]
    # the global reward mean must agree across hosts (process_allgather)
    assert abs(metrics[0]["reward"] - metrics[1]["reward"]) < 1e-6
    # params are globally sharded: checksums agree, and the update moved them
    assert abs(metrics[0]["param_checksum"] - metrics[1]["param_checksum"]) < 1e-4
    for m in metrics:
        assert np.isfinite(m["loss"])
        assert m["param_delta"] > 0


@pytest.mark.slow
def test_two_process_recipe_run(tmp_path):
    """Recipe-structured multi-controller run (VERDICT r4 #4): 2 processes
    x 4 devices on a (dp=2, fsdp=4) mesh, 3 iterations with window walk and
    per-host prompt shards, one mid-run Orbax multi-host save, and a
    fresh-trainer resume that must land bitwise on the uninterrupted run.
    """
    from mixgrpo_tpu.data.dataset import EmbeddingCacheWriter
    from mixgrpo_tpu.models.flux.model import FluxConfig

    flux_cfg = FluxConfig.tiny()
    w = EmbeddingCacheWriter(str(tmp_path / "cache"))
    rng = np.random.default_rng(0)
    for i in range(8):
        w.add(
            rng.normal(size=(8, flux_cfg.context_dim)).astype(np.float32),
            rng.normal(size=(flux_cfg.pooled_dim,)).astype(np.float32),
            f"p{i}",
        )
    w.finish()

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_recipe_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("XLA_", "JAX_"))
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    m = [
        json.load(open(tmp_path / f"recipe_metrics_{pid}.json"))
        for pid in range(2)
    ]
    # params bitwise identical across hosts after EVERY apply (the dp
    # replicas live on different hosts; any per-host RNG/data skew or
    # non-participating-host collective diverges them)
    assert m[0]["digests"] == m[1]["digests"]
    assert len(m[0]["digests"]) == 3
    # every apply moved the params
    assert len(set(m[0]["digests"])) == 3
    # cross-host reward gather agrees every iteration
    for r0, r1 in zip(m[0]["rewards"], m[1]["rewards"]):
        assert abs(r0 - r1) < 1e-6
    # the window walked (iters_per_group=1) and agrees across hosts
    assert m[0]["windows"] == m[1]["windows"]
    assert len(set(m[0]["windows"])) > 1
    for mm in m:
        # restore reproduced the exact saved params on both hosts...
        assert mm["resumed_digest"] == mm["ckpt_digest"]
        assert mm["resume_step"] == 2
        # ...and replaying iteration 3 landed bitwise on the
        # uninterrupted run's final params
        assert mm["resumed_final_digest"] == mm["digests"][2]
        assert abs(mm["resumed_reward"] - mm["rewards"][2]) < 1e-6
    assert m[0]["resumed_final_digest"] == m[1]["resumed_final_digest"]
