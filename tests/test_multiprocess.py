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
