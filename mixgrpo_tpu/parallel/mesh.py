"""Device mesh construction and multi-host initialization.

TPU-native replacement for the reference's NCCL/torchrun runtime
(zqqqqz2000/MixGRPO fastvideo/utils/parallel_states.py:22-62 process-group
bookkeeping; scripts/finetune/finetune_flux_grpo_MixGRPO.sh:84-120 pdsh +
torchrun + NCCL_IB_* transport tuning).  On TPU none of that exists:
``jax.distributed.initialize`` performs rendezvous, and collectives are
compiled into XLA over ICI/DCN from sharding annotations — there is no
transport-tuning env surface.

Mesh axes:
  dp    data parallel (prompt groups)        — reference's 32-rank DP
  fsdp  weight sharding (ZeRO-3-like)        — reference's FSDP full-shard
  sp    Ulysses sequence parallel            — reference's sp_size (off=1)
  tp    tensor parallel (heads / mlp shards) — absent in reference (extra)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1: use all remaining devices
    fsdp: int = 1
    sp: int = 1
    tp: int = 1

    def resolved(self, n_devices: int) -> "MeshConfig":
        """Resolve one ``-1`` axis (any of dp/fsdp/sp/tp) to "all remaining
        devices" — the recipe launch scripts use ``--mesh_fsdp -1`` (round-5
        rehearsal finding: only dp used to resolve)."""
        sizes = {"dp": self.dp, "fsdp": self.fsdp, "sp": self.sp, "tp": self.tp}
        free = [k for k, v in sizes.items() if v == -1]
        assert len(free) <= 1, f"at most one -1 mesh axis, got {free}"
        if free:
            known = 1
            for k, v in sizes.items():
                if k != free[0]:
                    known *= v
            assert n_devices % known == 0, (n_devices, known)
            sizes[free[0]] = n_devices // known
        total = sizes["dp"] * sizes["fsdp"] * sizes["sp"] * sizes["tp"]
        assert total == n_devices, (
            f"mesh {sizes['dp']}x{sizes['fsdp']}x{sizes['sp']}x{sizes['tp']}"
            f" != {n_devices} devices"
        )
        return MeshConfig(sizes["dp"], sizes["fsdp"], sizes["sp"], sizes["tp"])


AXES = ("dp", "fsdp", "sp", "tp")


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    cfg = cfg.resolved(len(devices))
    arr = np.asarray(devices).reshape(cfg.dp, cfg.fsdp, cfg.sp, cfg.tp)
    return Mesh(arr, AXES)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous (replaces torchrun master_addr/port scanning,
    finetune_flux_grpo_MixGRPO.sh:3-20,84).  No-op on a single host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
