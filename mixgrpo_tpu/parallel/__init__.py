from mixgrpo_tpu.parallel.mesh import MeshConfig, make_mesh, init_distributed
from mixgrpo_tpu.parallel.ring import ring_attention
from mixgrpo_tpu.parallel.ulysses import set_sp_context, ulysses_attention
from mixgrpo_tpu.parallel.sharding import (
    flux_param_specs,
    shard_params,
    data_spec,
    replicated_spec,
    put_global_batch,
    get_local_batch,
    set_activation_mesh,
    get_activation_mesh,
    constrain_attn,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "init_distributed",
    "flux_param_specs",
    "shard_params",
    "data_spec",
    "replicated_spec",
    "put_global_batch",
    "get_local_batch",
    "set_activation_mesh",
    "get_activation_mesh",
    "constrain_attn",
    "ring_attention",
    "set_sp_context",
    "ulysses_attention",
]
