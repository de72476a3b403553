from wis_tpu.parallel.mesh import (
    make_mesh,
    replicate_params,
    shard_params,
    whisper_param_specs,
)

__all__ = [
    "make_mesh",
    "whisper_param_specs",
    "shard_params",
    "replicate_params",
]
