from quickrank_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    make_mesh_2d,
    shard_step_data,
    step_data_specs,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "make_mesh_2d",
    "shard_step_data",
    "step_data_specs",
]
