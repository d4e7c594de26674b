from gaussian_splatting_tpu.parallel.mesh import (
    make_mesh,
    dp_train_step,
)
from gaussian_splatting_tpu.parallel.gsharded import (
    dp_mp_train_step,
    make_2d_mesh,
    make_model_mesh,
    mp_eval_step,
    mp_render,
    mp_train_step,
    shard_state,
)

__all__ = [
    "make_mesh",
    "dp_train_step",
    "dp_mp_train_step",
    "make_2d_mesh",
    "make_model_mesh",
    "mp_eval_step",
    "mp_render",
    "mp_train_step",
    "shard_state",
]
