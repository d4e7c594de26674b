from gaussian_splatting_tpu.parallel.mesh import (
    make_mesh,
    dp_train_step,
)

__all__ = ["make_mesh", "dp_train_step"]
