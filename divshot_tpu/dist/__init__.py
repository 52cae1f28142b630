from divshot_tpu.dist.mesh import (  # noqa: F401
    make_mesh, make_parallel_train_step, train_state_shardings)
from divshot_tpu.dist.tiles import render_tiled, band_camera  # noqa: F401
