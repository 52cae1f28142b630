from divshot_tpu.dist.mesh import (  # noqa: F401
    make_mesh, make_parallel_train_step, train_state_shardings)
