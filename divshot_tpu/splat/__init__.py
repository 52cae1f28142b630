from divshot_tpu.splat.gaussians import GaussianParams  # noqa: F401
