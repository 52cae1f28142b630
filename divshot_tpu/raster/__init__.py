from divshot_tpu.raster.render import render  # noqa: F401
