from divshot_tpu.models.dynamic import (  # noqa: F401
    DeformationMLP, HexPlaneField, apply_deformation)
