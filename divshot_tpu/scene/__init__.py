from divshot_tpu.scene.components import (
    GaussianRenderType, GaussianComponent, GaussianCrop, CropVolume,
    CropType, Environment, EnvironmentMode, Light, LightType,
)
from divshot_tpu.scene.scene import Scene, Entity
