from divshot_tpu.viewer.offline import render_views, render_path  # noqa: F401
from divshot_tpu.viewer.keyframes import CameraKeyFrame, KeyFrameTimeline  # noqa: F401
