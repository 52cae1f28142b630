"""Live training viewer CLI — train a scene while serving the WebGL2
viewer over HTTP (the headless analog of the reference editor's in-viewport
live training view, ``editor.cpp:1556-1575``).

Usage:
  python -m divshot_tpu.apps.viewer --source_path <scene> [--port 8123]
  python -m divshot_tpu.apps.viewer --demo
"""

from __future__ import annotations

import sys
import time


def main(argv=None):
    from divshot_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    from divshot_tpu.core.config import config_from_flags
    from divshot_tpu.train.session import TrainerSession
    from divshot_tpu.viewer.live import LiveViewerServer

    argv = argv if argv is not None else sys.argv[1:]
    demo = "--demo" in argv
    argv = [a for a in argv if a != "--demo"]
    port = 8123
    if "--port" in argv:
        i = argv.index("--port")
        port = int(argv[i + 1])
        del argv[i:i + 2]
    cfg = config_from_flags(argv)

    session = TrainerSession(cfg)
    if demo:
        import numpy as np
        from divshot_tpu.gsio.synthetic import (
            random_scene, orbit_cameras, render_gt_images)
        from divshot_tpu.train.trainer import Dataset
        rng = np.random.default_rng(cfg.seed)
        gt = random_scene(rng, 20_000, sh_degree=cfg.sh_degree,
                          scale_range=(0.004, 0.03))
        cams = orbit_cameras(32, width=400)
        images = render_gt_images(gt, cams, backend="pallas",
                                  instance_capacity=1 << 19)
        session.load_synthetic(Dataset.from_views(cams, images))
    else:
        if not cfg.source_path:
            print("error: --source_path required (or --demo)")
            return 2
        session.load_train_data()
        if session.error:
            print(session.error)
            return 1

    server = LiveViewerServer(session, port=port).start()
    print(f"live viewer: http://127.0.0.1:{server.port}/")
    session.start_train()
    try:
        while not session.is_terminated():
            time.sleep(1.0)
    except KeyboardInterrupt:
        session.terminate()
    finally:
        server.stop()
    if session.error:
        print(session.error)
        return 1
    print("training done; viewer stopped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
