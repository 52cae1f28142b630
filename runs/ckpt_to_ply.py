"""Write the standard point_cloud.ply from an orbax checkpoint of a run
(early-exit path: the train CLI only writes the PLY at num_iters).
Usage: python runs/ckpt_to_ply.py <model_path> [step|-2] [--surfel]"""

import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    model_path = sys.argv[1]
    step = int(sys.argv[2]) if len(sys.argv) > 2 else -2
    surfel = "--surfel" in sys.argv
    import orbax.checkpoint as ocp
    from divshot_tpu.train import checkpoint as CK
    from divshot_tpu.splat.gaussians import GaussianParams
    from divshot_tpu.gsio import ply as P

    if step == -2:
        step = CK.latest_step(model_path)
        assert step, f"no checkpoints under {model_path}"
    path = os.path.join(CK.checkpoint_dir(model_path, step), "state")
    raw = ocp.PyTreeCheckpointer().restore(path)
    pd = raw["params"]
    fields = {f: pd[f] for f in pd}
    params = GaussianParams(**fields)
    if surfel:
        # persist the surfel convention (third axis at the flat log-scale)
        from divshot_tpu.train.geometry import flatten_to_surfels
        params = flatten_to_surfels(params)
    ply = os.path.join(model_path, "point_cloud.ply")
    P.save_ply(ply, params)
    print(f"wrote {ply} from iteration_{step}")


if __name__ == "__main__":
    main()
