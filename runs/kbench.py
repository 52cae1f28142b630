"""Kernel iteration harness: times the Pallas raster fwd/bwd at a chosen
scale point on the real chip, using bench.py's slope-timing protocol (see
bench.py's docstring for why naive timing lies on this backend).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python runs/kbench.py [n] [WxH]
"""
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_kernel_roofline  # noqa: E402
from divshot_tpu.core.cache import enable_compile_cache  # noqa: E402


def main():
    enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    res = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
    w, h = (int(x) for x in res.split("x"))
    for absg in (True, False):
        rl = bench_kernel_roofline(n, w, h, 1 << 23, with_absgrad=absg)
        print({"with_absgrad": absg,
               **{k: round(v, 2) if isinstance(v, float) else v
                  for k, v in rl.items()}})


if __name__ == "__main__":
    main()
