"""Capture a jax.profiler trace of the end-to-end inference program.

    python scripts/profile_forward.py --out /tmp/ctpn_trace [--batch 8]

View with xprof/tensorboard (`tensorboard --logdir /tmp/ctpn_trace`).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/ctpn_trace")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bucket", type=int, nargs=2, default=(608, 912))
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ctpn_tpu.inference.pipeline import build_detect_fn
    from ctpn_tpu.models.factory import get_network
    from ctpn_tpu.utils.compilation import ensure_compilation_cache
    from ctpn_tpu.utils.timer import profile_trace

    ensure_compilation_cache()
    bh, bw = args.bucket
    model = get_network("VGGnet_test")
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, bh, bw, 3), jnp.float32)
    )["params"]
    detect = jax.jit(build_detect_fn(model, mode="H"))
    images = jnp.asarray(
        rng.uniform(0, 255, (args.batch, bh, bw, 3)).astype(np.float32)
    )
    infos = jnp.asarray(
        np.tile(np.array([bh - 8, bw - 12, 1.0], np.float32), (args.batch, 1))
    )
    # compile outside the trace
    _, lines = detect(params, images, infos)
    np.asarray(lines.count)

    with profile_trace(args.out):
        for _ in range(5):
            _, lines = detect(params, images, infos)
        np.asarray(lines.count)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
