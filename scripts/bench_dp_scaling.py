"""Weak-scaling check of the DP train step over virtual CPU devices.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_dp_scaling.py [--per-device-batch 2]

Fixed per-device batch; meshes of 1/2/4/8 devices. Virtual CPU devices
SHARE the host cores, so the work-proportional ideal is step_ms =
1dev_step_ms * devices (total FLOPs grow with global batch on fixed
silicon); ``vs_work_ideal`` ~ 1.0 means GSPMD sharding + the gradient
all-reduce add no overhead beyond the extra work. Flat-line weak scaling
(step time constant as devices grow) is only observable on real chips —
run on a slice for ICI numbers (one chip available through round 2; see
docs/PERFORMANCE.md).
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=2)
    p.add_argument("--bucket", type=int, nargs=2, default=(64, 96))
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ctpn_tpu.models.factory import get_network
    from ctpn_tpu.parallel.dp import (
        replicate_state, shard_batch, shard_train_step,
    )
    from ctpn_tpu.parallel.mesh import make_mesh
    from ctpn_tpu.training.train_step import (
        Batch, build_train_step, create_train_state,
    )
    from ctpn_tpu.utils.compilation import ensure_compilation_cache

    ensure_compilation_cache()
    bh, bw = args.bucket
    model = get_network("VGGnet_train")
    rng = np.random.RandomState(0)
    step_fn = build_train_step(model, bh // 16, bw // 16)

    def batch_for(n):
        b = n * args.per_device_batch
        gt = np.zeros((b, 64, 4), np.float32)
        gt[:, 0] = [10, 10, 25, 25]
        return Batch(
            images=rng.randint(0, 255, (b, bh, bw, 3)).astype(np.uint8),
            im_info=np.tile(np.array([bh, bw, 1.0], np.float32), (b, 1)),
            gt_boxes=gt,
            gt_valid=np.pad(
                np.ones((b, 1), bool), ((0, 0), (0, 63))
            ),
            gt_ishard=np.zeros((b, 64), np.int32),
            dontcare=np.zeros((b, 64, 4), np.float32),
            dontcare_valid=np.zeros((b, 64), bool),
        )

    results = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:n])
        sharded_step = shard_train_step(step_fn, mesh)
        # fresh state per mesh: the sharded step donates its input state
        state0 = create_train_state(
            jax.random.PRNGKey(0), model, (1, bh, bw, 3)
        )
        state = replicate_state(state0, mesh)
        batch = shard_batch(batch_for(n), mesh)
        state, metrics = sharded_step(state, batch)  # compile
        jax.block_until_ready(metrics["total_loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = sharded_step(state, batch)
        jax.block_until_ready(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / args.steps
        results.append(
            {"devices": n, "global_batch": n * args.per_device_batch,
             "step_ms": round(dt * 1e3, 1),
             "loss": float(metrics["total_loss"])}
        )
        print(json.dumps(results[-1]), flush=True)

    base = results[0]["step_ms"]
    for r in results:
        r["vs_1dev"] = round(r["step_ms"] / base, 3)
        # virtual devices SHARE the host cores, so total work (proportional
        # to global batch) sets the floor: ideal step_ms on an
        # oversubscribed host is base * devices, NOT flat. The sharding
        # overhead is the ratio to that work-proportional ideal; flat-line
        # weak scaling is only observable on real chips.
        r["vs_work_ideal"] = round(r["step_ms"] / (base * r["devices"]), 3)
    print(json.dumps({"weak_scaling": results}))


if __name__ == "__main__":
    main()
