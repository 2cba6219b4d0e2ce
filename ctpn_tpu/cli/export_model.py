"""Export CLI (reference `ctpn/generate_pb.py:13-41`).

Cuts a training checkpoint down to a self-contained inference artifact:

    python -m ctpn_tpu.cli.export_model --ckpt <solver output dir> \
        --out data/ctpn_artifact

Also converts the reference's pretrained formats:
    --npy VGG_imagenet.npy           (backbone bootstrap)
    --tf-vars vars.npz               ({tf_name: array} dump of a TF ckpt)
"""

from __future__ import annotations

import argparse
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.config import cfg_from_file
from ctpn_tpu.models.factory import get_network
from ctpn_tpu.utils.weights import (
    convert_tf_vars,
    export_params,
    load_pretrained_into,
)


def main(argv=None):
    p = argparse.ArgumentParser(description="Export CTPN inference artifact")
    p.add_argument("--cfg", default=None)
    p.add_argument("--ckpt", default=None, help="solver output dir (latest step)")
    p.add_argument("--npy", default=None, help="VGG_imagenet.npy to convert")
    p.add_argument("--tf-vars", default=None, help="npz of {tf_var_name: array}")
    p.add_argument("--out", required=True)
    p.add_argument(
        "--frozen", action="store_true",
        help="write a self-contained frozen artifact (serialized StableHLO "
        "programs + weights, the `generate_pb.py` ctpn.pb analogue) instead "
        "of a weights-only artifact",
    )
    p.add_argument(
        "--frozen-shapes", default=None,
        help="comma list of NxHxW program shapes to compile into the frozen "
        "artifact, e.g. 1x608x912,8x608x912 (default: every cfg.TPU.BUCKETS "
        "shape at batch 1)",
    )
    p.add_argument(
        "--frozen-dp", type=int, default=None,
        help="export frozen programs data-parallel over this many devices "
        "(batch dim-0 sharded; every shape's batch must divide evenly)",
    )
    args = p.parse_args(argv)

    if args.cfg:
        cfg_from_file(args.cfg)

    model = get_network("VGGnet_test")
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 608, 608, 3), jnp.float32)
    )["params"]

    if args.ckpt:
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(osp.abspath(osp.join(args.ckpt, "checkpoints")))
        latest = mgr.latest_step()
        if latest is None:
            raise SystemExit(f"no checkpoints under {args.ckpt}")
        restored = mgr.restore(latest)
        params = restored["state"]["params"]
        print(f"restored step {latest} from {args.ckpt}")
    if args.npy:
        params = load_pretrained_into(params, args.npy)
        print(f"merged pretrained weights from {args.npy}")
    if args.tf_vars:
        tf_vars = dict(np.load(args.tf_vars, allow_pickle=True))
        params = convert_tf_vars(params, tf_vars)
        print(f"merged TF variables from {args.tf_vars}")

    if args.frozen:
        from ctpn_tpu.inference.frozen import export_frozen

        shapes = None
        if args.frozen_shapes:
            shapes = []
            for s in args.frozen_shapes.split(","):
                try:
                    dims = tuple(int(d) for d in s.split("x"))
                except ValueError:
                    dims = ()
                # fail HERE with a pointed message, not as an opaque
                # unpack/trace error deep inside jax.export
                if len(dims) != 3 or any(d <= 0 for d in dims):
                    p.error(
                        f"--frozen-shapes entry {s!r} must be NxHxW "
                        "(three positive ints, e.g. 1x608x912)"
                    )
                if dims[1] % 16 or dims[2] % 16:
                    p.error(
                        f"--frozen-shapes entry {s!r}: H and W must be "
                        "multiples of the 16-px stride"
                    )
                shapes.append(dims)
        out = export_frozen(params, args.out, shapes=shapes,
                            dp_devices=args.frozen_dp)
    elif args.out.endswith(".npz"):
        from ctpn_tpu.utils.weights import export_params_npz

        out = export_params_npz(params, args.out)
    else:
        out = export_params(params, args.out)
    print(f"wrote inference artifact to {out}")


if __name__ == "__main__":
    main()
