"""Convert reference TF1 artifacts into a ctpn_tpu inference artifact.

Handles both reference weight formats (SURVEY.md §5 checkpoint/resume):

* TF1 training checkpoints (``VGGnet_fast_rcnn_iter_50000.ckpt``) — read via
  ``tf.train.load_checkpoint``;
* the frozen ``ctpn.pb`` GraphDef (`ctpn/generate_pb.py` output) — weights
  recovered from Const nodes.

    python -m ctpn_tpu.cli.convert_reference --tf-ckpt checkpoints/VGGnet_fast_rcnn_iter_50000.ckpt --out data/ctpn_artifact
    python -m ctpn_tpu.cli.convert_reference --pb data/ctpn.pb --out data/ctpn_artifact

Mapping details (gate order, HWIO layout) live in
`ctpn_tpu/utils/weights.py::convert_tf_vars`.
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def vars_from_tf_checkpoint(prefix: str) -> Dict[str, np.ndarray]:
    import tensorflow as tf

    reader = tf.train.load_checkpoint(prefix)
    out = {}
    for name in reader.get_variable_to_shape_map():
        # strip optimizer slots (Adam moments etc.)
        if "/Adam" in name or "Momentum" in name or "RMSProp" in name:
            continue
        out[name] = reader.get_tensor(name)
    return out


def vars_from_frozen_pb(path: str) -> Dict[str, np.ndarray]:
    import tensorflow as tf

    gd = tf.compat.v1.GraphDef()
    with open(path, "rb") as f:
        gd.ParseFromString(f.read())
    out = {}
    for node in gd.node:
        if node.op != "Const":
            continue
        try:
            arr = tf.make_ndarray(node.attr["value"].tensor)
        except Exception:
            continue
        if arr.ndim >= 1 and arr.size > 1:
            # frozen names look like 'conv1_1/weights' already; some get a
            # '/read' or enclosing scope — normalize common patterns
            name = node.name
            for suffix in ("/read",):
                if name.endswith(suffix):
                    name = name[: -len(suffix)]
            out[name] = arr
    return out


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ctpn_tpu.config import cfg_from_file
    from ctpn_tpu.models.factory import get_network
    from ctpn_tpu.utils.weights import convert_tf_vars, export_params

    p = argparse.ArgumentParser(description="Convert reference TF1 weights")
    p.add_argument("--cfg", default=None)
    p.add_argument("--tf-ckpt", default=None, help="TF1 checkpoint prefix")
    p.add_argument("--pb", default=None, help="frozen ctpn.pb path")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.cfg:
        cfg_from_file(args.cfg)
    if not args.tf_ckpt and not args.pb:
        raise SystemExit("pass --tf-ckpt or --pb")

    tf_vars = (
        vars_from_tf_checkpoint(args.tf_ckpt)
        if args.tf_ckpt
        else vars_from_frozen_pb(args.pb)
    )
    print(f"read {len(tf_vars)} tensors")
    for k in sorted(tf_vars)[:20]:
        print("  ", k, tf_vars[k].shape)

    model = get_network("VGGnet_test")
    # init only provides the param-tree skeleton convert_tf_vars fills in;
    # parameter shapes are spatial-size-independent, so init small
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3), jnp.float32)
    )["params"]
    params = convert_tf_vars(params, tf_vars)
    out = export_params(params, args.out)
    print(f"wrote artifact to {out}")


if __name__ == "__main__":
    main()
