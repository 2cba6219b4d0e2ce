"""Weight IO: pretrained VGG bootstrap, TF-checkpoint conversion, export.

Replaces three reference mechanisms:

* ``Network.load`` of the Caffe-converted ``VGG_imagenet.npy`` dict with
  ``ignore_missing=True`` (`lib/networks/network.py:40-53`,
  `train.py:118-124`) -> :func:`load_pretrained_into`;
* the frozen-graph export `ctpn/generate_pb.py:13-41` -> :func:`export_params`
  / :func:`load_params` (orbax standard checkpoint of the param pytree — the
  self-contained inference artifact);
* TF1 variable conversion for parity against reference checkpoints ->
  :func:`convert_tf_vars`: maps a ``{tf_var_name: ndarray}`` dict (produced
  by any TF checkpoint reader) onto this model's pytree, including the
  BiLSTM gate-weight split (TF fuses [x, h] @ W with gate order i, g, f, o —
  the same order this model uses, so the split is a plain slice).

Conv kernels: TF NHWC conv weights are HWIO — identical to flax's layout,
so VGG tensors map without transposition.
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional

import jax
import numpy as np


def _set_in(params: Dict, path, value) -> bool:
    """Set params[path...] = value if the leaf exists and shapes match."""
    node = params
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        return False
    if tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch for {'/'.join(path)}: "
            f"{node[leaf].shape} vs {value.shape}"
        )
    node[leaf] = jax.numpy.asarray(value, dtype=node[leaf].dtype)
    return True


def _trunk_scope(params: Dict) -> Optional[str]:
    for k in params:
        if k.startswith("VGG16Trunk"):
            return k
    return None


def load_pretrained_into(params, npy_path: str, ignore_missing: bool = True):
    """Assign ``VGG_imagenet.npy``-style weights into the param pytree.

    The .npy holds ``{layer: {"weights": w, "biases": b}}`` with HWIO conv
    kernels. Layers that do not exist in the model (fc6/fc7/fc8 classifier
    heads) are skipped, mirroring ``ignore_missing=True``.

    An exported inference artifact (``.npz`` file or orbax directory, see
    :func:`load_params`) is also accepted: its leaves share this model's
    pytree paths, so the overlay is exact — used to fine-tune from a
    previously shipped artifact instead of the ImageNet bootstrap.
    """
    if npy_path.endswith(".npz") or osp.isdir(npy_path):
        donor = load_params(npy_path)
        target = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
        applied = 0
        for key, value in _flatten(donor):
            if _set_in(target, tuple(key.split("/")), value):
                applied += 1
            elif not ignore_missing:
                raise KeyError(f"artifact leaf {key} not found in model")
        if applied == 0:
            # Mirror the npy path's "no layers loaded" guard: a structurally
            # mismatched donor must not silently leave the model at random
            # init when the user explicitly asked to fine-tune from it.
            raise ValueError(
                f"artifact {npy_path} applied zero leaves to the model pytree "
                "(structure mismatch?)"
            )
        return jax.tree_util.tree_map(jax.numpy.asarray, target)
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    params = jax.device_get(params)
    params = jax.tree_util.tree_map(np.asarray, params)
    data = np.load(npy_path, allow_pickle=True, encoding="latin1").item()
    trunk = _trunk_scope(params)
    loaded = []
    for layer, vars_ in data.items():
        w = vars_.get("weights")
        b = vars_.get("biases")
        targets = []
        if trunk and layer in params.get(trunk, {}):
            targets = [(trunk, layer)]
        elif layer in params:
            targets = [(layer,)]
        if not targets:
            if not ignore_missing:
                raise KeyError(f"layer {layer} not found in model")
            continue
        scope = targets[0]
        if w is not None and w.ndim in (2, 4):
            _set_in(params, (*scope, "kernel"), w)
        if b is not None:
            _set_in(params, (*scope, "bias"), b)
        loaded.append(layer)
    if not loaded and not ignore_missing:  # pragma: no cover
        raise ValueError("no layers loaded")
    return jax.tree_util.tree_map(jax.numpy.asarray, params)


def convert_tf_vars(params, tf_vars: Dict[str, np.ndarray], hidden: int = 128):
    """Map reference TF1 CTPN variables onto the model pytree.

    Expected names (as found in the reference graph/checkpoint):
      ``conv*_*/weights|biases``, ``rpn_conv/3x3/weights|biases``,
      ``lstm_o/bidirectional_rnn/fw/lstm_cell/kernel|bias`` (and ``bw``),
      ``lstm_o/weights|biases`` (the 256->512 projection),
      ``rpn_bbox_pred/weights|biases``, ``rpn_cls_score/weights|biases``.
    """
    params = jax.device_get(params)
    params = jax.tree_util.tree_map(np.asarray, params)
    trunk = _trunk_scope(params)

    def get(name):
        return tf_vars.get(name)

    for layer in list(params.get(trunk, {})):
        w, b = get(f"{layer}/weights"), get(f"{layer}/biases")
        if w is not None:
            _set_in(params, (trunk, layer, "kernel"), w)
        if b is not None:
            _set_in(params, (trunk, layer, "bias"), b)

    w = get("rpn_conv/3x3/weights")
    b = get("rpn_conv/3x3/biases")
    if w is not None:
        _set_in(params, ("rpn_conv", "kernel"), w)
    if b is not None:
        _set_in(params, ("rpn_conv", "bias"), b)

    fw_k = get("lstm_o/bidirectional_rnn/fw/lstm_cell/kernel")
    bw_k = get("lstm_o/bidirectional_rnn/bw/lstm_cell/kernel")
    fw_b = get("lstm_o/bidirectional_rnn/fw/lstm_cell/bias")
    bw_b = get("lstm_o/bidirectional_rnn/bw/lstm_cell/bias")
    if fw_k is not None and bw_k is not None:
        c = fw_k.shape[0] - hidden
        in_proj = np.concatenate([fw_k[:c], bw_k[:c]], axis=1)  # (C, 8H)
        _set_in(params, ("bilstm", "input_proj", "kernel"), in_proj)
        _set_in(
            params, ("bilstm", "input_proj", "bias"),
            np.concatenate([fw_b, bw_b]),
        )
        _set_in(params, ("bilstm", "w_h_fw"), fw_k[c:])
        _set_in(params, ("bilstm", "w_h_bw"), bw_k[c:])

    w, b = get("lstm_o/weights"), get("lstm_o/biases")
    if w is not None:
        _set_in(params, ("bilstm", "out_proj", "kernel"), w)
    if b is not None:
        _set_in(params, ("bilstm", "out_proj", "bias"), b)

    for head in ("rpn_bbox_pred", "rpn_cls_score"):
        w, b = get(f"{head}/weights"), get(f"{head}/biases")
        if w is not None:
            _set_in(params, (head, "kernel"), w)
        if b is not None:
            _set_in(params, (head, "bias"), b)
    return jax.tree_util.tree_map(jax.numpy.asarray, params)


def export_params(params, out_dir: str) -> str:
    """Self-contained inference artifact (generate_pb equivalent)."""
    import orbax.checkpoint as ocp

    path = osp.abspath(out_dir)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(osp.join(path, "params"), jax.device_get(params), force=True)
    ckpt.wait_until_finished()
    return path


def _flatten(params, prefix=()):
    for k, v in params.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), np.asarray(v)


def export_params_npz(params, out_file: str, dtype=np.float16) -> str:
    """Single-file compressed artifact (half precision by default).

    The in-repo checkpoint format: ~2.1 bits/param smaller than the orbax
    tree and git-friendly. Half precision costs < 1e-3 relative error on
    the f32 master weights — indistinguishable through the bf16 compute
    path (validated in tests/test_weights.py).
    """
    flat = {k: v.astype(dtype) for k, v in _flatten(jax.device_get(params))}
    bad = [k for k, v in flat.items()
           if v.size and not np.all(np.isfinite(v.astype(np.float32)))]
    if bad:
        raise ValueError(
            f"non-finite values after {np.dtype(dtype).name} cast "
            f"(overflow past the format's range?) in: {bad[:5]}"
        )
    np.savez_compressed(out_file, **flat)
    return osp.abspath(out_file)


def load_params(artifact: str):
    """Load an inference artifact: orbax directory or .npz file."""
    if artifact.endswith(".npz"):
        flat = np.load(artifact)
        params: Dict = {}
        for key in flat.files:
            node = params
            *path, leaf = key.split("/")
            for p in path:
                node = node.setdefault(p, {})
            node[leaf] = jax.numpy.asarray(flat[key], dtype=jax.numpy.float32)
        return params
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(osp.join(osp.abspath(artifact), "params"))
