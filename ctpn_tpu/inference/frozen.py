"""Frozen inference artifact: serialized StableHLO + weights in ONE file.

The reference freezes its graph into `data/ctpn.pb` — a self-contained file
that `demo_pb.py:66-75` loads and runs WITHOUT the model-building code
(`generate_pb.py:13-41` cuts at the two head tensors; proposal decoding then
runs host-side). The TPU-native equivalent built here goes further: the
entire jitted detect program — preprocess (mean-subtract) -> VGG16 -> BiLSTM
-> heads -> on-device proposal decode (incl. NMS) -> text connector — is
serialized as portable StableHLO bytes via `jax.export`, with the weights
riding in the same `.npz`. Loading needs jax + numpy only: no flax, no model
code, no config. The artifact's output ABI is a flat tuple of plain arrays
(like the reference's frozen graph exposing named tensors):

    (rois, roi_valid, roi_count, recs, line_valid, line_count)

per image: ``rois`` (post_n, 5) [score, x1, y1, x2, y2] proposals with
``roi_valid`` mask, ``recs`` (max_lines, 9) text-line records (8 corner
coords + score, `text_proposal_connector.py:47-64` layout) with
``line_valid`` mask and ``line_count``.

Shapes are static per compiled program (bucketed, like every other inference
path here), so the artifact stores one StableHLO module per exported
(batch, height, width) shape. Programs lower for the platform present at
export time (a TPU-exported artifact embeds the Pallas NMS kernel; a
CPU-exported one the XLA fallback) — the loader checks the platform and
fails with a clear message on mismatch, the same way a GPU-frozen `.pb`
will not retarget.
"""

from __future__ import annotations

import json
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FORMAT = "ctpn-frozen-v1"
ABI = ("rois", "roi_valid", "roi_count", "recs", "line_valid", "line_count")

# jax.export records canonical StableHLO platform names ('cuda'/'rocm');
# jax.default_backend() reports the PJRT family name ('gpu'). Normalize
# both sides before comparing.
_PLATFORM_ALIASES = {"cuda": "gpu", "rocm": "gpu"}
# Proxy backends that register under their own PJRT name but compile and
# execute TPU programs (single-chip tunnel used on this box). Explicit
# allowlist — an unknown plugin name must NOT slip through to a confusing
# deserialization failure.
_TPU_TUNNEL_BACKENDS = frozenset({"axon"})


def _canon_platform(name: str) -> str:
    n = name.lower()
    return _PLATFORM_ALIASES.get(n, n)


def _backend_runs_platforms(backend: str, platforms) -> bool:
    """True iff the runtime ``backend`` can execute one of ``platforms``."""
    b = _canon_platform(backend)
    plats = {_canon_platform(p) for p in platforms}
    if b in plats:
        return True
    return "tpu" in plats and b in _TPU_TUNNEL_BACKENDS


def is_frozen(path: str) -> bool:
    """True if ``path`` is a frozen artifact (vs a weights-only npz/dir)."""
    if not path.endswith(".npz"):
        return False
    try:
        with np.load(path) as z:
            return "__meta__" in z.files
    except Exception:
        return False


def export_frozen(
    params,
    out_path: str,
    shapes: Sequence[Tuple[int, int, int]] = None,
    mode: Optional[str] = None,
    model=None,
    dp_devices: Optional[int] = None,
) -> str:
    """Serialize the full detect program + weights into ``out_path`` (.npz).

    ``shapes``: (batch, bucket_h, bucket_w) triples to compile; defaults to
    every cfg.TPU.BUCKETS shape at batch 1 (the demo contract). Heights and
    widths must be multiples of the 16-px stride, like all bucket shapes.

    ``dp_devices``: export each program data-parallel over that many
    devices (params replicated, batch dim-0 sharded — `parallel/dp.py`'s
    inference recipe baked into the artifact). Every shape's batch must
    divide evenly; the loader needs >= that many devices to run it.
    """
    from jax import export as jexport

    from ctpn_tpu.config import cfg
    from ctpn_tpu.inference.pipeline import build_detect_fn
    from ctpn_tpu.models.factory import get_network

    model = model or get_network("VGGnet_test")
    mode = mode or cfg.TEST.DETECT_MODE
    if shapes is None:
        shapes = [(1, bh, bw) for bh, bw in cfg.TPU.BUCKETS]
    detect = build_detect_fn(model, mode=mode)
    leaves, treedef = jax.tree_util.tree_flatten(params)

    def flat_fn(leaf_list, images, im_info):
        p = jax.tree_util.tree_unflatten(treedef, leaf_list)
        props, lines = detect(p, images, im_info)
        return (props.rois, props.valid, props.count,
                lines.recs, lines.valid, lines.count)

    if dp_devices and dp_devices > 1:
        from ctpn_tpu.parallel.mesh import (data_sharding, make_mesh,
                                            replicated)

        bad = [s for s in shapes if s[0] % dp_devices]
        if bad:
            raise ValueError(
                f"batch of shapes {bad} not divisible by dp_devices="
                f"{dp_devices}"
            )
        if len(jax.devices()) < dp_devices:
            raise RuntimeError(
                f"dp_devices={dp_devices} but only {len(jax.devices())} "
                "devices visible at export"
            )
        mesh = make_mesh(jax.devices()[:dp_devices])
        jitted = jax.jit(
            flat_fn,
            in_shardings=(replicated(mesh), data_sharding(mesh),
                          data_sharding(mesh)),
        )
    else:
        dp_devices = 1
        jitted = jax.jit(flat_fn)

    blobs: Dict[str, np.ndarray] = {}
    platforms = None
    for n, bh, bw in shapes:
        exp = jexport.export(jitted)(
            [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves],
            jax.ShapeDtypeStruct((n, bh, bw, 3), jnp.uint8),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
        )
        platforms = list(exp.platforms)
        blobs[f"mlir/{n}x{bh}x{bw}"] = np.frombuffer(exp.serialize(), np.uint8)

    meta = {
        "format": FORMAT,
        "abi": list(ABI),
        "mode": mode,
        "platforms": platforms,
        "shapes": [list(s) for s in shapes],
        "n_params": len(leaves),
        # the loader's detect_image applies the demo's double resize
        # (`demo.py:21-25` then `test.py:18-24`) from these stored values —
        # the artifact does not depend on the consumer's config
        "text_scale": int(cfg.TEXT.SCALE),
        "text_max_scale": int(cfg.TEXT.MAX_SCALE),
        "test_scale": int(cfg.TEST.SCALES[0]),
        "test_max_size": int(cfg.TEST.MAX_SIZE),
        "dp_devices": int(dp_devices),
        "jax_version": jax.__version__,
    }
    arrays = {f"param/{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if not out_path.endswith(".npz"):
        out_path += ".npz"
    np.savez(out_path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), np.uint8), **blobs, **arrays)
    return out_path


class FrozenCTPN:
    """Loader/runner for a frozen artifact. Needs jax + numpy only.

    Plays the role of the reference's `demo_pb.py` session: load bytes,
    look up callables, feed images — except post-processing is already
    inside the program, so the outputs are final text-line records.
    """

    def __init__(self, path: str):
        with np.load(path) as z:
            self.meta = json.loads(bytes(z["__meta__"]).decode())
            if self.meta.get("format") != FORMAT:
                raise ValueError(f"{path}: not a {FORMAT} artifact")
            self._leaves = [
                z[f"param/{i}"] for i in range(self.meta["n_params"])
            ]
            self._blobs = {
                tuple(int(d) for d in k.split("/")[1].split("x")): bytes(z[k])
                for k in z.files if k.startswith("mlir/")
            }
        self._fns = {}
        backend = jax.default_backend()
        plats = self.meta.get("platforms") or []
        if plats and not _backend_runs_platforms(backend, plats):
            raise RuntimeError(
                f"artifact was exported for {plats}, runtime backend is "
                f"'{backend}' — re-export on this platform "
                "(cli/export_model.py --frozen)"
            )

    @property
    def shapes(self):
        """Exported (batch, bucket_h, bucket_w) triples."""
        return sorted(self._blobs)

    def _fn_for(self, key):
        if key not in self._fns:
            from jax import export as jexport

            call = jexport.deserialize(self._blobs[key]).call
            n_dev = int(self.meta.get("dp_devices") or 1)
            if n_dev > 1:
                # a DP-exported program must run in an n_dev context: wrap
                # in a jit carrying the same shardings (params replicated,
                # batch dim-0 sharded) over the local devices
                from jax.sharding import Mesh, NamedSharding, PartitionSpec

                if len(jax.devices()) < n_dev:
                    raise RuntimeError(
                        f"artifact program was exported for {n_dev} "
                        f"devices; only {len(jax.devices())} visible"
                    )
                mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
                repl = NamedSharding(mesh, PartitionSpec())
                ds = NamedSharding(mesh, PartitionSpec("data"))
                call = jax.jit(call, in_shardings=(repl, ds, ds))
            self._fns[key] = call
        return self._fns[key]

    def run_batch(self, images: np.ndarray, im_info: np.ndarray):
        """(N, bh, bw, 3) uint8 BGR + (N, 3) im_info -> the flat ABI tuple."""
        key = (int(images.shape[0]), int(images.shape[1]), int(images.shape[2]))
        if key not in self._blobs:
            raise ValueError(
                f"no exported program for shape {key}; artifact has "
                f"{self.shapes}"
            )
        return self._fn_for(key)(
            self._leaves, jnp.asarray(images, jnp.uint8),
            jnp.asarray(im_info, jnp.float32),
        )

    def detect_image(self, im_bgr: np.ndarray) -> np.ndarray:
        """One uint8 BGR image -> (M, 9) line records in ORIGINAL coords.

        Same double-resize + unscale contract as CTPNPredictor.detect_image
        (`demo.py:47-60`), but padding into one of the artifact's exported
        batch-1 buckets instead of compiling the exact shape.
        """
        from ctpn_tpu.inference.pipeline import unscale_records
        from ctpn_tpu.utils.image import (pick_bucket, prep_image,
                                          resize_factor, resize_im)

        m = self.meta
        resized, f1 = resize_im(im_bgr, m["text_scale"], m["text_max_scale"])
        buckets = [(h, w) for n, h, w in self.shapes if n == 1]
        if not buckets:
            raise ValueError("artifact has no batch-1 program")
        f2 = resize_factor(resized.shape[0], resized.shape[1],
                           m["test_scale"], m["test_max_size"])
        data, info, pad = prep_image(
            resized, scale=m["test_scale"], max_scale=m["test_max_size"],
            bucket=pick_bucket(int(resized.shape[0] * f2),
                               int(resized.shape[1] * f2), buckets),
        )
        out = self.run_batch(data[None], info[None])
        recs, count = out[3], out[5]
        return unscale_records(np.asarray(recs[0]), int(count[0]), f1, info,
                               y_off=pad)

    def detect_path(self, path: str) -> np.ndarray:
        from ctpn_tpu.utils.image import load_image_bgr

        return self.detect_image(load_image_bgr(path))


class _FrozenLines(NamedTuple):
    """Duck-typed TextLines view over the flat ABI (recs/valid/count)."""

    recs: Any
    valid: Any
    count: Any


class FrozenPredictor:
    """CTPNPredictor-compatible facade over a frozen artifact.

    Exposes the ``mode`` / ``run_padded`` / ``warmup`` surface that
    `serving.py` and `inference/streaming.py` drive, so a frozen file
    deploys interchangeably with live params — the ctpn.pb-in-production
    story. Unlike CTPNPredictor it cannot compile new shapes: every
    (batch, bucket) the consumer will feed must have been exported
    (`export_model.py --frozen-shapes 8x608x912,...` for a max_batch-8
    server).
    """

    def __init__(self, frozen: FrozenCTPN, mode: Optional[str] = None):
        self.frozen = frozen
        if mode and mode != frozen.meta["mode"]:
            raise ValueError(
                f"artifact was frozen in mode {frozen.meta['mode']!r}; "
                f"cannot serve mode {mode!r} — re-export"
            )
        self.mode = frozen.meta["mode"]
        # (bucket_h, bucket_w) shapes actually run, for health reporting
        # (mirrors CTPNPredictor._fns keys)
        self._fns: Dict[Tuple[int, int], bool] = {}

    def run_batch(self, images: np.ndarray, im_info: np.ndarray):
        out = self.frozen.run_batch(images, im_info)
        self._fns[(int(images.shape[1]), int(images.shape[2]))] = True
        props = out[:3]
        return props, _FrozenLines(recs=out[3], valid=out[4], count=out[5])

    def run_padded(self, images, infos, batch_size: int):
        pad = batch_size - len(images)
        stacked = np.stack(list(images) + [images[0]] * pad)
        stacked_i = np.stack(list(infos) + [infos[0]] * pad)
        return self.run_batch(stacked, stacked_i)

    def detect_image(self, im_bgr: np.ndarray) -> np.ndarray:
        return self.frozen.detect_image(im_bgr)

    def warmup(self, bucket: Optional[Tuple[int, int]] = None, batch: int = 1):
        """Pre-run exported programs (all shapes at ``batch``, or one bucket)."""
        shapes = [s for s in self.frozen.shapes if s[0] == batch]
        if bucket is not None:
            shapes = [s for s in shapes if (s[1], s[2]) == tuple(bucket)]
        if not shapes:
            raise ValueError(
                f"artifact has no batch-{batch} program"
                + (f" for bucket {tuple(bucket)}" if bucket else "")
                + f"; exported shapes: {self.frozen.shapes}"
            )
        for n, bh, bw in shapes:
            img = np.full((n, bh, bw, 3), 128, np.uint8)
            info = np.tile(np.array([bh, bw, 1.0], np.float32), (n, 1))
            _, lines = self.run_batch(img, info)
            np.asarray(lines.count)  # fetch a VALUE (tunnel warmup contract)
