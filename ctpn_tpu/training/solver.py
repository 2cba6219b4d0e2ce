"""Training driver: the reference SolverWrapper rebuilt around orbax.

Covers `lib/fast_rcnn/train.py:12-227`:

* checkpoint every ``SNAPSHOT_ITERS`` + final snapshot, ``max_to_keep=100``
  (`train.py:27,177-182`) — orbax CheckpointManager instead of tf.Saver;
* restore-and-resume recovering the step counter (`train.py:127-137`) —
  from checkpoint metadata instead of filename parsing;
* pretrained VGG bootstrap (`train.py:118-124`) via
  `ctpn_tpu/utils/weights.py`;
* per-iteration metric logging every ``DISPLAY`` steps with speed
  (`train.py:169-175`) plus JSONL metrics in place of TF summaries;
* data-parallel execution over a device mesh (new capability).
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, List, Optional

import jax
import orbax.checkpoint as ocp

from ctpn_tpu.config import cfg
from ctpn_tpu.data.minibatch import RoIDataLayer
from ctpn_tpu.data.pipeline import PrefetchLoader
from ctpn_tpu.models.ctpn import CTPN
from ctpn_tpu.parallel.dp import replicate_state, shard_train_step
from ctpn_tpu.parallel.mesh import make_mesh
from ctpn_tpu.training.train_step import (
    TrainState,
    build_train_step,
    create_train_state,
)
from ctpn_tpu.utils.timer import Stopwatch


class SolverWrapper:
    def __init__(
        self,
        roidb: List[dict],
        output_dir: str,
        log_dir: Optional[str] = None,
        pretrained_model: Optional[str] = None,
        model: Optional[CTPN] = None,
        batch_size: Optional[int] = None,
        data_parallel: bool = True,
    ):
        from ctpn_tpu.models.factory import get_network
        from ctpn_tpu.utils.compilation import ensure_compilation_cache

        ensure_compilation_cache()
        self.roidb = roidb
        self.output_dir = osp.abspath(output_dir)
        self.log_dir = osp.abspath(log_dir) if log_dir else self.output_dir
        self.pretrained_model = pretrained_model
        self.model = model or get_network("VGGnet_train")
        n_dev = jax.device_count() if data_parallel else 1
        self.batch_size = batch_size or max(
            cfg.TRAIN.IMS_PER_BATCH, n_dev
        )
        self.mesh = make_mesh(jax.devices()[:n_dev]) if data_parallel else None
        os.makedirs(self.output_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        self.ckpt_mgr = ocp.CheckpointManager(
            osp.join(self.output_dir, "checkpoints"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=100, create=True
            ),
        )
        self._metrics_path = osp.join(self.log_dir, "metrics.jsonl")
        # optional TensorBoard scalar summaries (reference `train.py:83-88`
        # logs the four losses); opt-in via CTPN_TPU_TENSORBOARD=1 since the
        # TF import is heavy and must not race the JAX TPU runtime
        self._tb = None
        if os.environ.get("CTPN_TPU_TENSORBOARD") == "1":
            try:
                import tensorflow as tf  # noqa: WPS433

                self._tb = tf.summary.create_file_writer(self.log_dir)
            except Exception:
                pass

    # -- checkpointing ----------------------------------------------------
    def snapshot(self, state: TrainState) -> None:
        """Save at state.step (reference `SolverWrapper.snapshot`)."""
        step = int(state.step)
        self.ckpt_mgr.save(
            step, args=ocp.args.StandardSave({"state": jax.device_get(state)})
        )
        self.ckpt_mgr.wait_until_finished()

    def restore(self, state: TrainState) -> TrainState:
        latest = self.ckpt_mgr.latest_step()
        if latest is None:
            return state
        restored = self.ckpt_mgr.restore(
            latest,
            args=ocp.args.StandardRestore({"state": jax.device_get(state)}),
        )
        return restored["state"]

    # -- training ---------------------------------------------------------
    def train_model(
        self,
        max_iters: int,
        restore: bool = False,
        log_every: Optional[int] = None,
    ) -> Dict[str, float]:
        log_every = log_every or cfg.TRAIN.DISPLAY
        from ctpn_tpu.data.minibatch import assemble_batch

        from ctpn_tpu.parallel.mesh import data_sharding

        layer = RoIDataLayer(self.roidb, batch_size=self.batch_size)
        sharding = data_sharding(self.mesh) if self.mesh is not None else None

        def build_and_put(s):
            batch = assemble_batch(*s)
            # H2D in the worker thread: the tunnel put is synchronous, so
            # doing it here overlaps transfer with the main loop's compute
            if sharding is not None:
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sharding), batch
                )
            return jax.tree_util.tree_map(jax.device_put, batch)

        loader = PrefetchLoader(
            sample_fn=layer.next_entries,
            build_fn=build_and_put,
            workers=4,
        )

        # feature extent depends on the batch bucket; compile per bucket
        step_fns: Dict = {}

        state = create_train_state(
            jax.random.PRNGKey(cfg.RNG_SEED),
            self.model,
            (1, cfg.TPU.BUCKETS[0][0], cfg.TPU.BUCKETS[0][1], 3),
        )
        if self.pretrained_model:
            from ctpn_tpu.utils.weights import load_pretrained_into

            state = state.replace(
                params=load_pretrained_into(state.params, self.pretrained_model)
            )
        if restore:
            state = self.restore(state)
        if self.mesh is not None:
            state = replicate_state(state, self.mesh)

        timer = Stopwatch()
        last = {}
        start_iter = int(state.step)
        try:
            for it in range(start_iter, max_iters):
                with timer:
                    batch = loader.get()
                    bh, bw = batch.images.shape[1:3]
                    key = (bh, bw)
                    if key not in step_fns:
                        fn = build_train_step(self.model, bh // 16, bw // 16)
                        if self.mesh is not None:
                            fn = shard_train_step(fn, self.mesh)
                        else:
                            fn = jax.jit(fn, donate_argnums=(0,))
                        step_fns[key] = fn
                    state, metrics = step_fns[key](state, batch)

                if (it + 1) % log_every == 0 or it == start_iter:
                    last = {k: float(v) for k, v in metrics.items()}
                    last.update(step=it + 1, sec_per_iter=timer.mean)
                    with open(self._metrics_path, "a") as f:
                        f.write(json.dumps(last) + "\n")
                    if self._tb is not None:
                        import tensorflow as tf

                        with self._tb.as_default():
                            for k in ("total_loss", "model_loss",
                                      "rpn_cls_loss", "rpn_box_loss",
                                      "learning_rate", "grad_norm"):
                                tf.summary.scalar(k, last[k], step=it + 1)
                    print(
                        f"iter: {it + 1} / {max_iters}, "
                        f"total loss: {last['total_loss']:.4f}, "
                        f"model loss: {last['model_loss']:.4f}, "
                        f"rpn_loss_cls: {last['rpn_cls_loss']:.4f}, "
                        f"rpn_loss_box: {last['rpn_box_loss']:.4f}, "
                        f"lr: {last['learning_rate']:.6f}, "
                        f"speed: {timer.mean:.3f}s / iter"
                    )
                if (it + 1) % cfg.TRAIN.SNAPSHOT_ITERS == 0:
                    self.snapshot(state)
            if max_iters > start_iter:
                self.snapshot(state)
        finally:
            loader.close()
        return last


def train_net(
    roidb: List[dict],
    output_dir: str,
    log_dir: Optional[str] = None,
    pretrained_model: Optional[str] = None,
    max_iters: int = 40000,
    restore: bool = False,
    **kw,
) -> Dict[str, float]:
    """Reference `train_net` entry (`train.py:217-227`)."""
    sw = SolverWrapper(
        roidb,
        output_dir,
        log_dir=log_dir,
        pretrained_model=pretrained_model,
        **kw,
    )
    print("Solving...")
    out = sw.train_model(max_iters, restore=restore)
    print("done solving")
    return out
