"""Training runtime (reference: src/lib/trainer.py + src/main.py).

One jitted, mesh-sharded program per optimization step:
  render GT heatmaps from splat descriptors (data/render.py)
  -> forward (train mode, BN stats mutable)
  -> GenericLoss (ops/losses.py)
  -> grads -> optax update
Batch is sharded over the 'data' mesh axis, params replicated; the
gradient all-reduce is inserted by the compiler (the reference's
DataParallel scatter/gather analogue, data_parallel.py:64-128).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from centertrack_tpu.data.render import render_batch
from centertrack_tpu.ops.losses import generic_loss
from centertrack_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                           replicated, shard_batch)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg):
    """Step decay x0.1 at each epoch in lr_step
    (reference: main.py:92-96). Returns epoch -> lr."""
    def lr_for_epoch(epoch: int) -> float:
        lr = cfg.lr
        for e in cfg.lr_step:
            if epoch >= e:
                lr *= 0.1
        return lr
    return lr_for_epoch


def make_optimizer(cfg):
    """(reference: main.py:17-26; torch Adam defaults)"""
    if cfg.optim == "adam":
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr)
    elif cfg.optim == "sgd":
        return optax.inject_hyperparams(
            functools.partial(optax.sgd, momentum=0.9))(
            learning_rate=cfg.lr)
    raise ValueError(cfg.optim)


class Trainer:
    """(reference: trainer.py:102-317)"""

    def __init__(self, cfg, model, params, batch_stats, mesh=None,
                 dataset_meta=None, debug_dir: str = ""):
        self.cfg = cfg
        from centertrack_tpu.ops.dcn import set_local_impl
        set_local_impl(getattr(cfg, "local_impl", "auto"))
        self.model = model
        self.dataset_meta = dataset_meta
        self.debug_dir = debug_dir or "exp_debug"
        self._debug_step = None  # built lazily when cfg.debug > 0
        self.mesh = mesh if mesh is not None else make_mesh(
            max(1, min(cfg.num_devices, len(jax.devices()))))
        self.tx = make_optimizer(cfg)
        opt_state = self.tx.init(params)
        self.state = TrainState(params, batch_stats, opt_state,
                                jnp.zeros((), jnp.int32))
        self.state = jax.device_put(self.state, replicated(self.mesh))
        self.lr_for_epoch = make_lr_schedule(cfg)
        self.accum = max(1, int(getattr(cfg, "grad_accum", 1)))
        self._train_step = self._build_train_step()
        self._val_step = self._build_val_step()
        if self.accum > 1:
            self._grad_step = self._build_grad_step()
            self._apply_step = self._build_apply_step()
            self._grad_zeros = jax.jit(lambda p: jax.tree.map(
                lambda a: jnp.zeros(a.shape, jnp.float32), p))
        self.loss_order = [k for k in
                           ["hm", "wh", "reg", "ltrb", "hps", "hm_hp",
                            "hp_offset", "dep", "dim", "rot",
                            "amodel_offset", "ltrb_amodal", "tracking",
                            "nuscenes_att", "velocity"]
                           if k in cfg.heads_dict]

    # ------------------------------------------------------------------
    def _forward_loss(self, params, batch_stats, batch, train: bool):
        cfg = self.cfg
        rendered = render_batch(batch, cfg)
        pre_img = rendered.get("pre_img") if cfg.pre_img else None
        pre_hm = rendered.get("pre_hm") if cfg.pre_hm else None
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            def fwd(variables, image, pre_img, pre_hm):
                return self.model.apply(
                    variables, image, pre_img, pre_hm,
                    train=True, mutable=["batch_stats"])

            if cfg.grad_checkpoint:
                # rematerialize activations in the backward pass
                # (TPU-first replacement for bigger-GPU memory: HBM is
                # the constraint, MXU FLOPs are cheap)
                fwd = jax.checkpoint(fwd)
            outputs, mutated = fwd(variables, rendered["image"],
                                   pre_img, pre_hm)
            new_bs = mutated["batch_stats"]
        else:
            outputs = self.model.apply(
                variables, rendered["image"], pre_img, pre_hm, train=False)
            new_bs = batch_stats
        total, losses = generic_loss(
            outputs, rendered, cfg.heads_dict, cfg.weights_dict,
            cfg.num_stacks)
        return total, (losses, new_bs)

    def _build_train_step(self):
        tx = self.tx

        def step(state: TrainState, batch, lr):
            grad_fn = jax.value_and_grad(
                lambda p: self._forward_loss(
                    p, state.batch_stats, batch, True), has_aux=True)
            (total, (losses, new_bs)), grads = grad_fn(state.params)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = tx.update(grads, opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(new_params, new_bs, new_opt,
                                   state.step + 1)
            return new_state, losses

        return jax.jit(step, donate_argnums=(0,))

    # --- gradient accumulation (cfg.grad_accum > 1) -------------------
    # Two small jitted programs instead of one big one: per-micro-batch
    # grads summed in fp32 on device (HBM footprint = one micro-batch
    # of activations + one fp32 grad tree), then a single optimizer
    # update. This is the per-chip path past the remote-compile /
    # memory envelope at 544x960 (B=16 monolithic fails, see
    # docs/train_bench.json) up to the reference's effective batch 32
    # (readme/MODEL_ZOO.md:16-20). Per-call dispatch (~0.3 ms) is noise
    # against the ~190 ms micro-step.
    def _build_grad_step(self):
        accum = self.accum

        def step(params, batch_stats, batch, gsum):
            grad_fn = jax.value_and_grad(
                lambda p: self._forward_loss(
                    p, batch_stats, batch, True), has_aux=True)
            (_, (losses, new_bs)), grads = grad_fn(params)
            gsum = jax.tree.map(
                lambda s, g: s + g.astype(jnp.float32) / accum,
                gsum, grads)
            return gsum, new_bs, losses

        return jax.jit(step, donate_argnums=(3,))

    def _build_apply_step(self):
        tx = self.tx

        def step(state: TrainState, grads, new_bs, lr):
            g = jax.tree.map(lambda a, p: a.astype(p.dtype),
                             grads, state.params)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = tx.update(g, opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_bs, new_opt,
                              state.step + 1)

        return jax.jit(step, donate_argnums=(0, 1))

    def _train_step_accum(self, batch, lr):
        """One optimizer step over `accum` sequential micro-batches.
        `batch` is the full effective batch (host arrays, leading dim
        batch_size); micro-batches are host slices so device HBM only
        ever holds one. BN stats chain through the micro-steps."""
        accum = self.accum
        n = None
        for v in batch.values():
            if hasattr(v, "shape") and v.ndim > 0:
                n = v.shape[0]
                break
        if n is None or n % accum != 0:
            raise ValueError(
                f"batch leading dim {n} not divisible by grad_accum "
                f"{accum}")
        m = n // accum
        state = self.state
        gsum = self._grad_zeros(state.params)
        bs = state.batch_stats
        agg = None
        for i in range(accum):
            mb = {k: (v[i * m:(i + 1) * m]
                      if hasattr(v, "shape") and v.ndim > 0 else v)
                  for k, v in batch.items()}
            mb = shard_batch(mb, self.mesh)
            gsum, bs, losses = self._grad_step(state.params, bs, mb,
                                               gsum)
            agg = losses if agg is None else jax.tree.map(
                lambda a, b: a + b, agg, losses)
        self.state = self._apply_step(state, gsum, bs, lr)
        return {k: v / accum for k, v in agg.items()}

    def _build_val_step(self):
        def step(state: TrainState, batch):
            _, (losses, _) = self._forward_loss(
                state.params, state.batch_stats, batch, False)
            return losses
        return jax.jit(step)

    def _build_debug_step(self):
        """Recompute the rendered batch + last-stack outputs for host
        visualization (reference: trainer.py:152-153 keeps `output`
        around when opt.debug > 0)."""
        cfg = self.cfg

        def step(state: TrainState, batch):
            rendered = render_batch(batch, cfg)
            pre_img = rendered.get("pre_img") if cfg.pre_img else None
            pre_hm = rendered.get("pre_hm") if cfg.pre_hm else None
            outputs = self.model.apply(
                {"params": state.params,
                 "batch_stats": state.batch_stats},
                rendered["image"], pre_img, pre_hm, train=False)
            return rendered, outputs[-1]

        return jax.jit(step)

    def _debug_iter(self, batch, iter_id) -> None:
        """Render pred-vs-GT debug images for one batch (reference:
        trainer.py:191-311 via run_epoch:172-173)."""
        from centertrack_tpu.engine.train_debug import debug_batch
        if self._debug_step is None:
            self._debug_step = self._build_debug_step()
        rendered, output = self._debug_step(self.state, batch)
        rendered = {k: np.asarray(v) for k, v in rendered.items()
                    if v is not None and hasattr(v, "shape")}
        meta = self.dataset_meta
        if meta is None:
            from centertrack_tpu.data.registry import get_dataset_meta
            meta = get_dataset_meta(self.cfg.dataset, self.cfg)
        debug_batch(self.cfg, meta, rendered, output, iter_id,
                    self.debug_dir)

    # ------------------------------------------------------------------
    def run_epoch(self, phase: str, epoch: int, loader,
                  num_iters: int = -1, log_every: int = 20):
        cfg = self.cfg
        lr = self.lr_for_epoch(epoch)
        agg = {}
        n = 0
        t0 = time.time()
        data_t, step_t = 0.0, 0.0
        t_prev = time.time()
        for it, batch in enumerate(loader):
            if num_iters > 0 and it >= num_iters:
                break
            accum = self.accum if phase == "train" else 1
            if accum == 1:
                batch = shard_batch(batch, self.mesh)
            data_t += time.time() - t_prev
            ts = time.time()
            if phase == "train":
                if accum > 1:
                    losses = self._train_step_accum(batch, lr)
                else:
                    self.state, losses = self._train_step(
                        self.state, batch, lr)
            else:
                losses = self._val_step(self.state, batch)
            losses = {k: float(v) for k, v in losses.items()}
            step_t += time.time() - ts
            for k, v in losses.items():
                agg[k] = agg.get(k, 0.0) + v
            n += 1
            if cfg.debug > 0 and (not log_every or it % log_every == 0):
                self._debug_iter(batch, f"{phase}_e{epoch}_it{it}")
            if log_every and it % log_every == 0:
                msg = f"{phase} e{epoch} it{it}"
                for k in ["tot"] + self.loss_order:
                    if k in losses:
                        msg += f" | {k} {agg[k] / n:.4f}"
                msg += (f" | data {data_t / n:.3f}s step {step_t / n:.3f}s")
                print(msg)
            t_prev = time.time()
        ret = {k: v / max(n, 1) for k, v in agg.items()}
        ret["time"] = (time.time() - t0) / 60.0
        return ret

    def train(self, epoch: int, loader, num_iters: int = -1,
              log_every: int = 20):
        return self.run_epoch("train", epoch, loader, num_iters,
                              log_every)

    def val(self, epoch: int, loader, num_iters: int = -1,
            log_every: int = 20):
        return self.run_epoch("val", epoch, loader, num_iters, log_every)
