"""Training harness: jitted train/val steps, AdamW + cosine LR, checkpoints.

Reference behaviors reproduced (`scripts/train.py:33-503`):
- AdamW(lr, weight_decay) + cosine annealing of the LR over epochs
  (`train.py:59-60`);
- unweighted MSE training loss; latitude-weighted MSE validation per lead
  time and per channel (`train.py:95-107,393-458`);
- gradient clipping of the global norm to the *current learning rate*
  (`train.py:299-305`);
- gradient accumulation by splitting the batch (`train.py:179-183`) —
  expressed here as a `lax.scan` over micro-batches inside one jit;
- input-noise, seeding, best/last checkpointing (`train.py:43-45,464-484`).

TPU-first: the train step is one donated-buffer jit; the epoch LR is a traced
scalar input (no re-jit per epoch); batches are `device_put` once per step.
"""

from __future__ import annotations

import dataclasses
import math
import os
import threading
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from dlwpbench_tpu.training.losses import mse_loss


def cosine_lr(epoch: int | jax.Array, base_lr: float, total_epochs: int) -> jax.Array:
    """torch CosineAnnealingLR(T_max=total_epochs), eta_min=0."""
    return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / total_epochs))


def clip_grads_to(grads, max_norm):
    """Clip global grad norm to `max_norm` (torch clip_grad_norm_ semantics)."""
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), gnorm


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: int = 0
    iteration: int = 0
    best_val_error: float = math.inf
    ema_params: Any = None  # EMA of params for diffusion models (decay .995)


class Trainer:
    """Drives training of any zoo model on a `WindowedWeatherDataset`."""

    def __init__(
        self,
        model,
        learning_rate: float = 1e-3,
        weight_decay: float = 1e-5,
        epochs: int = 30,
        clip_gradients: bool = True,
        gradient_accumulation_steps: int = 1,
        lat_weights: np.ndarray | None = None,
        seed: int = 1234,
        training_type: str = "regular",
        num_refinement_steps: int = 5,
        min_noise_std: float = 4e-4,
        ema_decay: float = 0.995,
        compute_dtype: str | None = None,
        spmd_mesh: Any = None,
        batch_axis: str = "data",
        host_id: int = 0,
        n_hosts: int = 1,
    ):
        self.model = model
        # Multi-host input sharding: each host loads a disjoint, epoch-
        # deterministic slice of the epoch (dataset.batches host args);
        # defaults (0, 1) are single-host.  Pass jax.process_index()/
        # jax.process_count() on a real multi-host mesh.
        self.host_id, self.n_hosts = host_id, n_hosts
        # Data parallelism (the reference's DistributedManager/DDP role,
        # `manager.py:29-34`): batches shard over `batch_axis`, params and
        # optimizer state replicate; XLA inserts the gradient all-reduce.
        self._batch_sharding = None
        self._replicated = None
        if spmd_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._batch_sharding = NamedSharding(
                spmd_mesh, PartitionSpec(batch_axis)
            )
            self._replicated = NamedSharding(spmd_mesh, PartitionSpec())
        self.base_lr = learning_rate
        self.epochs = epochs
        self.clip_gradients = clip_gradients
        self.accum = gradient_accumulation_steps
        # Mixed precision ("bfloat16"): forward/backward compute in bf16
        # (params + batch cast inside the loss; flax layers follow input
        # dtype), while master params, gradients and AdamW state stay fp32.
        # The standard TPU recipe — MXU peak is bf16 and HBM traffic halves.
        self.compute_dtype = (
            None if compute_dtype in (None, "float32") else jnp.dtype(compute_dtype)
        )
        self.lat_weights = None if lat_weights is None else jnp.asarray(lat_weights)
        self.seed = seed
        self.training_type = training_type
        self.ema_decay = ema_decay
        if training_type == "diffusion":
            from dlwpbench_tpu.ops import ddpm as ddpm_ops

            self._sched = ddpm_ops.make_refiner_schedule(
                num_refinement_steps, min_noise_std
            )
        # inject_hyperparams lets the epoch-cosine LR be a traced input.
        self.tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._val_step = jax.jit(self._val_step_impl)
        self._rng = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------------
    def init(self, batch) -> TrainState:
        const, pres, prog, _ = batch
        params = jax.jit(self.model.init)(
            jax.random.PRNGKey(self.seed),
            _j(const), _j(pres), _j(prog),
        )
        # EMA must own its buffers: params get donated into the train step.
        ema = (
            jax.tree.map(jnp.copy, params)
            if self.training_type == "diffusion"
            else None
        )
        if self._replicated is not None:
            params = jax.device_put(params, self._replicated)
            if ema is not None:
                ema = jax.device_put(ema, self._replicated)
        return TrainState(
            params=params, opt_state=self.tx.init(params), ema_params=ema
        )

    def n_params(self, state: TrainState) -> int:
        return sum(int(x.size) for x in jax.tree.leaves(state.params))

    # ------------------------------------------------------------------
    def _cast_compute(self, *trees):
        """Cast float arrays to the compute dtype (no-op when fp32)."""
        if self.compute_dtype is None:
            return trees

        def cast(x):
            if x is not None and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return tuple(
            None if t is None else jax.tree.map(cast, t) for t in trees
        )

    def _loss_fn(self, params, const, pres, prog, target, rng):
        if self.training_type == "diffusion":
            return self._diffusion_loss(params, const, pres, prog, target, rng)
        params, const, pres, prog = self._cast_compute(params, const, pres, prog)
        out = self.model.apply(params, const, pres, prog)
        # loss in fp32 regardless of compute dtype
        return mse_loss(out.astype(jnp.float32), target), out

    def _diffusion_loss(self, params, const, pres, prog, target, rng):
        """v-prediction diffusion loss (reference `train.py:226-258`)."""
        from dlwpbench_tpu.ops import ddpm as ddpm_ops

        ctx = self.model.context_size
        assert target.shape[1] == 1, (
            "diffusion training requires sequence_length == context_size + 1 "
            "(reference trains on a single residual target)"
        )
        kk, kn = jax.random.split(rng)
        k = jax.random.randint(kk, (), 0, self._sched.num_timesteps - 1)
        target_res = target - prog[:, ctx - 1 : ctx]
        noise = jax.random.normal(kn, target_res.shape, target_res.dtype)
        y_noised = ddpm_ops.add_noise(self._sched, target_res, noise, k)
        params, const, pres, prog, y_noised = self._cast_compute(
            params, const, pres, prog, y_noised
        )
        out = self.model.apply(
            params,
            const,
            None if pres is None else pres[:, :ctx],
            prog[:, :ctx],
            y_noised,
            jnp.full((prog.shape[0],), k),
            method="single_forward",
        )
        v_target = ddpm_ops.v_prediction_target(self._sched, target_res, noise, k)
        return mse_loss(out[:, None].astype(jnp.float32), v_target), out

    def _train_step_impl(self, params, opt_state, const, pres, prog, target, lr, rng):
        """One optimizer step over `accum` micro-batches (scan if accum>1)."""
        accum = self.accum

        def micro(c, p, g, t):
            (loss, _), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
                params, c, p, g, t, rng
            )
            return loss, grads

        if accum == 1:
            loss, grads = micro(const, pres, prog, target)
        else:
            # Micro-batches weighted by their share of the batch, so the
            # accumulated loss/grads equal the single big-batch step exactly
            # (incl. a remainder chunk when B % accum != 0; the reference's
            # tensor .split keeps the remainder too, `train.py:179-183`).
            B = prog.shape[0]
            n_full = B // accum

            def split(x):
                if x is None:
                    return None
                return x[: n_full * accum].reshape(accum, n_full, *x.shape[1:])

            def body(carry, mb):
                loss_acc, grads_acc = carry
                loss, grads = micro(mb["c"], mb["p"], mb["g"], mb["t"])
                w = n_full / B
                return (
                    loss_acc + w * loss,
                    jax.tree.map(lambda a, g: a + w * g, grads_acc, grads),
                ), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            mbs = {"c": split(const), "p": split(pres), "g": split(prog), "t": split(target)}
            (loss, grads), _ = jax.lax.scan(body, (0.0, zeros), mbs)
            rem = B - n_full * accum
            if rem:
                tail = lambda x: None if x is None else x[n_full * accum :]
                loss_r, grads_r = micro(
                    tail(const), tail(pres), tail(prog), tail(target)
                )
                w = rem / B
                loss = loss + w * loss_r
                grads = jax.tree.map(lambda a, g: a + w * g, grads, grads_r)

        if self.clip_gradients:
            grads, _ = clip_grads_to(grads, lr)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _val_step_impl(self, params, const, pres, prog, target):
        out = self.model.apply(params, const, pres, prog)
        err = (out - target) ** 2
        if self.lat_weights is not None:
            # broadcast weights over trailing spatial dims
            w = self.lat_weights
            err = err * w
        # per lead time and per channel (train.py:393-458)
        reduce_axes = (0,) + tuple(range(3, err.ndim))
        per_lead_chan = err.mean(axis=reduce_axes)  # [T', C]
        return err.mean(), per_lead_chan

    # ------------------------------------------------------------------
    def train_epoch(self, state: TrainState, dataset, batch_size: int, shuffle=True):
        lr = float(cosine_lr(state.epoch, self.base_lr, self.epochs))
        losses = []
        for batch in _prefetch_to_device(
            dataset.batches(
                batch_size, shuffle=shuffle,
                host_id=self.host_id, n_hosts=self.n_hosts,
                epoch=state.epoch if self.n_hosts > 1 else None,
            ),
            sharding=self._batch_sharding,
        ):
            const, pres, prog, target = batch
            self._rng, sub = jax.random.split(self._rng)
            state.params, state.opt_state, loss = self._train_step(
                state.params, state.opt_state, const, pres, prog, target,
                jnp.float32(lr), sub,
            )
            if state.ema_params is not None:
                d = self.ema_decay
                state.ema_params = jax.tree.map(
                    lambda e, p: e * d + p * (1.0 - d),
                    state.ema_params,
                    state.params,
                )
            state.iteration += 1
            losses.append(loss)
        state.epoch += 1
        return float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

    def validate(self, state: TrainState, dataset, batch_size: int):
        tot, n = 0.0, 0
        per_lead = []
        for batch in dataset.batches(batch_size):
            const, pres, prog, target = (
                _j(x, self._batch_sharding) for x in batch
            )
            loss, plc = self._val_step(state.params, const, pres, prog, target)
            bs = prog.shape[0]
            tot += float(loss) * bs
            n += bs
            per_lead.append(np.asarray(plc) * bs)
        if n == 0:  # empty validation split
            return float("nan"), np.zeros((0, 0))
        per_lead_chan = np.sum(per_lead, axis=0) / n
        return tot / n, per_lead_chan

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_ds,
        val_ds,
        batch_size: int,
        val_batch_size: int | None = None,
        run_dir: str | None = None,
        model_name: str = "model",
        verbose: bool = True,
        on_epoch_end: Optional[Callable] = None,
        checkpoint_every: int = 1,
    ) -> TrainState:
        val_batch_size = val_batch_size or batch_size
        # In a true multi-process job only process 0 touches the run dir:
        # every process holds identical (replicated) state, and concurrent
        # writers would race on the same checkpoint tmp file (the reference
        # gates on dist.get_rank()==0 the same way, `train.py:464-474`).
        is_proc0 = jax.process_index() == 0
        logger = None
        if run_dir and is_proc0:
            from dlwpbench_tpu.utils.logging import RunLogger

            logger = RunLogger(run_dir)
        ckpt_writer = AsyncCheckpointWriter()
        best_dirty = False
        while state.epoch < self.epochs:
            t0 = time.time()
            train_loss = self.train_epoch(state, train_ds, batch_size)
            val_loss, per_lead = self.validate(state, val_ds, val_batch_size)
            epoch_s = time.time() - t0
            if verbose:
                print(
                    f"epoch {state.epoch:3d}  train {train_loss:.5f}  "
                    f"val {val_loss:.5f}  ({epoch_s:.1f}s)",
                    flush=True,
                )
            if logger:
                # scalar stream + per-lead-time validation losses (the
                # reference's W&B tables, `train.py:393-458`)
                rec = {
                    "train_loss": train_loss,
                    "val_loss": val_loss,
                    "epoch_s": epoch_s,
                    "lr": float(
                        cosine_lr(state.epoch - 1, self.base_lr, self.epochs)
                    ),
                }
                for t in range(min(per_lead.shape[0], 64) if per_lead.ndim else 0):
                    rec[f"val_mse/lead_{t+1}"] = float(per_lead[t].mean())
                logger.log(rec, step=state.epoch)
            if run_dir:
                # Checkpoints every checkpoint_every epochs (+ the final
                # one): on a relay-attached device, serializing a large
                # state every epoch can dominate wall time (observed 50 s
                # vs 2.6 s compute on an 80M-param run).  "best" coarsens
                # with the interval too — the state written is the
                # best-known at the interval boundary.
                if val_loss < state.best_val_error:
                    state.best_val_error = val_loss
                    best_dirty = True
                at_interval = (
                    state.epoch % max(1, checkpoint_every) == 0
                    or state.epoch >= self.epochs
                )
                if is_proc0 and at_interval:
                    if best_dirty:
                        ckpt_writer.submit(
                            run_dir, model_name, state, kind="best"
                        )
                        best_dirty = False
                    ckpt_writer.submit(run_dir, model_name, state, kind="last")
            if on_epoch_end:
                on_epoch_end(state, train_loss, val_loss, per_lead)
        ckpt_writer.join()  # all checkpoints durable before fit() returns
        if logger:
            logger.close()
        return state


def _j(x, sharding=None):
    if x is None:
        return None
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = sharding.spec[0] if sharding.spec else None
        n = sharding.mesh.shape[axis] if axis else 1
        if jax.process_count() > 1:
            # True multi-process (reference DDP, `manager.py:29-34`): this
            # process holds only ITS shard of the global batch
            # (`dataset.batches(host_id=...)`), so the global Array must be
            # assembled from per-process data — device_put would wrongly
            # treat the local shard as the whole global batch.
            x = np.asarray(x)
            local_n = max(
                1,
                len([d for d in sharding.mesh.devices.flat
                     if d.process_index == jax.process_index()])
                // (sharding.mesh.size // n),
            ) if axis else 1
            if x.ndim and axis and x.shape[0] % local_n == 0:
                return jax.make_array_from_process_local_data(sharding, x)
            # ragged / unsharded batch: every process contributes its rows
            # to a replicated global batch (remainders are kept, matching
            # the reference's `train.py:179-183`)
            from jax.experimental import multihost_utils

            x_glob = multihost_utils.process_allgather(x, tiled=True)
            return jax.make_array_from_process_local_data(
                NamedSharding(sharding.mesh, PartitionSpec()), x_glob
            )
        x = jnp.asarray(x)
        if x.ndim and x.shape[0] % n == 0:
            return jax.device_put(x, sharding)
        # remainder batch (reference keeps remainders, train.py:179-183):
        # place replicated; GSPMD still runs the step correctly
        return jax.device_put(
            x, NamedSharding(sharding.mesh, PartitionSpec())
        )
    return jnp.asarray(x)


def _prefetch_to_device(batch_iter, depth: int = 2, sharding=None):
    """Async host->device input pipeline: keep `depth` batches in flight
    (jax device transfers are async, so staging the NEXT batch while the
    current train step runs hides the transfer — the TPU analog of the
    reference's DataLoader worker prefetch, `train.py:148-160`).  With a
    `sharding`, batches land sharded over the data axis (DP)."""
    import collections

    queue = collections.deque()
    for batch in batch_iter:
        queue.append(tuple(_j(x, sharding) for x in batch))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


# ----------------------------------------------------------------------
# Checkpointing (reference `utils/utils.py:29-57` + restore `train.py:110-123`)
# ----------------------------------------------------------------------


class AsyncCheckpointWriter:
    """Background checkpoint writes — the reference runs `write_checkpoint`
    on a `threading.Thread` so epoch N+1 compute overlaps checkpoint IO
    (`train.py:464-474`).  One worker at a time: each submit joins the
    previous write first, so best/last ordering is preserved and at most
    one serialization is in flight.

    jax Arrays are immutable but NOT donation-proof: the train step donates
    `params`/`opt_state`, so a buffer the thread is still serializing can
    be invalidated when the NEXT epoch's step dispatches ("Array has been
    deleted" mid-write, observed on an 80M-param run whose serialization
    was slower than an epoch).  `submit` therefore snapshots the device
    arrays with `jnp.copy` on the calling thread — an async device-side
    copy that is ordered BEFORE any later donation, giving the writer
    stable buffers."""

    def __init__(self):
        self._thread: threading.Thread | None = None

    def submit(self, run_dir: str, name: str, state: TrainState, kind: str):
        self.join()

        def cp(x):  # copy device arrays only; keep python scalars as-is
            return jnp.copy(x) if isinstance(x, jax.Array) else x

        snap = dataclasses.replace(
            state,  # freeze the scalar fields
            params=jax.tree.map(cp, state.params),
            opt_state=jax.tree.map(cp, state.opt_state),
            ema_params=(
                None if state.ema_params is None
                else jax.tree.map(cp, state.ema_params)
            ),
        )
        self._thread = threading.Thread(
            target=save_checkpoint, args=(run_dir, name, snap, kind),
            daemon=True,
        )
        self._thread.start()

    def join(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def save_checkpoint(run_dir: str, name: str, state: TrainState, kind: str = "last"):
    path = os.path.join(run_dir, "checkpoints", f"{name}_{kind}.ckpt")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = serialization.to_bytes(
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "epoch": state.epoch,
            "iteration": state.iteration,
            "best_val_error": state.best_val_error,
            "ema_params": state.ema_params if state.ema_params is not None else {},
        }
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(run_dir: str, name: str, state: TrainState, kind: str = "best"):
    """Restore into a template TrainState (shapes from `Trainer.init`)."""
    path = os.path.join(run_dir, "checkpoints", f"{name}_{kind}.ckpt")
    with open(path, "rb") as f:
        blob = f.read()
    tpl = {
        "params": state.params,
        "opt_state": state.opt_state,
        "epoch": 0,
        "iteration": 0,
        "best_val_error": 0.0,
        "ema_params": state.ema_params if state.ema_params is not None else {},
    }
    restored = serialization.from_bytes(tpl, blob)
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        epoch=int(restored["epoch"]),
        iteration=int(restored["iteration"]),
        best_val_error=float(restored["best_val_error"]),
        ema_params=restored["ema_params"] if state.ema_params is not None else None,
    )
