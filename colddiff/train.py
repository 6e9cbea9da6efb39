"""Trainer: data-parallel training loop with EMA, checkpoints, periodic samples.

Interface parity with the reference ``Trainer``
(deblurring_diffusion_pytorch.py:1057-1235): Adam(lr=2e-5), gradient
accumulation x2, EMA shadow updated every 10 steps after a 2000-step warmup
(reset-to-params before that), a sample-grid + checkpoint dump every
``save_and_sample_every`` steps, and ``load_path`` resume.

TPU-native differences:
  - the whole optimizer step (grad accumulation via ``lax.scan``, Adam, EMA)
    is one jitted, donated function; batches are sharded over a 1-D device
    mesh ('data') and XLA all-reduces gradients over ICI
    (replaces torch.nn.DataParallel, SURVEY.md section 2.7);
  - checkpoints are Orbax pytrees {step, params, ema, opt_state} -- the
    reference drops optimizer state on resume (a known wart, not replicated);
  - optional bfloat16 compute with fp32 params/optimizer.
"""

from __future__ import annotations

import time

from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .diffusion import ColdDiffusion
from .parallel import (make_mesh, put_like, replicated_sharding, shard_batch,
                       shard_state)
from .sampling import prepare_start, sample
from .utils import create_folder, cycle, ema_update, save_image_grid

__all__ = ["TrainState", "Trainer"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    rng: jax.Array


class Trainer:
    def __init__(
        self,
        diffusion: ColdDiffusion,
        model,
        dataset,
        *,
        second_dataset=None,  # animorphosis endpoint images (demixing Trainer)
        train_batch_size: int = 32,
        train_lr: float = 2e-5,
        train_num_steps: int = 700000,
        gradient_accumulate_every: int = 2,
        ema_decay: float = 0.995,
        step_start_ema: int = 2000,
        update_ema_every: int = 10,
        save_and_sample_every: int = 1000,
        save_with_milestone_every: int = 0,  # 0 = only the rolling 'model'
        results_folder: str = "./results",
        load_path: Optional[str] = None,
        load_torch_path: Optional[str] = None,
        bf16: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 20),
        debug_nans: bool = False,
        remat: bool = False,
        auto_resume: bool = False,
        restart_every_steps: int = 0,
        restart_rss_gb: float = 0.0,
        to_lab: bool = False,
        param_sharding: str = "replicated",
        fsdp_min_size: int = 2 ** 14,
        mesh=None,
    ):
        from .data.datasets import DataLoader

        self.diffusion = diffusion
        self.model = model
        self.batch_size = train_batch_size
        self.train_num_steps = train_num_steps
        self.accum = gradient_accumulate_every
        self.ema_decay = ema_decay
        self.step_start_ema = step_start_ema
        self.update_ema_every = update_ema_every
        self.save_and_sample_every = save_and_sample_every
        self.save_with_milestone_every = save_with_milestone_every
        self.results_folder = Path(results_folder)
        create_folder(self.results_folder)
        self.bf16 = bf16
        # aux observability (SURVEY.md section 5): profiler trace window,
        # optional NaN checking, structured JSONL scalar log
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        if debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.metrics_path = self.results_folder / "metrics.jsonl"
        # Leak-aware long runs: this container's axon client leaks host RSS
        # equal to the bytes of every host->device transfer (pinned:
        # scripts/probe_host_leak.py, 3.00 MB/step at the flagship 128px
        # superbatch -- it OOM-killed a 131 GB / 14.6k-step retrain in round
        # 3).  ``restart_every_steps`` makes train() checkpoint and return
        # "restart" every N steps; the CLI supervisor then respawns a fresh
        # worker process that auto-resumes, bounding RSS at N x superbatch
        # bytes.  ``restart_rss_gb`` triggers the same path when host RSS
        # crosses a threshold (checked every step; single-process only --
        # see _should_restart).  Both opt-in; a real PJRT runtime needs
        # neither.
        self.restart_every_steps = restart_every_steps
        self.restart_rss_gb = restart_rss_gb
        if restart_rss_gb:
            base = self._host_rss_gb()
            if base and restart_rss_gb <= base + 1.0:
                print(f"WARNING: --restart_rss_gb {restart_rss_gb} is at or "
                      f"below the process baseline RSS ({base:.1f} GB); "
                      "every step would trigger a respawn -- raise the "
                      "threshold well above baseline", flush=True)
        # rematerialize the UNet in backward to trade FLOPs for HBM
        self.remat = remat
        # Lab-space training: batches are rgb2lab-converted after loading and
        # sample grids lab2rgb-converted before saving (snowification Trainer
        # post_process_func, diffusion.py:613-625, :743-750)
        self.to_lab = to_lab

        # multi-host (after colddiff.parallel.init_multihost):
        # ``train_batch_size`` is GLOBAL; each process loads its stripe of
        # the dataset and contributes 1/process_count of every batch
        nproc = jax.process_count()
        if train_batch_size % max(nproc, 1) != 0:
            raise ValueError(
                f"train_batch_size={train_batch_size} must divide over "
                f"{nproc} processes"
            )
        self._local_batch = train_batch_size // nproc
        proc_kw = dict(process_index=jax.process_index(), process_count=nproc)
        self.dl = cycle(
            DataLoader(dataset, self._local_batch, num_workers=num_workers,
                       seed=seed, **proc_kw)
        )
        self.dl2 = (
            cycle(DataLoader(second_dataset, self._local_batch,
                             num_workers=num_workers, seed=seed + 1, **proc_kw))
            if second_dataset is not None
            else None
        )
        # snapshot() draws its grid images from dedicated loaders, never the
        # training stream: under multi-host only rank 0 samples, and pulling
        # training batches there would permanently offset rank 0's data
        # stream relative to the other ranks.  Built lazily (rank 0 only).
        self._snap_dl = None
        self._snap_dl2 = None
        self._snap_bs = 0
        self._snap_dataset = dataset
        self._snap_dataset2 = second_dataset
        self._snap_workers = num_workers
        self._snap_seed = seed
        self._mh_sample_fn = None

        # the step functions are jitted against this mesh's shardings at
        # construction -- pass ``mesh`` to train on a device subset (tests,
        # dryruns) rather than re-pinning self.mesh afterwards
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = optax.adam(train_lr)

        rng = jax.random.key(seed)
        init_rng, state_rng = jax.random.split(rng)
        sample_shape = (
            1, diffusion.image_size, diffusion.image_size, diffusion.channels
        )
        params = model.init(
            init_rng,
            jnp.zeros(sample_shape),
            jnp.zeros((1,), dtype=jnp.int32),
        )
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # fresh buffers: params and ema are donated together in the step
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.tx.init(params),
            rng=state_rng,
        )
        # "replicated" (reference-parity default) or "fsdp": ZeRO-3-style
        # sharding of params/EMA/Adam moments over the data axis -- per-chip
        # state memory drops ~N_devices-fold, XLA inserts the weight
        # all-gathers / gradient reduce-scatters over ICI (parallel/mesh.py)
        self.state, self._state_sharding = shard_state(
            self.state, self.mesh, param_sharding, min_size=fsdp_min_size)
        self.step = 0
        if load_path is not None and load_torch_path is not None:
            raise ValueError("pass load_path or load_torch_path, not both")
        if auto_resume and (self.results_folder / "model").exists():
            # elastic recovery: resume from the latest rolling checkpoint in
            # place.  Takes precedence over BOTH load_torch_path and
            # load_path: a migrated (--load_torch_path) or warm-started
            # (--load_path) run that is preempted or respawned by the
            # restart supervisor must continue from its own progress, not
            # re-load the original starting checkpoint each time (which
            # would loop the supervisor forever at the first boundary).
            load_path = str(self.results_folder / "model")
            load_torch_path = None
        if load_path is not None:
            self.load(load_path)
        elif load_torch_path is not None:
            # migration path: resume directly from a reference PyTorch
            # Trainer checkpoint ({step, model, ema} -- deblurring_diffusion_
            # pytorch.py:1140-1149); Adam moments restart at zero (the
            # reference drops them on resume too)
            from .models.import_torch import (import_for_model,
                                              load_torch_blob,
                                              reference_checkpoint_step)

            blob = load_torch_blob(load_torch_path)
            params = import_for_model(model, blob, use_ema=False)
            ema = import_for_model(model, blob, use_ema=True)
            self.step = reference_checkpoint_step(blob)
            state = self.state.replace(
                step=jnp.asarray(self.step, jnp.int32),
                params=params,
                ema_params=ema,
                opt_state=self.tx.init(params),
            )
            self.state = put_like(state, self._state_sharding)

        # out_shardings pin the returned state to the same placement as the
        # input state (otherwise the partitioner may replicate fsdp-sharded
        # params on output and silently defeat the sharding)
        self._train_step = jax.jit(
            self._train_step_impl, donate_argnums=(0,),
            out_shardings=(self._state_sharding,
                           replicated_sharding(self.mesh)),
        )
        self._sample_fn = jax.jit(self._sample_impl, static_argnums=(3,))

    # ------------------------------------------------------------------ #

    def _denoise_fn(self, params, dropout_rng, train):
        if self.bf16:
            # mixed precision: fp32 master weights (params/opt state/EMA stay
            # fp32), bf16 compute -- cast params AND inputs at apply time
            # (see utils.bf16_params on why input-only casting is a no-op)
            from .utils import bf16_params

            params = bf16_params(params)

        def fn(x, t):
            dtype = jnp.bfloat16 if self.bf16 else x.dtype
            out = self.model.apply(
                params,
                x.astype(dtype),
                t,
                train=train,
                rngs={"dropout": dropout_rng} if train else None,
            )
            return out.astype(jnp.float32)

        if self.remat and train:
            fn = jax.checkpoint(fn)
        return fn

    def _train_step_impl(self, state: TrainState, diffusion, batch: jnp.ndarray,
                         batch2: Optional[jnp.ndarray] = None):
        """One optimizer step over [accum, B, ...] microbatches.

        ``diffusion`` is a traced pytree argument (not a closure constant) so
        stochastic operator state (random snow fields) can change every step
        without recompiling.
        """
        new_rng, *rngs = jax.random.split(state.rng, self.accum + 1)
        rngs = jnp.stack(rngs)

        def micro_loss(params, x, x2, r):
            loss_rng, drop_rng, end_rng = jax.random.split(r, 3)
            x_end = x2
            if x_end is None:
                x_end = diffusion.op.sample_x_end(end_rng, x)
            fn = self._denoise_fn(params, drop_rng, train=True)
            return diffusion.loss(fn, x, loss_rng, x_end=x_end)

        def scan_body(acc, xs):
            grads_sum, loss_sum = acc
            x, r, x2 = xs["x"], xs["r"], xs.get("x2")
            loss, g = jax.value_and_grad(micro_loss)(state.params, x, x2, r)
            return (
                jax.tree_util.tree_map(jnp.add, grads_sum, g),
                loss_sum + loss,
            ), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        xs = {"x": batch, "r": rngs}
        if batch2 is not None:
            xs["x2"] = batch2
        (grads, loss_sum), _ = jax.lax.scan(scan_body, (zeros, 0.0), xs)
        grads = jax.tree_util.tree_map(lambda g: g / self.accum, grads)
        loss = loss_sum / self.accum

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA: every `update_ema_every` steps; reset-to-params during warmup
        # (deblurring_diffusion_pytorch.py:1134-1138, :66-81).
        step = state.step + 1
        do_update = (step % self.update_ema_every) == 0
        warm = step < self.step_start_ema
        lerped = ema_update(state.ema_params, params, self.ema_decay)

        def pick(e, p, l):
            return jnp.where(do_update, jnp.where(warm, p, l), e)

        ema_params = jax.tree_util.tree_map(pick, state.ema_params, params, lerped)

        return (
            TrainState(step=step, params=params, ema_params=ema_params,
                       opt_state=opt_state, rng=new_rng),
            loss,
        )

    def _sample_impl(self, ema_params, d, og_img, t: Optional[int], rng,
                     x_end=None):
        end_rng, samp_rng = jax.random.split(rng)
        if x_end is None:
            # Family-B demixing endpoints come from the second dataset and are
            # passed in by snapshot(); ops that own their endpoint synthesize
            x_end = d.op.sample_x_end(end_rng, og_img)
        start = prepare_start(d, og_img, t, x_end=x_end)
        fn = self._denoise_fn(ema_params, None, train=False)
        res = sample(d, fn, start, t, x_end=x_end, rng=samp_rng)
        return res

    # ------------------------------------------------------------------ #

    def _to_model_space(self, xs: np.ndarray) -> jnp.ndarray:
        x = jnp.asarray(xs)
        if self.to_lab:
            from .ops.image import rgb2lab

            x = rgb2lab(x)
        return x

    def _next_superbatch(self):
        xs = np.stack([next(self.dl) for _ in range(self.accum)])
        # [accum, B, H, W, C]: shard the batch dim (1) across the mesh
        batch = shard_batch(self._to_model_space(xs), self.mesh, batch_dim=1)
        batch2 = None
        if self.dl2 is not None:
            xs2 = np.stack([next(self.dl2) for _ in range(self.accum)])
            batch2 = shard_batch(self._to_model_space(xs2), self.mesh, batch_dim=1)
        return batch, batch2

    def _snapshot_batch(self, n: int):
        """Grid images for :meth:`snapshot` from process-unsharded loaders
        with their own seed (the reference samples the next training batch,
        deblurring_diffusion_pytorch.py:1206-1210; a separate stream keeps
        every rank's training loader position identical under multi-host)."""
        from .data.datasets import DataLoader

        # never exceed the datasets (drop_last would yield zero batches and
        # hang the first snapshot on a small smoke set); one COMMON size for
        # both loaders -- demixing degrades og against x_end elementwise, so
        # mismatched og/x_end batch lengths would crash the sampler
        bs = min(max(n, self._local_batch), len(self._snap_dataset))
        if self._snap_dataset2 is not None:
            bs = min(bs, len(self._snap_dataset2))

        if self._snap_dl is None or self._snap_bs < bs:
            # (re)build: also when a later snapshot asks for more images than
            # the cached loader's batch size can provide
            self._snap_bs = bs
            self._snap_dl = cycle(DataLoader(
                self._snap_dataset, bs,
                num_workers=self._snap_workers, seed=self._snap_seed + 7919))
            if self._snap_dataset2 is not None:
                self._snap_dl2 = cycle(DataLoader(
                    self._snap_dataset2, bs,
                    num_workers=self._snap_workers,
                    seed=self._snap_seed + 7920))
        og = next(self._snap_dl)[:n]
        x_end = None
        if self._snap_dl2 is not None:
            # demixing: endpoint images from dataset 2, like the reference's
            # periodic sample (demixing_diffusion_pytorch.py:714-730)
            x_end = next(self._snap_dl2)[:n]
        return og, x_end

    @staticmethod
    def _host_rss_gb() -> float:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 1024 / 1024
        except OSError:
            pass
        return 0.0

    def _should_restart(self) -> bool:
        if (self.restart_every_steps
                and self.step % self.restart_every_steps == 0):
            return True
        # RSS is a per-process observable: under multi-host, hosts would make
        # divergent restart decisions and deadlock the next collective, so
        # the RSS trigger is single-process only (the step trigger is
        # host-synchronized and remains available everywhere)
        if (self.restart_rss_gb and jax.process_count() == 1
                and self._host_rss_gb() > self.restart_rss_gb):
            return True
        return False

    def train(self, log_every: int = 100) -> str:
        """Run to ``train_num_steps``.  Returns "done", or "restart" when a
        restart_every_steps / restart_rss_gb boundary was hit mid-run (the
        checkpoint is already saved; respawn with auto_resume to continue --
        the CLI supervisor in cli/main.py does this automatically)."""
        import json

        t0 = time.time()
        while self.step < self.train_num_steps:
            if self.profile_dir and self.step == self.profile_steps[0]:
                jax.profiler.start_trace(self.profile_dir)
            batch, batch2 = self._next_superbatch()
            self._maybe_reset_op()
            self.state, loss = self._train_step(
                self.state, self.diffusion, batch, batch2
            )
            self.step += 1
            if self.profile_dir and self.step == self.profile_steps[1]:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
            if self.step % log_every == 0:
                loss_v = float(loss)
                dt = time.time() - t0
                ips = log_every * self.accum * self.batch_size / dt
                if jax.process_index() == 0:
                    print(f"step {self.step}: loss {loss_v:.5f} ({ips:.1f} img/s)", flush=True)
                    with open(self.metrics_path, "a") as f:
                        f.write(json.dumps({"step": self.step, "loss": loss_v,
                                            "images_per_sec": round(ips, 2)}) + "\n")
                t0 = time.time()
            if self.step % self.save_and_sample_every == 0:
                # checkpoint durability first: snapshot() compiles and runs a
                # full T-step sampler, the likeliest step to OOM/crash on a
                # long run -- the milestone ckpt must already be on disk
                self.save()
                self.snapshot(self.step // self.save_and_sample_every)
                # retained step snapshots (snowification saves timestamped
                # checkpoints every 50k, diffusion.py:662-671)
                if (self.save_with_milestone_every
                        and self.step % self.save_with_milestone_every == 0):
                    self.save(self.results_folder / f"model_{self.step}")
            if self.step < self.train_num_steps and self._should_restart():
                self.save()
                if jax.process_index() == 0:
                    print(f"step {self.step}: restart boundary -- "
                          "checkpoint saved, handing back to supervisor",
                          flush=True)
                return "restart"
        self.save()
        return "done"

    def _maybe_reset_op(self):
        """Redraw stochastic operator state per step (random snow), mirroring
        forward_process.reset_parameters() in p_losses (snowification
        diffusion.py:408).  Host-side regeneration; the new op pytree flows
        into the jitted step as an argument (same treedef -> no recompile)."""
        op = self.diffusion.op
        if getattr(op, "random_snow", False):
            rng = jax.random.fold_in(jax.random.key(997), self.step)
            self.diffusion = self.diffusion.replace(
                op=op.reset(rng, self.batch_size)
            )

    def snapshot(self, milestone: int, batch_size: Optional[int] = None):
        """EMA sample grids, reference Trainer.train() (:1206-1228)."""
        sample_fn = self._sample_fn
        ema_params = self.state.ema_params
        diffusion = self.diffusion
        if jax.process_count() > 1:
            # multi-host: the jitted global-mesh sampler can't consume this
            # process's local batch, and non-zero ranks would race on the
            # grid files.  All ranks first gather EMA + operator state to
            # full replication (a collective -- every rank must participate;
            # a no-op when already replicated), then rank 0 alone pulls them
            # to host and runs a process-local jit with no collectives.
            gather = jax.jit(lambda t: t,
                             out_shardings=replicated_sharding(self.mesh))
            ema_params = jax.device_get(gather(ema_params))
            diffusion = jax.device_get(self.diffusion)
            if jax.process_index() != 0:
                return
            if self._mh_sample_fn is None:
                # cached: a fresh jax.jit wrapper per snapshot would
                # recompile the T-step sampler every milestone
                self._mh_sample_fn = jax.jit(
                    self._sample_impl, static_argnums=(3,))
            sample_fn = self._mh_sample_fn
        n = batch_size or min(self.batch_size, 36)
        og_rgb, x_end_rgb = self._snapshot_batch(n)
        og = self._to_model_space(og_rgb)
        x_end = (self._to_model_space(x_end_rgb)
                 if x_end_rgb is not None else None)
        res = sample_fn(
            ema_params, diffusion, og, None,
            jax.random.key(self.step), x_end,
        )

        def to_rgb(imgs):
            if self.to_lab:
                from .ops.image import lab2rgb

                return lab2rgb(jnp.asarray(imgs))
            return imgs

        for name, imgs in [
            ("og", og_rgb), ("xt", to_rgb(res.xt)),
            ("direct_recons", to_rgb(res.direct_recons)),
            ("sample", to_rgb(res.img)),
        ]:
            save_image_grid(
                np.asarray(imgs), self.results_folder / f"{name}-{milestone}.png"
            )

    # ------------------------------------------------------------------ #

    def save(self, path: Optional[str] = None):
        """Checkpoint {step, train state, degradation-operator state}.

        Including the operator pytree persists stochastic degradation state --
        the reference's ``snow_base.npy``-beside-checkpoint behavior
        (snowification diffusion.py:177-193) without the side file.
        """
        import orbax.checkpoint as ocp

        path = Path(path or (self.results_folder / "model")).absolute()
        # multi-host: ckpt.save/restore are collective (internal barriers) --
        # every process must call them, and state leaves stay GLOBAL
        # jax.Arrays (Orbax serializes each process's shards; host-local
        # values are rejected).  Single-process keeps the host-value format.
        multihost = jax.process_count() > 1
        state = self.state if multihost else jax.device_get(self.state)
        op_state = jax.device_get(self.diffusion.op)
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, {"step": self.step, "state": state, "op": op_state},
                  force=True)

    def load(self, path: str):
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        multihost = jax.process_count() > 1
        template = {
            "step": 0,
            "state": self.state if multihost else jax.device_get(self.state),
            "op": jax.device_get(self.diffusion.op),
        }
        restored = ckpt.restore(Path(path).absolute(), item=template)
        self.step = int(restored["step"])
        if multihost:
            # restored to the template's global shardings by Orbax
            self.state = restored["state"]
        else:
            self.state = jax.device_put(restored["state"], self._state_sharding)
        # Orbax restores numpy leaves; operator state must be device arrays
        # (a numpy cum[t] gather with a traced t inside the sampling scan
        # raises TracerArrayConversionError)
        op = jax.tree_util.tree_map(jnp.asarray, restored["op"])
        self.diffusion = self.diffusion.replace(op=op)
