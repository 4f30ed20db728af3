"""Host-side training driver (the reference's ``train.py`` loop, SURVEY.md 3.1).

Cold start: config -> (optional) distributed init -> mesh -> data source ->
state init or orbax restore -> per-phase jitted step loop. Control crosses
host->device once per step; batches cross as uint8 via the background
prefetcher. Progressive growth = switching to the next phase's compiled step
over the unchanged state pytree (SURVEY.md 3.3).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import numpy as np

from ganlab_tpu.config import Config
from ganlab_tpu.data import Prefetcher, make_source
from ganlab_tpu.parallel import (
    make_mesh,
    make_parallel_chunk,
    make_parallel_step,
    make_single_step,
    replicate,
    shard_batch,
    shard_stack,
)
from ganlab_tpu.train.checkpoint import CheckpointManager
from ganlab_tpu.train.schedule import alpha_at, build_phases, phase_at
from ganlab_tpu.train.state import create_train_state
from ganlab_tpu.train.steps import (
    build_sample_fn,
    build_train_step,
    make_chunked_stepper,
    make_lazy_stepper,
)
from ganlab_tpu.utils import MetricLogger, gen_latents, save_image_grid


class Trainer:
    """Owns state, schedule, compiled steps, IO. One instance per run."""

    def __init__(self, cfg: Config, workdir: str = ".",
                 use_mesh: bool | None = None, source=None):
        self.cfg = cfg
        self.workdir = workdir
        if cfg.run.use_pallas:
            from ganlab_tpu.ops import pallas as plops

            plops.set_backend("pallas")
        self.phases = build_phases(cfg.schedule, cfg.model)
        n_dev = jax.device_count()
        if use_mesh is None:
            use_mesh = n_dev > 1
        self.mesh = make_mesh() if use_mesh else None
        # n_dev: all devices in the mesh (drives the global shown-image
        # counter); local_dev: this host's devices (drives how many rows
        # THIS host feeds — on a pod slice each host supplies its local
        # shard and shard_batch assembles the global array).
        self.n_dev = n_dev if use_mesh else 1
        self.local_dev = jax.local_device_count() if use_mesh else 1

        self.ckpt = CheckpointManager(
            os.path.join(workdir, cfg.run.checkpoint_dir),
            keep=cfg.run.keep_checkpoints)
        self.logger = MetricLogger(workdir, tensorboard=cfg.run.tensorboard)
        if jax.process_index() == 0:
            # Persist the run's FULL config next to its checkpoints: the
            # post-training CLI commands (sample/eval-fid/interpolate/
            # mixgrid/project/export) reload it from the workdir, so a
            # bare `--workdir` always rebuilds the exact trained model.
            from ganlab_tpu.config import save_config

            save_config(cfg, os.path.join(workdir, "config.json"))

        state = create_train_state(cfg, jax.random.PRNGKey(cfg.run.seed))
        restored = self.ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"resumed from step {int(state.step)}", flush=True)
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        self.state = state

        # Lazy: sampling/eval from a checkpoint must not require the dataset.
        self._source = source
        self._steps: dict[tuple, Callable] = {}
        self._samplers: dict[int, Callable] = {}
        # In-training eval (run.eval_kimg): lazily-built extractor, traced-
        # alpha samplers per resolution, and per-resolution real features
        # cached for the run (the dataset side never changes).
        self._eval_extractor = None
        self._eval_samplers: dict[int, Callable] = {}
        self._eval_real: dict[int, np.ndarray] = {}
        self._warn_chunk_cadences()

    def _warn_chunk_cadences(self) -> None:
        """Scan-chunked stepping quantizes host-side cadences to the chunk
        cycle (the scanned off-run is one dispatch); a user cadence finer
        than the cycle silently coarsens. Say so once up front."""
        if not self.chunking:
            return
        cycle = self.cfg.loss.penalty_every
        run = self.cfg.run
        coarsened = [f"run.{name}={val}" for name, val in (
            ("log_every", run.log_every),
            ("sample_every", run.sample_every),
            ("checkpoint_every", run.checkpoint_every),
        ) if val and val < cycle]
        if coarsened:
            print(
                f"warning: chunked stepping (run.chunk_steps) quantizes "
                f"{', '.join(coarsened)} to the {cycle}-step lazy-"
                f"regularization cycle — effective cadence is once per "
                f"cycle; set run.chunk_steps=False for finer cadences",
                flush=True)

    @property
    def source(self):
        if self._source is None:
            # Per-host seed offset: each host of a pod slice draws a
            # different stream for its local input shard (SURVEY.md 2.3).
            self._source = make_source(
                self.cfg.data, self.cfg.model.resolution,
                seed=self.cfg.run.seed + 7919 * jax.process_index())
        return self._source

    # ------------------------------------------------------------------
    @property
    def chunking(self) -> bool:
        """Scan-chunked stepping active? Requires run.chunk_steps, lazy D
        regularization, and (when lazy PL is on) nesting cadences — else
        fall back to the per-step lazy dispatcher."""
        lc = self.cfg.loss
        return bool(self.cfg.run.chunk_steps
                    and lc.penalty_every > 1
                    and lc.penalty in ("wgan-gp", "r1")
                    and self.cfg.pl_chunkable)

    def _step_fn(self, phase) -> Callable:
        key = (phase.res_log2, phase.kind, phase.start_img, phase.end_img)
        if key not in self._steps:
            axis = self.cfg.run.data_axis if self.mesh is not None else None
            if self.mesh is not None:
                wrap = lambda s: make_parallel_step(s, self.mesh)  # noqa: E731
                wrap_c = lambda s: make_parallel_chunk(s, self.mesh)  # noqa: E731
            else:
                wrap = make_single_step
                wrap_c = make_single_step
            initial = int(jax.device_get(self.state.step))
            if self.chunking:
                stepper, _ = make_chunked_stepper(
                    self.cfg, phase, wrap, wrap_c, axis_name=axis,
                    initial_step=initial)
                self._steps[key] = stepper
            else:
                self._steps[key] = make_lazy_stepper(
                    self.cfg, phase, wrap, axis_name=axis,
                    initial_step=initial)
        return self._steps[key]

    def _sampler(self, res_log2: int) -> Callable:
        if res_log2 not in self._samplers:
            # alpha static: sampling is almost always at alpha=1.0, and a
            # static 1.0 drops the fade branch from the compiled program.
            self._samplers[res_log2] = jax.jit(
                build_sample_fn(self.cfg, res_log2), static_argnums=(5,))
        return self._samplers[res_log2]

    def _place(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return jax.device_put(batch, jax.devices()[0])

    def _place_stack(self, stack):
        if self.mesh is not None:
            return shard_stack(stack, self.mesh)
        return jax.device_put(stack, jax.devices()[0])

    # ------------------------------------------------------------------
    def train(self, max_steps: int | None = None) -> dict:
        """Run until the schedule (or ``max_steps`` optimizer steps) ends."""
        cfg = self.cfg
        run = cfg.run
        max_steps = max_steps if max_steps is not None else run.total_steps
        steps_done = 0
        # Logged steps are GLOBAL (state.step), not process-local: a
        # resumed/retried run must append monotonic step keys to
        # train.jsonl or step-keyed plots of the curve mislead
        # (ADVICE r4). One host fetch per train() call.
        start_step = int(jax.device_get(self.state.step))
        shown = float(jax.device_get(self.state.shown_imgs))
        metrics = {}

        last_phase_index = None
        while True:
            phase = phase_at(self.phases, int(shown))
            if shown >= self.phases[-1].end_img:
                break
            if (cfg.optim.reset_moments_on_phase
                    and last_phase_index is not None
                    and phase.index != last_phase_index):
                self._reset_optimizer_moments()
            last_phase_index = phase.index
            step_fn = self._step_fn(phase)
            # This host feeds its local devices' rows; the device-side
            # shown-image counter (and therefore fade-in alpha) advances by
            # the GLOBAL batch per step. With gradient accumulation each
            # step consumes grad_accum microbatches (steps.py::step_accum).
            accum = max(1, cfg.optim.grad_accum)
            feed_batch = phase.batch_size * accum * self.local_dev
            global_batch = phase.batch_size * accum * self.n_dev
            print(f"phase {phase.index}: res {phase.resolution} {phase.kind} "
                  f"[{phase.start_img}, {phase.end_img}) batch/device "
                  f"{phase.batch_size} x {self.n_dev} devices"
                  + (f" x {accum} accum" if accum > 1 else ""), flush=True)

            chunk = cfg.loss.penalty_every if self.chunking else 1
            place = self._place_stack if chunk > 1 else self._place
            import time as _time

            phase_t0 = _time.perf_counter()
            phase_shown0 = shown
            with Prefetcher(self.source, feed_batch, phase.resolution,
                            place=place, depth=cfg.data.prefetch,
                            chunk=chunk) as pf:
                while shown < phase.end_img:
                    if max_steps is not None and steps_done >= max_steps:
                        self._finish()
                        return metrics
                    # Flag-gated profiling (SURVEY.md 5): trace steps 10-20
                    # of the run into <workdir>/profile for xprof/tensorboard.
                    if run.profile and steps_done >= 10 \
                            and not getattr(self, "_trace_done", False) \
                            and not getattr(self, "_trace_active", False):
                        jax.profiler.start_trace(
                            os.path.join(self.workdir, "profile"))
                        self._trace_active = True
                    if chunk > 1:
                        # Scan-chunked: one penalty-on dispatch + one
                        # scanned off-run per cycle; bounded by the phase
                        # end and max_steps. The stepper may consume FEWER
                        # steps than offered (cycle realignment) — the
                        # consumed count is the stacked metrics' length.
                        n = int(min(
                            chunk,
                            -(-(phase.end_img - shown) // global_batch)))
                        if max_steps is not None:
                            n = min(n, max_steps - steps_done)
                        stack = pf.next()
                        self.state, mstack = step_fn(
                            self.state, stack if n == chunk else stack[:n])
                        n = int(jax.tree.leaves(mstack)[0].shape[0])
                        metrics = jax.tree.map(lambda x: x[-1], mstack)
                        # The chunk's last step is always a lazy off-step
                        # (penalty/PL fire at the cycle head), so "last"
                        # would log those as a constant 0. They are
                        # nonnegative and exactly 0 on off-steps, so the
                        # chunk max IS the cycle's fired (k-scaled) value.
                        for lazy_key in ("penalty", "pl_penalty"):
                            if lazy_key in metrics:
                                metrics[lazy_key] = mstack[lazy_key].max()
                        steps_done += n
                        shown += n * global_batch
                    else:
                        n = 1
                        self.state, metrics = step_fn(self.state, pf.next())
                        steps_done += 1
                        shown += global_batch
                    if run.profile and steps_done >= 20 and \
                            getattr(self, "_trace_active", False):
                        self._stop_trace(metrics)
                        self._trace_done = True

                    step_i = start_step + steps_done

                    def crossed(every):
                        return every and \
                            step_i // every != (step_i - n) // every
                    if crossed(run.log_every):
                        m = {k: float(jax.device_get(v))
                             for k, v in metrics.items()}
                        m.update(res=phase.resolution, kind=phase.kind,
                                 shown_imgs=shown)
                        self.logger.log(step_i, m)
                    # In-training metric cadence (run.eval_kimg): shown-
                    # image based so it survives chunked stepping and
                    # progressive batch-size changes.
                    if run.eval_kimg and jax.process_index() == 0:
                        per = run.eval_kimg * 1000.0
                        if int(shown // per) != \
                                int((shown - n * global_batch) // per):
                            self.run_eval(phase, shown, step_i)
                    if crossed(run.sample_every):
                        self.save_samples(phase.res_log2,
                                          tag=f"step{step_i:08d}")
                    if crossed(run.checkpoint_every):
                        self.save_checkpoint()
            # Per-phase throughput (incl. compile; the dominant term over a
            # full phase is steady-state stepping).
            dt = _time.perf_counter() - phase_t0
            if dt > 0 and shown > phase_shown0:
                print(f"phase {phase.index} ({phase.resolution} "
                      f"{phase.kind}): {(shown - phase_shown0) / dt:.1f} "
                      f"img/s over {shown - phase_shown0:.0f} imgs",
                      flush=True)
        self._finish()
        return metrics

    # ------------------------------------------------------------------
    def _get_eval_extractor(self):
        if self._eval_extractor is None:
            from ganlab_tpu.eval.fid import (RandomConvExtractor,
                                             get_extractor)

            kind = self.cfg.run.eval_extractor
            if kind == "randconv":
                self._eval_extractor = RandomConvExtractor()
            elif kind == "inception":
                from ganlab_tpu.eval.inception import InceptionExtractor

                self._eval_extractor = InceptionExtractor(
                    weights_path=os.environ.get("GANLAB_INCEPTION_WEIGHTS"))
            else:                       # 'auto'
                self._eval_extractor = get_extractor()
        return self._eval_extractor

    def _eval_real_features(self, resolution: int) -> np.ndarray:
        """Real-side features at this resolution, computed once per run.

        Reals always come from the FULL underlying distribution (a
        data.num_images-restricted training pool is judged on
        generalization — memorizing the pool must not score well; same
        protocol as scripts/ab_recipes.py)."""
        if resolution not in self._eval_real:
            import dataclasses

            extractor = self._get_eval_extractor()
            data = dataclasses.replace(self.cfg.data, num_images=None)
            src = make_source(data, resolution,
                              seed=self.cfg.run.seed + 99)
            n = self.cfg.run.eval_samples
            feats = []
            for i in range(0, n, 64):
                b = min(64, n - i)
                real = src.batch(b, resolution).astype(np.float32)
                feats.append(extractor(real / 127.5 - 1.0))
            self._eval_real[resolution] = np.concatenate(feats)
        return self._eval_real[resolution]

    def run_eval(self, phase, shown: float, step_i: int) -> dict:
        """Score the G-EMA (FID + KID, untruncated, current resolution and
        fade-in alpha) against cached real features; log to train.jsonl /
        TensorBoard. The official trainers log FID every N kimg into the
        training record — this is that cadence (run.eval_kimg)."""
        from ganlab_tpu.eval.fid import compute_fid, compute_kid

        cfg = self.cfg
        extractor = self._get_eval_extractor()
        real = self._eval_real_features(phase.resolution)
        lg = phase.res_log2
        if lg not in self._eval_samplers:
            # Traced alpha (unlike the save_samples sampler, which pins
            # alpha static at 1.0): fade-phase evals score the blend the
            # training state actually uses, with one compile per res.
            self._eval_samplers[lg] = jax.jit(build_sample_fn(cfg, lg))
        sampler = self._eval_samplers[lg]
        alpha = float(alpha_at(phase, shown))

        from ganlab_tpu.utils import gen_latents

        key = jax.random.PRNGKey(cfg.run.seed + 1013)
        state = self.state
        n = cfg.run.eval_samples
        feats = []
        done = 0
        while done < n:
            key, kz, kn = jax.random.split(key, 3)
            # Fixed batch of 64 (one compiled program); trim the overshoot.
            z = gen_latents(kz, 64, cfg.model.latent_dim)
            fake = sampler(state.params_ema, state.w_avg, z, kn, 1.0, alpha)
            feats.append(extractor(np.asarray(jax.device_get(fake))))
            done += 64
        fake_feats = np.concatenate(feats)[:n]

        row = {
            "eval_fid": compute_fid(real, fake_feats),
            "eval_kid": compute_kid(real, fake_feats,
                                    subset_size=min(1000, n // 2)),
            "eval_extractor": getattr(extractor, "name", "extractor"),
            "eval_samples": n,
            "res": phase.resolution, "kind": phase.kind,
            "shown_imgs": shown,
        }
        self.logger.log(step_i, row)
        return row

    def _reset_optimizer_moments(self) -> None:
        """Reinitialize Adam moments at a progressive phase boundary
        (optim.reset_moments_on_phase — the reference rebuilds/extends its
        optimizers on growth, SURVEY.md:207)."""
        from ganlab_tpu.train.state import make_optimizers

        opt_g, opt_d = make_optimizers(self.cfg)
        state = jax.device_get(self.state)
        state = state.replace(opt_g=opt_g.init(state.params_g),
                              opt_d=opt_d.init(state.params_d))
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        self.state = state

    def _stop_trace(self, metrics=None):
        if getattr(self, "_trace_active", False):
            if metrics is not None:
                jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            self._trace_active = False

    def _finish(self):
        # Close an in-flight profiler trace if the run ended before step 20.
        self._stop_trace()
        self.save_checkpoint()
        self.ckpt.wait()

    # ------------------------------------------------------------------
    def save_checkpoint(self) -> None:
        state = jax.device_get(self.state)
        self.ckpt.save(int(state.step), state)

    def save_samples(self, res_log2: int | None = None,
                     tag: str = "final", psi: float | None = None,
                     out: str | None = None) -> str:
        cfg = self.cfg
        lg = res_log2 if res_log2 is not None else cfg.model.res_log2
        sampler = self._sampler(lg)
        key = jax.random.PRNGKey(cfg.run.seed + 1)
        z = gen_latents(key, cfg.run.num_sample_images, cfg.model.latent_dim)
        psi = psi if psi is not None else cfg.model.truncation_psi
        state = self.state
        imgs = sampler(state.params_ema, state.w_avg, z,
                       jax.random.PRNGKey(0), psi, 1.0)
        path = out or os.path.join(self.workdir, cfg.run.sample_dir,
                                   f"{tag}_res{2 ** lg}.png")
        return save_image_grid(np.asarray(jax.device_get(imgs)), path)

    def close(self):
        self.ckpt.close()
        self.logger.close()
