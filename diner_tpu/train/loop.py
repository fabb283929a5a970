"""Training orchestration loop.

Replaces the Lightning stack (reference ``python_scripts/train.py`` +
``src/models/diner.py`` training hooks): epoch loop over the prefetching
DataLoader, jitted (optionally mesh-sharded) train step, periodic validation
(prediction folder → eval suite → metric log), camera-sweep videos,
checkpointing, TensorBoard + JSONL metric logging, and a config/code
snapshot into the run directory for reproducibility
(cf. ``python_scripts/train.py:57-59``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from diner_tpu.data.loader import DataLoader
from diner_tpu.evaluation import suite as eval_suite
from diner_tpu.train import checkpoint as ckpt_lib
from diner_tpu.train.config import TrainRunConfig
from diner_tpu.train.diner import (
    create_state,
    make_eval_step,
    make_train_step,
)
from diner_tpu.losses import init_vgg19_params
from diner_tpu.utils.visual import colorize, save_image, save_video


def select_eval_indices(dataset, n: int):
    """Deterministic eval subset — the reference's Random(0) protocol
    (``create_prediction_folder.py:37-40``) extended to dedupe sample-NAME
    collisions.

    DTU metas span 7 lights per (scan, cam) while sample_name is
    "{scan}-{cam}" (reference ``dtu.py:231`` — ours matches), so colliding
    draws silently overwrite prediction files and score FEWER images than
    requested (reference behavior: last-write-wins). The first n draws are
    the reference's exact subset; collisions are dropped (first-come wins)
    and replaced from a deterministic continuation of the same RNG until n
    unique names are selected or the dataset is exhausted."""
    idcs = list(range(len(dataset)))
    if not 0 < n < len(idcs):
        return idcs
    import random
    rng = random.Random(0)
    first = rng.sample(idcs, n)  # the reference's exact subset
    topup = rng.sample(idcs, len(idcs))  # deterministic extension
    name_of = getattr(dataset, "sample_name_of", None)
    seen_names, seen_idx, picked = set(), set(), []
    for i in first + topup:
        name = name_of(i) if name_of else i
        if i in seen_idx or name in seen_names:
            continue
        seen_idx.add(i)
        seen_names.add(name)
        picked.append(i)
        if len(picked) == n:
            break
    return picked


class MetricLogger:
    """TensorBoard events (when available) + always a JSONL stream."""

    def __init__(self, log_dir):
        self.log_dir = Path(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        try:
            from flax.metrics import tensorboard
            self._tb = tensorboard.SummaryWriter(str(self.log_dir))
        except Exception:
            self._tb = None

    def log(self, metrics: Dict[str, float], step: int):
        row = {"step": int(step)}
        for k, v in metrics.items():
            row[k] = float(v)
            if self._tb is not None:
                self._tb.scalar(k, float(v), step)
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()


class Trainer:
    def __init__(self, run_cfg: TrainRunConfig, mesh=None, num_workers: int = 2):
        self.cfg = run_cfg
        self.mesh = mesh
        self.num_workers = num_workers
        self.run_dir = run_cfg.run_dir
        os.makedirs(self.run_dir, exist_ok=True)
        self.logger = MetricLogger(self.run_dir / "logs")

        self.train_set = run_cfg.build_dataset("train")
        self.val_set = run_cfg.build_dataset("val")
        self.train_loader = DataLoader(
            self.train_set, num_workers=num_workers,
            **{"batch_size": 4, "shuffle": True,
               **run_cfg.dataloader_kwargs("train")})

        # snapshot the config + code for reproducibility (the reference
        # copies the full source tree into the run dir, general.py:21-27)
        with open(self.run_dir / "config_snapshot.json", "w") as f:
            json.dump(run_cfg.raw, f, indent=2, default=str)
        self._snapshot_code()

    def _snapshot_code(self):
        import diner_tpu
        dst = self.run_dir / "code_snapshot"
        if dst.exists():
            return
        src = Path(diner_tpu.__file__).parent
        try:
            shutil.copytree(
                src, dst / "diner_tpu",
                ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.o"))
        except OSError:
            pass  # read-only install; config snapshot still recorded

    # ------------------------------------------------------------- setup

    def _init_state(self, example_batch):
        dcfg = self.cfg.diner
        vgg_params = None
        if dcfg.w_vgg > 0:
            # converted torchvision VGG19 when dropped in (docs/PRETRAINED.md)
            from diner_tpu.utils.pretrained import load_vgg19_loss_params
            vgg_params = load_vgg19_loss_params()
            if vgg_params is None:
                vgg_params = init_vgg19_params()
        model, state = create_state(dcfg, jax.random.PRNGKey(0),
                                    example_batch, vgg_params)
        if self.cfg.ckpt_path:
            state = ckpt_lib.restore_checkpoint(self.cfg.ckpt_path, state)
        elif (latest := ckpt_lib.latest_checkpoint(
                self.run_dir / "checkpoints")):
            state = ckpt_lib.restore_checkpoint(latest, state)
        return model, state

    def _jit_steps(self, model):
        dcfg = self.cfg.diner
        if self.mesh is not None:
            from diner_tpu.parallel import (
                make_parallel_eval_step,
                make_parallel_train_step,
            )
            return (make_parallel_train_step(model, dcfg, self.mesh,
                                             donate_state=False),
                    make_parallel_eval_step(model, dcfg, self.mesh))
        return (jax.jit(make_train_step(model, dcfg)),
                jax.jit(make_eval_step(model, dcfg)))

    @staticmethod
    def _to_device_batch(batch):
        import jax.numpy as jnp
        return {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, np.ndarray)}

    # --------------------------------------------------------------- fit

    def fit(self, max_steps: Optional[int] = None):
        cfg = self.cfg
        example = next(iter(DataLoader(
            self.train_set,
            batch_size=self.train_loader.batch_size, num_workers=0)))
        model, state = self._init_state(self._to_device_batch(example))
        train_step, eval_step = self._jit_steps(model)

        limit = max_steps if max_steps is not None else cfg.max_steps
        key = jax.random.PRNGKey(int(state.step) + 1)
        step = int(state.step)
        epoch = 0
        t_last = time.time()
        running = {}

        while True:
            if cfg.max_epochs >= 0 and epoch >= cfg.max_epochs:
                break
            for batch in self.train_loader:
                if limit >= 0 and step >= limit:
                    self._save(state)
                    return state
                key, sub = jax.random.split(key)
                if self.mesh is not None:
                    from diner_tpu.parallel import shard_batch
                    dbatch = shard_batch(self._to_device_batch(batch),
                                         self.mesh)
                else:
                    dbatch = self._to_device_batch(batch)
                state, metrics = train_step(state, dbatch, sub)
                step = int(state.step)
                for k, v in metrics.items():
                    running[k] = float(v)

                if step % cfg.log_every_n_steps == 0:
                    dt = time.time() - t_last
                    running["steps_per_sec"] = (
                        cfg.log_every_n_steps / dt if dt > 0 else 0.0)
                    t_last = time.time()
                    self.logger.log(running, step)
                    running = {}
                if cfg.ckpt_every_n_steps > 0 and \
                        step % cfg.ckpt_every_n_steps == 0:
                    self._save(state)
                if cfg.val_check_interval > 0 and \
                        step % cfg.val_check_interval == 0:
                    self.validate(model, state, eval_step, key)
            epoch += 1
        self._save(state)
        return state

    def _save(self, state):
        ckpt_lib.save_checkpoint(self.run_dir / "checkpoints", state,
                                 config_json=self.cfg.raw)

    # -------------------------------------------------------- validation

    def validate(self, model, state, eval_step, key):
        """Reference on_validation_epoch_end: checkpoint + prediction folder
        + eval suite + cam sweeps (``src/models/diner.py:310-330``)."""
        step = int(state.step)
        eval_dir = self.run_dir / f"eval_{step:06d}"
        os.makedirs(eval_dir, exist_ok=True)
        self._save(state)

        visdir = eval_dir / "visualizations"
        self.create_prediction_folder(model, state, eval_step, visdir, key)
        scores = eval_suite.evaluate_folder(visdir, eval_dir)
        self.logger.log({f"valscores_{k}": v for k, v in scores.items()},
                        step)

        try:
            self.create_cam_sweep(model, state, eval_step,
                                  eval_dir / "cam_sweeps", key,
                                  **self.cfg.cam_sweep_settings)
        except (AttributeError, NotImplementedError):
            pass  # dataset without sweep support
        return scores

    def create_prediction_folder(self, model, state, eval_step, outdir, key,
                                 dataset=None, n_samples=None):
        os.makedirs(outdir, exist_ok=True)
        dataset = dataset or self.val_set
        n = n_samples if n_samples is not None else self.cfg.n_samples_score_eval
        idcs = select_eval_indices(dataset, n)
        loader = DataLoader(dataset, batch_size=1, num_workers=self.num_workers,
                            sample_indices=idcs)
        for batch in loader:
            dbatch = self._to_device_batch(batch)
            key, sub = jax.random.split(key)
            rgb, depth = eval_step(state, dbatch, sub)
            rgb = np.asarray(rgb)
            depth = np.asarray(depth)
            src = np.asarray(batch["src_rgbs"])  # (B, NV, H, W, 3)
            gt = np.asarray(batch["target_rgb"])
            names = batch["sample_name"]
            for i in range(rgb.shape[0]):
                stem = str(outdir / names[i])
                save_image(stem + eval_suite.PRED_SUFFIX, rgb[i])
                save_image(stem + eval_suite.DEPTH_SUFFIX,
                           colorize(depth[i]))
                save_image(stem + eval_suite.REF_SUFFIX,
                           np.concatenate(list(src[i]), axis=1))
                save_image(stem + eval_suite.GT_SUFFIX, gt[i])

    def create_cam_sweep(self, model, state, eval_step, outdir, key,
                         nframes: int = 30, n_cam_sweeps: int = 4,
                         fps: int = 5):
        os.makedirs(outdir, exist_ok=True)
        dataset = self.val_set
        sweep_idcs = np.linspace(0, len(dataset) - 1,
                                 n_cam_sweeps).astype(int)
        for idx in sweep_idcs:
            sample = dataset[int(idx)]
            sweep_extr = dataset.get_cam_sweep_extrinsics(nframes=nframes,
                                                          scan_idx=int(idx))
            frames = []
            for f in range(nframes):
                batch = {k: v[None] for k, v in sample.items()
                         if isinstance(v, np.ndarray)}
                batch["target_extrinsics"] = sweep_extr[f][None]
                dbatch = self._to_device_batch(batch)
                key, sub = jax.random.split(key)
                rgb, depth = eval_step(state, dbatch, sub)
                frame = np.concatenate(
                    [np.asarray(rgb)[0], colorize(np.asarray(depth)[0])],
                    axis=0)
                frames.append(frame)
            frames = np.stack(frames)
            frames = frames[list(range(nframes))
                            + list(range(nframes - 1, 0, -1))]
            save_video(Path(outdir) / f"{sample['sample_name']}.mp4",
                       frames, fps)
            save_image(Path(outdir) / f"{sample['sample_name']}-ref_imgs.jpg",
                       np.concatenate(list(sample["src_rgbs"]), axis=1))
