"""Training orchestration: run dirs, epoch loop, dp mesh, checkpoints,
metrics, validation.

Replaces the reference's Trainer/Network split (FGT/trainer.py:14-199,
FGT/networks/network.py:21-491; LAFC twins) with one TPU-native design:

* mp.spawn + NCCL DDP        -> a jax.sharding.Mesh ``dp`` axis; batches
  are host-sharded by the loader and device-sharded by ``put_batch``; XLA
  inserts the gradient all-reduce inside the jitted step.
* StepLR + manual warmup     -> optax schedules resolved per global step
  (so "scheduler state" is just the step counter).
* checkpoint trio            -> gen/dis/opt ``.msgpack`` files with the
  reference's name pattern and resume/finetune semantics
  (FGT/networks/network.py:51-78,225-256).
* TensorBoard                -> JSONL metrics (always) + TensorBoard when
  the writer is importable.

Validation follows the reference protocol: first ``val_videos`` videos of
a DAVIS-style tree, pivot frame 20, centered square mask, PSNR/SSIM/L1/L2
(FGT/networks/network.py:258-354).
"""

from __future__ import annotations

import json
import math
import os
import random
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fgt_tpu.core import metrics as metrics_mod
from fgt_tpu.core.masks import rect_mask
from fgt_tpu.data import create_dataloader, create_dataset, ShardedSampler
from fgt_tpu.models.discriminator import TemporalPatchGAN
from fgt_tpu.models.registry import build_model
from fgt_tpu.parallel.mesh import make_mesh, put_batch, put_replicated
from fgt_tpu.train.fgt_step import (FGTLossWeights, GANTrainState,
                                    make_fgt_train_step, norm_flows_nhwc)
from fgt_tpu.train.lafc_step import LAFCLossWeights, make_lafc_train_step
from fgt_tpu.train.schedules import make_adam, warmup_step_decay
from fgt_tpu.utils import checkpoint as ckpt
from fgt_tpu.utils.logging_utils import archive_existing_dir, setup_logger


class MetricsWriter:
    """JSONL metrics stream + optional TensorBoard twin."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        try:  # tensorboardX fallback chain like the reference util.py:84-99
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(log_dir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: dict) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)


class Trainer:
    """Epoch loop + run-dir management shared by both stages."""

    model_kind = "base"

    def __init__(self, opt: dict):
        self.opt = opt
        self.rank = jax.process_index()
        self.world_size = opt.get("world_size") or jax.process_count()

        name = opt.get("name", self.model_kind)
        out_root = opt.get("outputdir", opt.get("output_dir", "outputs"))
        self.run_dir = os.path.join(out_root, name)
        if self.rank <= 0:
            if not opt.get("resume"):
                archive_existing_dir(self.run_dir)
            os.makedirs(self.run_dir, exist_ok=True)
            self.logger = setup_logger("fgt_tpu", log_dir=self.run_dir)
            with open(os.path.join(self.run_dir, "config_snapshot.json"),
                      "w") as f:
                json.dump({k: str(v) for k, v in opt.items()}, f, indent=2)
            self.metrics = MetricsWriter(os.path.join(self.run_dir, "tb"))
        else:
            self.logger = setup_logger("fgt_tpu")
            self.metrics = None

        seed = int(opt.get("seed", 10))
        random.seed(seed)
        np.random.seed(seed)
        self.rng = jax.random.PRNGKey(seed)

        # dp is the reference's only scaling axis (DDP); tp Megatron-shards
        # the FGT generator's attention/FFN weights and sp Ulysses-shards
        # its folded temporal frame axis (both no-ops for the LAFC models,
        # which replicate across those axes)
        self.tp = int(opt.get("tp", 1) or 1)
        self.sp = int(opt.get("sp", 1) or 1)
        self.mesh = make_mesh(tp=self.tp, sp=self.sp,
                              devices=opt.get("devices"))
        self.local_dp = int(self.mesh.devices.shape[0])
        if self.rank <= 0:
            self.logger.info("mesh: %s over %d local devices (dp=%d tp=%d "
                             "sp=%d)", self.mesh.axis_names,
                             self.mesh.devices.size, self.local_dp,
                             self.tp, self.sp)

        self._prepare_dataset()
        self.current_step = 0
        self.start_epoch = 0

    def _mesh_scope(self):
        """Active-mesh context for traces carrying sp sharding constraints
        (no-op otherwise)."""
        import contextlib

        if self.sp > 1:
            return jax.sharding.set_mesh(self.mesh)
        return contextlib.nullcontext()

    # ---------------- data ----------------

    def _dataset_name(self) -> str:
        raise NotImplementedError

    def _prepare_dataset(self):
        opt = self.opt
        data_info = opt["datasets"]["dataInfo"]
        self.val_info = opt["datasets"].get("valInfo")
        dcfg = dict(opt["datasets"].get("train", {}))
        for key in ("num_frames", "num_flows", "flow_interval", "sample",
                    "flow_direction", "input_resolution", "norm"):
            if key in opt:
                dcfg.setdefault(key, opt[key])
        # global batch = batch_size per device * local devices
        per_device = int(dcfg.get("batch_size", 1))
        self.global_batch = per_device * self.local_dp
        # reference selects the dataset class dynamically from
        # datasetName_train (FGT/data/__init__.py:35-49); the subclass
        # default is the fallback
        ds_name = str(opt.get("datasetName_train") or self._dataset_name())
        self.train_set = create_dataset(dcfg, data_info, "train", ds_name)
        self.sampler = ShardedSampler(len(self.train_set), shard=self.rank,
                                      num_shards=max(self.world_size, 1),
                                      shuffle=True,
                                      seed=int(opt.get("seed", 10)))
        loader_cfg = dict(dcfg)
        loader_cfg["batch_size"] = self.global_batch // max(self.world_size, 1)
        self.train_loader = create_dataloader("train", self.train_set,
                                              loader_cfg, opt, self.sampler)
        self.train_size = max(1, len(self.train_loader))
        self.total_iterations = int(opt["train"]["MAX_ITERS"])
        self.total_epochs = int(math.ceil(self.total_iterations /
                                          self.train_size))
        if self.rank <= 0:
            self.logger.info("videos: %d, iters/epoch: %d, total iters: %d,"
                             " epochs: %d, global batch: %d",
                             len(self.train_set), self.train_size,
                             self.total_iterations, self.total_epochs,
                             self.global_batch)

    # ---------------- loop ----------------

    def train(self):
        log_freq = int(self.opt.get("train", {}).get("log_freq",
                       self.opt.get("PRINT_INFO_FREQ", 100)))
        save_freq = int(self.opt.get("train", {}).get(
            "save_checkpoint_freq",
            self.opt.get("SAVE_CHECKPOINT_FREQ", 5000)))
        val_freq = int(self.opt.get("train", {}).get("val_freq", 1))
        use_valid = bool(self.opt.get("use_valid", False))
        # running-mean window over LOGGED samples, reset every record_iter
        # samples — the reference's _printLog accumulator semantics
        # (FGT/networks/network.py:184-206). Metrics stay device-side
        # between logs; no extra per-step host sync.
        record_iter = max(1, int(self.opt.get("record_iter", 16)))
        run_sum: dict = {}
        run_n = 0

        for epoch in range(self.start_epoch, self.total_epochs + 1):
            self.sampler.set_epoch(epoch)
            t0 = time.time()
            for batch in self.train_loader:
                if self.current_step >= self.total_iterations:
                    break
                self.current_step += 1
                metrics = self._train_step(batch)
                if self.rank <= 0 and self.current_step % log_freq == 0:
                    scalars = {k: float(v) for k, v in metrics.items()}
                    scalars["it_per_s"] = log_freq / max(time.time() - t0,
                                                         1e-9)
                    if getattr(self, "sched", None) is not None:
                        # the reference logs the LR each print (network.py
                        # :159-182); also makes StepLR decay auditable
                        scalars["lr"] = float(self.sched(self.current_step))
                    t0 = time.time()
                    if run_n >= record_iter:
                        run_sum, run_n = {}, 0
                    run_n += 1
                    for k, v in scalars.items():
                        run_sum[k] = run_sum.get(k, 0.0) + v
                    means = {k: v / run_n for k, v in run_sum.items()}
                    self.metrics.write(self.current_step, means)
                    self.logger.info(
                        "[epoch %d step %d] %s", epoch, self.current_step,
                        " ".join(f"{k}:{v:.4f}" for k, v in means.items()))
                if self.rank <= 0 and self.current_step % save_freq == 0:
                    self.save_checkpoint(epoch)
            if self.current_step >= self.total_iterations:
                break
            if use_valid and (epoch + 1) % val_freq == 0:
                self._validate(epoch)
        if self.rank <= 0:
            self.save_checkpoint(self.total_epochs)
            self.logger.info("Train process has been finished")

    # ---------------- hooks ----------------

    def _train_step(self, batch: dict) -> dict:
        raise NotImplementedError

    def save_checkpoint(self, epoch: int) -> None:
        raise NotImplementedError

    def _validate(self, epoch: int) -> None:  # optional
        pass

    # helpers
    def _ckpt_path(self, tag: str, epoch: int) -> str:
        d = os.path.join(self.run_dir, "checkpoints")
        os.makedirs(d, exist_ok=True)
        return os.path.join(
            d, f"{tag}_{epoch}_{self.current_step}.msgpack")


class LAFCTrainer(Trainer):
    """Stage-1 flow completion (multi-flow P3D LAFC or 2D LAFC-single)."""

    model_kind = "lafc"

    def __init__(self, opt: dict, single: bool = False):
        self.single = single or str(opt.get("model", "")) == "lafc_single"
        super().__init__(opt)
        tr = opt["train"]
        self.model = build_model("lafc_single" if self.single else "lafc",
                                 opt)
        ires = opt.get("input_resolution", (240, 432))
        t = int(opt.get("num_flows", 3))
        dummy_f = jnp.zeros((1, t, ires[0], ires[1], 2))
        dummy_m = jnp.zeros((1, t, ires[0], ires[1], 1))
        if self.single:
            dummy_f, dummy_m = dummy_f[:, 0], dummy_m[:, 0]
        params = jax.jit(self.model.init)(self.rng, dummy_f, dummy_m)

        sched = warmup_step_decay(
            float(tr["lr"]), decay_interval=int(tr["UPDATE_INTERVAL"]),
            gamma=float(tr.get("lr_decay", 0.1)),
            warmup=tr.get("WARMUP"), world_size=self.world_size)
        self.sched = sched
        self.tx = make_adam(sched, beta1=float(tr.get("BETA1", 0.9)),
                            beta2=float(tr.get("BETA2", 0.999)),
                            grad_clip=10.0 if opt.get("gc") else None)
        weights = LAFCLossWeights(
            L1M=float(tr.get("L1M", 1.0)), sm=float(tr.get("sm", 1.0)),
            sm2=float(tr.get("sm2", 1.0)),
            ternary=float(tr.get("ternary", 0.01)),
            edge=float(tr.get("edge_loss", 1.0)))

        cdt = jnp.bfloat16 if int(opt.get("mixed_precision", 0)) else None
        if self.single:
            def apply_2d(params, flows, masks):
                return self.model.apply(params, flows, masks)
            self.step = make_lafc_train_step(self._single_window(apply_2d),
                                             self.tx, weights,
                                             compute_dtype=cdt)
        else:
            self.step = make_lafc_train_step(self.model.apply, self.tx,
                                             weights, compute_dtype=cdt)
        self.params = put_replicated(self.mesh, params)
        self.opt_state = put_replicated(self.mesh, self.tx.init(params))
        if opt.get("path", {}).get("gen_state"):
            self._resume(opt["path"])

    @staticmethod
    def _single_window(apply_2d):
        """Adapt a 2D model to the windowed batch contract by training on
        the pivot flow only (reference single recipe)."""
        def apply(params, diffused_flows, masks):
            if diffused_flows.ndim == 5:
                t = diffused_flows.shape[1]
                diffused_flows = diffused_flows[:, t // 2]
                masks = masks[:, t // 2]
            return apply_2d(params, diffused_flows, masks)
        return apply

    def _dataset_name(self) -> str:
        return ("train_dataset_single_edge" if self.single
                else "train_dataset_edge")

    def _validate(self, epoch: int) -> None:
        """Flow-domain validation (reference LAFC network.py:271-373)."""
        vi = self.val_info or {}
        flow_root = vi.get("flow_root", vi.get("flow_path"))
        if not flow_root or not os.path.isdir(flow_root):
            if self.rank <= 0:
                self.logger.info("validation skipped: no val flows at %s",
                                 flow_root)
            return
        from fgt_tpu.train.validate import validate_lafc

        scores = validate_lafc(
            self.model, jax.device_get(self.params), flow_root,
            num_videos=int(vi.get("num_videos", 10)),
            resolution=tuple(vi.get("input_resolution",
                                    self.opt.get("input_resolution",
                                                 (240, 432)))),
            mask_size=int(vi.get("flow_mask_rect", 96)),
            num_flows=int(self.opt.get("num_flows", 3)),
            interval=int(self.opt.get("flow_interval", 3)),
            single=self.single,
            save_dir=(os.path.join(self.run_dir, "validation",
                                   f"epoch_{epoch}")
                      if self.rank <= 0 else None))
        if self.rank <= 0 and scores:
            self.metrics.write(self.current_step,
                               {f"val/{k}": v for k, v in scores.items()})
            self.logger.info("[val epoch %d] %s", epoch,
                             " ".join(f"{k}:{v:.4f}"
                                      for k, v in scores.items()))

    def _train_step(self, batch: dict) -> dict:
        if self.single:
            # lift 4D single-flow items to a T=1 window for the shared step
            for k in ("flows", "diffused_flows", "masks"):
                if batch[k].ndim == 4:
                    batch[k] = batch[k][:, None]
        batch.pop("flow_gray", None)
        batch = put_batch(self.mesh, {k: jnp.asarray(v)
                                      for k, v in batch.items()})
        self.params, self.opt_state, metrics = self.step(
            self.params, self.opt_state, batch)
        return metrics

    def save_checkpoint(self, epoch: int) -> None:
        ckpt.save_pytree(self.params, self._ckpt_path("gen", epoch))
        ckpt.save_pytree(
            {"epoch": epoch, "iteration": self.current_step,
             "optimizer": self.opt_state},
            self._ckpt_path("opt", epoch))
        cfg = {k: v for k, v in self.opt.items()
               if isinstance(v, (int, float, str, bool, list, tuple))}
        cfg["model"] = "lafc_single" if self.single else "lafc"
        ckpt.save_model_dir(self.params, cfg,
                            os.path.join(self.run_dir, "latest"))
        self.logger.info("checkpoint saved at step %d", self.current_step)

    def _resume(self, paths: dict) -> None:
        self.params = ckpt.load_pytree(self.params, paths["gen_state"])
        if paths.get("opt_state") and not self.opt.get("finetune"):
            st = ckpt.load_pytree(
                {"epoch": 0, "iteration": 0, "optimizer": self.opt_state},
                paths["opt_state"])
            self.start_epoch = int(st["epoch"])
            self.current_step = int(st["iteration"])
            self.opt_state = st["optimizer"]
        if self.rank <= 0:
            self.logger.info("resumed from %s (finetune=%s)",
                             paths["gen_state"], self.opt.get("finetune"))


class FGTTrainer(Trainer):
    """Stage-2 GAN training of the FGT generator with a frozen LAFC-single
    flow oracle (reference FGT/networks/network.py:21-223)."""

    model_kind = "fgt"

    def __init__(self, opt: dict):
        # 'bi' trains on both flow directions — implemented here where the
        # reference raises NotImplementedError (FGT/networks/network.py:
        # 106-107). opt['bi_mode'] picks 'fuse' (default) or 'alternate'.
        self.bi_mode = (str(opt.get("bi_mode", "fuse"))
                        if str(opt.get("flow_direction", "for")) == "bi"
                        else None)
        super().__init__(opt)
        tr = opt["train"]
        self.gen = build_model("model", opt)
        # the train-step generator carries the sp sharding constraints;
        # validation/checkpointing use the plain module (same param tree)
        self.gen_train = (build_model("model", {**opt, "seq_axis": "sp"})
                          if self.sp > 1 else self.gen)
        self.disc = TemporalPatchGAN(
            in_channels=3, dist_cnum=int(opt.get("dist_cnum", 32)))

        h, w = opt.get("input_resolution", (240, 432))
        t = int(opt.get("num_frames", 5))
        rng = self.rng
        dummy_fr = jnp.zeros((1, t, h, w, 3))
        dummy_fl = jnp.zeros((1, t, h, w, 2))
        dummy_m = jnp.zeros((1, t, h, w, 1))
        g_params = jax.jit(self.gen.init)(rng, dummy_fr, dummy_fl, dummy_m)
        d_vars = jax.jit(self.disc.init)(jax.random.fold_in(rng, 1),
                                         dummy_fr)

        sched = warmup_step_decay(
            float(tr["lr"]), decay_interval=int(tr["UPDATE_INTERVAL"]),
            gamma=float(tr.get("lr_decay", 0.1)), warmup=tr.get("WARMUP"),
            world_size=self.world_size)
        self.sched = sched
        self.g_tx = make_adam(sched, beta1=float(tr.get("BETA1", 0.9)),
                              beta2=float(tr.get("BETA2", 0.999)))
        self.d_tx = make_adam(sched, beta1=float(tr.get("BETA1", 0.9)),
                              beta2=float(tr.get("BETA2", 0.999)))

        # frozen flow-completion oracle (LAFC-single)
        self.flow_params = None
        flow_apply = None
        if opt.get("flow_checkPoint"):
            self.flow_model = build_model("lafc_single",
                                          opt.get("flow_config", {}))
            fp = jax.jit(self.flow_model.init)(
                jax.random.fold_in(rng, 2), dummy_fl[:, 0], dummy_m[:, 0])
            fp = ckpt.load_pytree(fp, opt["flow_checkPoint"])
            self.flow_params = put_replicated(self.mesh, fp)

            def flow_apply(params, flows2d, masks2d):
                return self.flow_model.apply(params, flows2d, masks2d)

        weights = FGTLossWeights(
            L1M=float(tr.get("L1M", 1.0)), L1V=float(tr.get("L1V", 1.0)),
            adv=float(tr.get("adv", 0.01)),
            gan_kind=str(tr.get("gan_type", "hinge")))

        def g_apply(params, frames, flows, masks):
            return self.gen_train.apply(params, frames, flows, masks)

        def d_apply(variables, video, sn_update):
            if sn_update:
                out, mut = self.disc.apply(variables, video, sn_update=True,
                                           mutable=["spectral"])
                return out, mut["spectral"]
            return self.disc.apply(variables, video), variables["spectral"]

        self.step = make_fgt_train_step(
            g_apply, d_apply, flow_apply, self.g_tx, self.d_tx, weights,
            bi_mode=self.bi_mode,
            compute_dtype=(jnp.bfloat16
                           if int(opt.get("mixed_precision", 0)) else None))
        state = GANTrainState(
            g_params=g_params, d_params=d_vars["params"],
            d_spectral=d_vars["spectral"], g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32))
        self.state = self._place_state(state)
        if opt.get("path", {}).get("gen_state"):
            self._resume(opt["path"])

    def _place_state(self, state: "GANTrainState") -> "GANTrainState":
        """Mesh placement: generator params + Adam state Megatron-sharded
        over tp (rule table in fgt_tpu/parallel/partition.py), everything
        else replicated."""
        if self.tp > 1:
            from fgt_tpu.parallel.partition import put_partitioned

            return state._replace(
                g_params=put_partitioned(self.mesh, state.g_params),
                g_opt=put_partitioned(self.mesh, state.g_opt),
                d_params=put_replicated(self.mesh, state.d_params),
                d_spectral=put_replicated(self.mesh, state.d_spectral),
                d_opt=put_replicated(self.mesh, state.d_opt),
                step=put_replicated(self.mesh, state.step))
        return put_replicated(self.mesh, state)

    def _dataset_name(self) -> str:
        return "train_dataset"

    def _train_step(self, batch: dict) -> dict:
        b = {"frames": batch["frames"], "masks": batch["masks"]}
        if self.bi_mode:
            b["flows_fwd"] = batch["forward_flo"]
            b["flows_bwd"] = batch["backward_flo"]
        else:
            b["flows"] = batch.get("forward_flo", batch.get("backward_flo"))
        b = put_batch(self.mesh, {k: jnp.asarray(v) for k, v in b.items()})
        with self._mesh_scope():
            self.state, metrics = self.step(self.state, b, self.flow_params)
        return metrics

    def save_checkpoint(self, epoch: int) -> None:
        ckpt.save_pytree(self.state.g_params, self._ckpt_path("gen", epoch))
        ckpt.save_pytree(
            {"params": self.state.d_params,
             "spectral": self.state.d_spectral},
            self._ckpt_path("dist", epoch))
        ckpt.save_pytree(
            {"epoch": epoch, "iteration": self.current_step,
             "g_opt": self.state.g_opt, "d_opt": self.state.d_opt},
            self._ckpt_path("opt", epoch))
        cfg = {k: v for k, v in self.opt.items()
               if isinstance(v, (int, float, str, bool, list, tuple))}
        cfg["model"] = "model"
        ckpt.save_model_dir(self.state.g_params, cfg,
                            os.path.join(self.run_dir, "latest"))
        self.logger.info("checkpoint trio saved at step %d",
                         self.current_step)

    def _resume(self, paths: dict) -> None:
        g = ckpt.load_pytree(self.state.g_params, paths["gen_state"])
        d_params, d_spec = self.state.d_params, self.state.d_spectral
        if paths.get("dis_state"):
            dd = ckpt.load_pytree({"params": d_params, "spectral": d_spec},
                                  paths["dis_state"])
            d_params, d_spec = dd["params"], dd["spectral"]
        g_opt, d_opt = self.state.g_opt, self.state.d_opt
        if paths.get("opt_state") and not self.opt.get("finetune"):
            st = ckpt.load_pytree(
                {"epoch": 0, "iteration": 0, "g_opt": g_opt, "d_opt": d_opt},
                paths["opt_state"])
            self.start_epoch = int(st["epoch"])
            self.current_step = int(st["iteration"])
            g_opt, d_opt = st["g_opt"], st["d_opt"]
        self.state = self._place_state(GANTrainState(
            g_params=g, d_params=d_params, d_spectral=d_spec,
            g_opt=g_opt, d_opt=d_opt,
            step=jnp.asarray(self.current_step, jnp.int32)))
        if self.rank <= 0:
            self.logger.info("resumed from %s (finetune=%s)",
                             paths["gen_state"], self.opt.get("finetune"))

    # ---------------- validation ----------------

    def _validate(self, epoch: int) -> None:
        """DAVIS-protocol in-training validation
        (FGT/networks/network.py:258-354): first N videos, pivot frame 20,
        centered square masks, PSNR/SSIM/L1/L2 on uint8 frames."""
        vi = self.val_info or {}
        frame_root = vi.get("frame_root", vi.get("frame_path"))
        flow_root = vi.get("flow_root", vi.get("flow_path"))
        if not frame_root or not os.path.isdir(frame_root):
            if self.rank <= 0:
                self.logger.info("validation skipped: no val data at %s",
                                 frame_root)
            return
        from fgt_tpu.train.validate import validate_fgt

        scores = validate_fgt(
            self.gen, jax.device_get(self.state.g_params), frame_root,
            flow_root, flow_params=(jax.device_get(self.flow_params)
                                    if self.flow_params is not None else None),
            flow_model=getattr(self, "flow_model", None),
            num_videos=int(vi.get("num_videos", 10)),
            resolution=tuple(vi.get("input_resolution",
                                    self.opt.get("input_resolution",
                                                 (240, 432)))),
            mask_size=int(vi.get("flow_mask_rect", 96)),
            pivot=int(vi.get("pivot", 20)),
            num_frames=int(self.opt.get("num_frames", 5)),
            save_dir=(os.path.join(self.run_dir, "validation",
                                   f"epoch_{epoch}")
                      if self.rank <= 0 else None))
        if self.rank <= 0 and scores:
            self.metrics.write(self.current_step,
                               {f"val/{k}": v for k, v in scores.items()})
            self.logger.info("[val epoch %d] %s", epoch,
                             " ".join(f"{k}:{v:.4f}"
                                      for k, v in scores.items()))
