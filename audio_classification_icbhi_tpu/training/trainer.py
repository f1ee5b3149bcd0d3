"""Trainer with class weighting, grad accumulation, clipping, schedules,
early stopping, TensorBoard logging, and self-describing checkpoints.

Capability match for the reference's default trainer
(src/training/trainer_fixed.py:12-324), re-architected TPU-first:

- the per-batch hot loop is ONE jitted SPMD program (parallel/data_parallel)
  instead of CPU DataLoader preprocessing + per-batch host<->device hops;
- inverse-frequency class weights feed a weighted CE
  (reference :116-134, :53);
- gradient accumulation = lax.scan over stacked microbatches (reference
  :167-180; the trainer stacks `gradient_accumulation_steps` loader batches
  per optimizer step — a tail group smaller than accum_steps is skipped,
  where the reference would let its gradients leak into the next epoch);
- grad clip global-norm 1.0 (reference :170-177);
- bf16 compute policy via the model dtype stands in for AMP+GradScaler
  (reference :95, :150-174) — bf16 on TPU needs no loss scaling;
- best checkpoint on min val loss + periodic every save_every + early
  stopping (reference :288-307), same TensorBoard tag names (:267-272),
  same checkpoint contract (:314-324) plus a resume path the reference
  lacks (SURVEY.md §5).
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audio_classification_icbhi_tpu.data.loader import BatchLoader
from audio_classification_icbhi_tpu.ops.mel import MelFrontend
from audio_classification_icbhi_tpu.parallel.data_parallel import make_step_fns
from audio_classification_icbhi_tpu.parallel.mesh import DATA_AXIS, get_mesh
from audio_classification_icbhi_tpu.training.optimizers import build_optimizer
from audio_classification_icbhi_tpu.training.schedules import build_scheduler
from audio_classification_icbhi_tpu.utils.checkpoint import (
    AsyncCheckpointWriter,
    load_checkpoint,
    save_checkpoint,
)
from audio_classification_icbhi_tpu.utils.tensorboard import SummaryWriter


class Trainer:
    """Best-model selection on minimum validation loss
    (reference trainer_fixed.py:288-294)."""

    plateau_mode = "min"
    # subclasses that score on predictions set this so validate() keeps the
    # per-batch logits from its single pass (no second loader iteration)
    collect_predictions = False

    def __init__(self, model, train_dataset, val_dataset, config: dict[str, Any], mesh=None):
        from audio_classification_icbhi_tpu.utils.config import ensure_compile_cache

        ensure_compile_cache()  # cold XLA compiles dominate short runs
        self.model = model
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.config = config
        self.mesh = mesh if mesh is not None else get_mesh()

        tcfg = config["training"]
        self.epochs = tcfg["epochs"]
        self.batch_size = tcfg["batch_size"]
        self.learning_rate = tcfg["learning_rate"]
        self.accum_steps = max(1, tcfg.get("gradient_accumulation_steps", 1))
        self.early_stopping_patience = tcfg.get("early_stopping_patience", 15)
        self.save_every = tcfg.get("save_every", 5)

        n_dev = self.mesh.devices.size
        model_axis = getattr(model, "axis_name", None)
        if n_dev > 1 and model_axis != DATA_AXIS:
            raise ValueError(
                f"model.axis_name={model_axis!r} but training is data-parallel "
                f"over a {n_dev}-device {DATA_AXIS!r} mesh: BatchNorm statistics "
                "would silently diverge per device. Build the model with "
                f"build_model(config, axis_name={DATA_AXIS!r})."
            )
        if self.batch_size % n_dev:
            raise ValueError(
                f"batch_size {self.batch_size} must be divisible by the "
                f"{n_dev}-device data mesh"
            )

        dcfg = config["data"]
        self.frontend = MelFrontend.from_config(config)

        self.class_weights = self._calculate_class_weights()

        # Multi-host SPMD: ≥2 jax.distributed processes share the global
        # mesh. Host-local batch arrays cannot feed a global-mesh jit, so
        # every sharded input goes through _global_batch (each process
        # contributes its local_batch_slice rows) and replicated array
        # inputs (class_weights, PRNG keys) are placed once with
        # make_array_from_process_local_data. Pinned end-to-end by the
        # 2-process full-Trainer test (tests/test_distributed.py).
        self._multiprocess = jax.process_count() > 1
        if self._multiprocess and dcfg.get("cache_on_device", False):
            print("cache_on_device: disabled under multi-host training "
                  "(the fused dispatch paths are single-controller); "
                  "using the per-step host loader.")
            dcfg = dict(dcfg)
            dcfg["cache_on_device"] = False

        if dcfg.get("cache_on_device", False):
            # decode once, keep waveforms in HBM, ship only index batches
            # (data/device_cache.py — kills per-step host->device transfers)
            from audio_classification_icbhi_tpu.data.device_cache import DeviceCachedLoader

            cache_dtype = dcfg.get("cache_dtype", "auto")
            self.train_loader = DeviceCachedLoader(
                train_dataset, self.batch_size, mesh=self.mesh,
                shuffle=True, drop_last=True, seed=config.get("seed", 42),
                cache_dtype=cache_dtype,
            )
            self.val_loader = DeviceCachedLoader(
                val_dataset, self.batch_size, mesh=self.mesh, shuffle=False,
                cache_dtype=cache_dtype,
            )
            mb = (self.train_loader.nbytes + self.val_loader.nbytes) / 1e6
            print(f"Device cache: {mb:.0f} MB of waveforms resident in HBM")
        else:
            self.train_loader = BatchLoader(
                train_dataset, self.batch_size, shuffle=True, drop_last=True,
                seed=config.get("seed", 42),
            )
            self.val_loader = BatchLoader(val_dataset, self.batch_size, shuffle=False)

        self.tx = build_optimizer(tcfg.get("optimizer", "adam"), tcfg.get("weight_decay", 0.0))
        self.scheduler = build_scheduler(
            tcfg.get("scheduler"), self.learning_rate, self.epochs,
            plateau_mode=self.plateau_mode,
            warmup_epochs=int(tcfg.get("warmup_epochs", 0)),
        )
        # fp16 compute needs GradScaler semantics (reference trainer_fixed.py
        # :95,:161-174); bf16 on TPU does not (no loss scaling required).
        precision = tcfg.get("precision") or (
            "bf16" if tcfg.get("mixed_precision", False) else "fp32"
        )
        self.dynamic_loss_scale = precision == "fp16"
        # torch GradScaler defaults: init_scale 65536, growth_interval 2000
        self.scale_state = (np.float32(65536.0), np.int32(0))
        self.steps = make_step_fns(
            model, self.frontend, self.tx, self.mesh,
            accum_steps=self.accum_steps,
            augment=bool(dcfg.get("augmentation", False)) and getattr(train_dataset, "augment", True),
            max_grad_norm=self._max_grad_norm(),
            dynamic_loss_scale=self.dynamic_loss_scale,
            # training.accum_mode (extension): "parallel" (default)
            # evaluates the accum_steps microbatches of one optimizer step
            # concurrently (flattened front end + vmapped model,
            # per-microbatch BN kept exact) — same math as the torch-order
            # sequential "scan" up to float summation order, ~2x step
            # throughput at the reference's accum 4 x batch 32 config
            # (data_parallel.py).
            accum_mode=tcfg.get("accum_mode", "parallel"),
        )

        # Parameter/optimizer initialization (one jitted program on the
        # compute device — see init_variables).
        from audio_classification_icbhi_tpu.models.registry import init_variables

        # training.rng_impl (extension): "rbg" swaps the augmentation/dropout
        # PRNG's bit generation to XLA's hardware RngBitGenerator while
        # keeping threefry-style key splitting — the train step draws ~1.5M
        # normals per microbatch for waveform noise, real VPU time threefry
        # spends outside the MXU. Default (unset) = threefry2x32, byte-stable
        # draws across backends.
        rng_impl = tcfg.get("rng_impl")
        seed = config.get("seed", 42)
        self.root_key = (
            jax.random.key(seed, impl=rng_impl) if rng_impl
            else jax.random.PRNGKey(seed)
        )
        init_key, self.train_key = jax.random.split(self.root_key)
        variables = init_variables(
            model, init_key, (2, dcfg["n_mels"], self.frontend.num_frames, 1)
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})

        # model.pretrained (reference resnet.py:19-26 — torchvision ImageNet
        # init; always passed pretrained=False by reference train.py:92).
        # Here it loads a torch state_dict from model.pretrained_path via
        # models/torch_import.py (no-egress image: weights can't be
        # downloaded, so the user supplies the .pt file).
        if self.config["model"].get("pretrained", False):
            self._load_pretrained()
        self.opt_state = self.tx.init(self.params)

        self.checkpoint_dir = Path(tcfg.get("checkpoint_dir", "checkpoints"))
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        # training.async_checkpoint (default on): checkpoint writes snapshot
        # state on device and fetch/serialize on a worker thread, so the
        # device->host crawl (seconds per save through the tunnel) overlaps
        # the next epoch instead of blocking it. train() waits before
        # returning — files on disk are identical to synchronous saves.
        self.async_checkpoint = bool(tcfg.get("async_checkpoint", True))
        self._ckpt_writer = None
        self.writer = SummaryWriter(log_dir=tcfg.get("log_dir", "runs"))

        if self._multiprocess:
            # every array the global-mesh jit consumes must be a GLOBAL
            # array: init ran on process-local devices, so re-place state
            # and class weights replicated across the whole mesh
            rep_tree = functools.partial(jax.tree_util.tree_map, self._replicated)
            self.params = rep_tree(self.params)
            self.batch_stats = rep_tree(self.batch_stats)
            self.opt_state = rep_tree(self.opt_state)
            self.class_weights = self._replicated(self.class_weights)

        self.history = {"train_loss": [], "val_loss": [], "train_acc": [], "val_acc": []}
        self.val_predictions = (np.zeros(0, np.int64), np.zeros(0, np.int64))
        self.best_val_loss = float("inf")
        self.patience_counter = 0
        self.start_epoch = 0

    # ------------------------------------------------------------------ setup

    def _load_pretrained(self) -> None:
        """Initialize params/batch_stats from a torch state_dict
        (model.pretrained + model.pretrained_path). Accepts the reference's
        trained checkpoints for either architecture, or a plain torchvision
        resnet18 ImageNet state_dict (3-channel stem folded to 1, head kept
        at flax init — reference resnet.py:23-39 semantics)."""
        from audio_classification_icbhi_tpu.models import torch_import

        path = self.config["model"].get("pretrained_path")
        if not path:
            raise ValueError(
                "model.pretrained=true requires model.pretrained_path (a "
                "torch .pt/.pth state_dict; this environment has no network "
                "egress to download torchvision weights)")
        sd = torch_import.load_torch_checkpoint(path)
        arch = self.config["model"]["architecture"].lower()
        if arch == "cnn":
            converted = torch_import.convert_lightweight_cnn(sd)
        else:
            converted = torch_import.convert_resnet18(sd, sum_rgb_stem=True)

        def merge(init_tree, new_tree):
            # keep flax-init leaves for anything the state_dict lacks
            # (e.g. the head when importing a plain torchvision resnet18)
            out = dict(init_tree)
            for k, v in new_tree.items():
                out[k] = merge(init_tree[k], v) if isinstance(v, dict) and k in out else v
            return out

        self.params = merge(jax.tree_util.tree_map(np.asarray, self.params),
                            converted["params"])
        self.batch_stats = merge(
            jax.tree_util.tree_map(np.asarray, self.batch_stats),
            converted.get("batch_stats", {}))
        n = sum(x.size for x in jax.tree_util.tree_leaves(converted["params"]))
        print(f"Loaded pretrained weights from {path} ({n:,} params)")

    def _max_grad_norm(self) -> float:
        """Gradient-clip threshold consumed by the single step build in
        __init__ (reference trainer_fixed.py clips at 1.0; the legacy loop
        never clips — LegacyTrainer overrides this to inf instead of
        rebuilding the jitted steps)."""
        return 1.0

    def _calculate_class_weights(self) -> np.ndarray:
        """Inverse-frequency weights (reference trainer_fixed.py:116-134).

        training.class_weighting=false (an extension; the reference always
        weights) switches to uniform weights — used by the accuracy-ablation
        benchmark to measure what weighting buys on the imbalanced set.
        """
        labels = self.train_dataset.labels
        num_classes = self.config["model"]["num_classes"]
        counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
        if not self.config["training"].get("class_weighting", True):
            print("\nClass weighting disabled (uniform weights).")
            return np.ones(num_classes, np.float32)
        weights = len(labels) / (num_classes * np.maximum(counts, 1))
        print("\nClass distribution:")
        for i, (count, weight) in enumerate(zip(counts, weights)):
            name = self.config["classes"][i] if i < len(self.config["classes"]) else str(i)
            print(f"  {name}: {int(count)} samples (weight: {weight:.3f})")
        return weights.astype(np.float32)

    # --------------------------------------------------------- multihost placement

    def _replicated(self, x):
        """Host value -> array replicated on the (possibly multi-process)
        global mesh. Under one process this is an ordinary device_put."""
        from audio_classification_icbhi_tpu.parallel.mesh import replicate_multihost

        return replicate_multihost(self.mesh, x)

    def _replicated_key(self, key):
        """PRNG keys cross into the global jit as replicated arrays; typed
        keys (training.rng_impl) round-trip through key_data/wrap_key_data."""
        if not self._multiprocess:
            return key
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            data = self._replicated(jax.random.key_data(key))
            return jax.random.wrap_key_data(data, impl=jax.random.key_impl(key))
        return self._replicated(key)

    def _global_train_group(self, wavs, labels):
        """(A, B, L)/(A, B) host group -> global arrays batch-sharded over
        the mesh: each process contributes only its local_batch_slice rows
        (the multi-host input contract, parallel/mesh.py). No-op under one
        process — the jit reshards host arrays itself."""
        if not self._multiprocess:
            return wavs, labels
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audio_classification_icbhi_tpu.parallel.mesh import local_batch_slice

        sl = local_batch_slice(wavs.shape[1])
        sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return (
            jax.make_array_from_process_local_data(sh, np.asarray(wavs[:, sl])),
            jax.make_array_from_process_local_data(sh, np.asarray(labels[:, sl])),
        )

    def _global_eval_batch(self, wavs, labels, mask):
        """(B, ...) eval batch -> global batch-sharded arrays (see above)."""
        from audio_classification_icbhi_tpu.parallel.mesh import (
            shard_eval_batch_multihost,
        )

        return shard_eval_batch_multihost(self.mesh, wavs, labels, mask)

    # ------------------------------------------------------------------ epochs

    def _grouped_batches(self, loader):
        """Yield (wavs (A, B, L), labels (A, B)) stacked accumulation groups.

        A partial tail group (fewer than accum_steps loader batches) is
        yielded too and steps the optimizer with its gradient scaled by
        tail/accum — the scan length becomes the leading dim, costing one
        extra compile for the tail shape. (Skipping the tail silently
        trained NOTHING whenever a small dataset had fewer batches per
        epoch than accum_steps — found live; the reference instead leaks
        tail gradients into the next epoch, trainer_fixed.py:167-180.)
        """
        buf_w, buf_l = [], []

        def stack(ws, ls):
            # device-cached loaders yield jax arrays: stack stays on device
            # (np.stack would round-trip every batch through the host)
            xp = np if isinstance(ws[0], np.ndarray) else jnp
            return xp.stack(ws), np.stack(ls)

        for wavs, labels in loader:
            buf_w.append(wavs)
            buf_l.append(labels)
            if len(buf_w) == self.accum_steps:
                yield stack(buf_w, buf_l)
                buf_w, buf_l = [], []
        if buf_w:
            yield stack(buf_w, buf_l)

    def _use_multi_dispatch(self) -> bool:
        """Multi-step-per-dispatch path: available when the waveform cache
        is device-resident (data.cache_on_device) and no GradScaler state
        must round-trip the host per step. training.steps_per_dispatch
        tunes it (0/absent = whole epoch per dispatch, 1 = disable, K =
        chunk size); the per-dispatch floor on the tunneled TPU is ~5 ms,
        a third of an 11-15 ms step, so batching steps into one program
        is where that time comes back (VERDICT r2 #3)."""
        from audio_classification_icbhi_tpu.data.device_cache import DeviceCachedLoader

        if self.steps.train_many is None:
            return False
        if not isinstance(self.train_loader, DeviceCachedLoader):
            return False
        return int(self.config["training"].get("steps_per_dispatch", 0)) != 1

    def _train_epoch_fused(self, epoch: int, lr) -> tuple[float, float]:
        """One (or few) dispatches for the whole epoch: ship the epoch's
        (S, B) shuffled index table, scan optimizer steps on device against
        the HBM-resident cache. Per-step PRNG keys replicate the per-step
        path exactly (fold_in(epoch_key, group_idx) in-graph == on host),
        so both paths train identically (tested)."""
        loader = self.train_loader
        idxs = loader.epoch_index_batches()  # (S, B)
        s_total = idxs.shape[0]
        if s_total == 0:
            return 0.0, 0.0
        labels = loader.labels_all[idxs]  # (S, B)
        a = self.accum_steps
        groups = s_total // a
        spd = int(self.config["training"].get("steps_per_dispatch", 0)) or max(groups, 1)
        epoch_key = jax.random.fold_in(self.train_key, epoch)

        # Metrics stay ON DEVICE until the single epoch-end fetch: every
        # np.asarray of a device scalar costs a 30-50 ms tunnel RPC, which
        # measured LARGER than the whole epoch's fused compute (epoch wall
        # 328 ms of which ~100 ms was compute; 3 per-chunk fetches ate the
        # rest). One packed fetch per epoch leaves only dispatch + compute.
        losses, corrects, counts = [], [], []
        g = 0
        while g < groups:
            k = min(spd, groups - g)
            sl = slice(g * a, (g + k) * a)
            chunk_idx = jnp.asarray(idxs[sl].reshape(k, a, self.batch_size))
            chunk_lab = jnp.asarray(labels[sl].reshape(k, a, self.batch_size))
            (self.params, self.batch_stats, self.opt_state, m) = self.steps.train_many(
                self.params, self.batch_stats, self.opt_state, loader.cache,
                chunk_idx, chunk_lab, self.class_weights, lr, epoch_key,
                np.int32(g),
            )
            losses.append(m["loss"])
            corrects.append(m["correct"])
            counts.append(m["count"])
            g += k
        # tail group (< accum_steps loader batches): one per-step dispatch,
        # gradient scaled by tail/accum like _grouped_batches' tail
        tail = s_total - groups * a
        if tail:
            sl = slice(groups * a, s_total)
            wavs = loader._gather(loader.cache, jnp.asarray(idxs[sl].reshape(-1)))
            wavs = wavs.reshape(tail, self.batch_size, -1)
            key = jax.random.fold_in(epoch_key, groups)
            self.params, self.batch_stats, self.opt_state, m = self.steps.train_step(
                self.params, self.batch_stats, self.opt_state,
                wavs, labels[sl], self.class_weights, lr, key,
            )
            losses.append(jnp.atleast_1d(m["loss"]))
            corrects.append(m["correct"])
            counts.append(m["count"])
        packed = self._pack_epoch_metrics(tuple(losses), tuple(corrects), tuple(counts))
        vals = np.asarray(packed)  # the epoch's ONE host<->device fetch
        loss_mean, correct, total = float(vals[0]), float(vals[1]), float(vals[2])
        return loss_mean, 100.0 * correct / max(total, 1.0)

    @staticmethod
    @jax.jit
    def _pack_epoch_metrics(losses, corrects, counts):
        """(mean step loss, total correct, total count) as ONE device
        array, so the epoch summary costs one tunnel round-trip."""
        def total(xs):
            return jnp.sum(jnp.concatenate([jnp.atleast_1d(x) for x in xs]))

        flat = jnp.concatenate([jnp.atleast_1d(l) for l in losses])
        return jnp.stack([flat.mean(), total(corrects), total(counts)])

    def train_epoch(self, epoch: int) -> tuple[float, float]:
        self.train_loader.set_epoch(epoch)
        lr = np.float32(self.scheduler.lr)
        if self._use_multi_dispatch():
            return self._train_epoch_fused(epoch, lr)
        step_metrics = []
        for step_idx, (wavs, labels) in enumerate(self._grouped_batches(self.train_loader)):
            key = jax.random.fold_in(jax.random.fold_in(self.train_key, epoch), step_idx)
            if self._multiprocess:
                wavs, labels = self._global_train_group(wavs, labels)
                key = self._replicated_key(key)
            if self.dynamic_loss_scale:
                (self.params, self.batch_stats, self.opt_state, metrics,
                 self.scale_state) = self.steps.train_step(
                    self.params, self.batch_stats, self.opt_state,
                    wavs, labels, self.class_weights, lr, key, self.scale_state,
                )
            else:
                self.params, self.batch_stats, self.opt_state, metrics = self.steps.train_step(
                    self.params, self.batch_stats, self.opt_state,
                    wavs, labels, self.class_weights, lr, key,
                )
            # Do NOT fetch scalars here: a device->host scalar read costs
            # 30-50 ms per RPC on the tunneled TPU backend (measured) vs a
            # ~17 ms step — metrics transfer once per epoch instead. The
            # block keeps the dispatch queue shallow (donated-buffer
            # backpressure) at ~1 ms cost.
            jax.block_until_ready(metrics["loss"])
            step_metrics.append(metrics)
        if not step_metrics:
            return 0.0, 0.0
        packed = self._pack_epoch_metrics(  # ONE fetch, not three RPCs
            tuple(m["loss"] for m in step_metrics),
            tuple(m["correct"] for m in step_metrics),
            tuple(m["count"] for m in step_metrics),
        )
        vals = np.asarray(packed)
        return float(vals[0]), 100.0 * float(vals[1]) / max(float(vals[2]), 1.0)

    def _pad_eval_batch(self, wavs, labels):
        from audio_classification_icbhi_tpu.parallel.data_parallel import pad_eval_batch

        return pad_eval_batch(wavs, labels, self.batch_size)

    def _eval_batches(self, loader):
        """Pad partial batches to batch_size with a validity mask so one
        compiled eval graph serves the whole loader."""
        for wavs, labels in loader:
            yield self._pad_eval_batch(wavs, labels)

    def _use_fused_eval(self) -> bool:
        """Fused validation: same prerequisites and knob as the train side
        (_use_multi_dispatch) but keyed on the VAL loader — the whole val
        epoch's full batches scan on device in one dispatch against the HBM
        cache instead of paying a ~5 ms dispatch + blocking sync per batch."""
        from audio_classification_icbhi_tpu.data.device_cache import DeviceCachedLoader

        if self.steps.eval_many is None:
            return False
        if not isinstance(self.val_loader, DeviceCachedLoader):
            return False
        return int(self.config["training"].get("steps_per_dispatch", 0)) != 1

    def _validate_fused(self) -> tuple[float, float]:
        """The WHOLE val epoch — tail batch included via per-row masks —
        scans on device in eval_many dispatches, one per steps_per_dispatch
        chunk (0 = the whole epoch in one program, K bounds program size
        exactly like the train side), with one packed metric fetch per
        chunk (+ one predictions fetch when collecting). The tail batch
        pads to batch_size with mask-0 rows inside the same program, so no
        separate tail dispatch + blocking RPC remains (through the TPU
        tunnel that pair cost ~45 ms of an ~80 ms validation epoch). Loss
        keeps the reference's mean-of-per-batch-criterion semantics
        (trainer_fixed.py:224,237), identical to the per-batch path
        (equivalence pinned in tests/test_trainer_e2e.py::
        test_fused_validation_matches_per_batch)."""
        loader = self.val_loader
        batches = loader._batch_indices()  # loader order: full first, tail last
        if not batches:
            if self.collect_predictions:
                self.val_predictions = (np.zeros(0, np.int64), np.zeros(0, np.int64))
            return 0.0, 0.0
        bsz = self.batch_size
        rows, row_masks, labs, counts = [], [], [], []
        for bidx in batches:
            bidx = np.asarray(bidx)
            n = len(bidx)
            m = np.zeros(bsz, np.float32)
            m[:n] = 1.0
            if n < bsz:
                bidx = np.concatenate([bidx, np.zeros(bsz - n, bidx.dtype)])
            rows.append(bidx)
            row_masks.append(m)
            labs.append(loader.labels_all[bidx])  # pad-row labels: masked out
            counts.append(n)
        idxs = np.stack(rows).astype(np.int32)  # (S, B)
        mask = np.stack(row_masks)
        labels = np.stack(labs).astype(np.int32)
        ratios, corrects = [], []
        total = 0.0
        kept_true, kept_pred = [], []
        spd = int(self.config["training"].get("steps_per_dispatch", 0)) or len(batches)
        for s in range(0, len(batches), max(spd, 1)):
            sl = slice(s, s + spd)
            num, den, corr, preds = self.steps.eval_many(
                self.params, self.batch_stats, loader.cache,
                jnp.asarray(idxs[sl]), jnp.asarray(labels[sl]),
                jnp.asarray(mask[sl]), self.class_weights,
            )
            packed = np.asarray(jnp.stack([num, den, corr]))  # (3, k): one RPC
            ratios += list(packed[0] / np.maximum(packed[1], 1e-12))
            corrects.append(packed[2].sum())
            chunk_counts = counts[s:s + spd]
            total += sum(chunk_counts)
            if self.collect_predictions:
                pr = np.asarray(preds)  # RPC two
                for j, n in enumerate(chunk_counts):
                    kept_true.append(labels[s + j, :n])
                    kept_pred.append(pr[j, :n])
        if self.collect_predictions:
            self.val_predictions = (
                np.concatenate(kept_true).astype(np.int64)
                if kept_true else np.zeros(0, np.int64),
                np.concatenate(kept_pred).astype(np.int64)
                if kept_pred else np.zeros(0, np.int64),
            )
        if not ratios:
            return 0.0, 0.0
        return (float(np.mean(ratios)),
                100.0 * float(np.sum(corrects)) / max(total, 1.0))

    def validate(self, epoch: int) -> tuple[float, float]:
        """One pass over the val loader. When collect_predictions is set the
        same pass also records (y_true, y_pred) in self.val_predictions, so
        subclasses that score on predictions (ICBHI) never re-iterate the
        loader (reference re-ran validation twice; advisor r1)."""
        if self._use_fused_eval():
            return self._validate_fused()
        sums, total = [], 0.0
        kept_preds, kept_labels, kept_b = [], [], []
        for wavs, labels, mask, b in self._eval_batches(self.val_loader):
            # hosts keep the ORIGINAL labels for metrics; only the jit
            # inputs get multi-host placement
            g_wavs, g_labels, g_mask = self._global_eval_batch(wavs, labels, mask)
            logits, num, den, corr = self.steps.eval_step(
                self.params, self.batch_stats, g_wavs, g_labels, g_mask,
                self.class_weights
            )
            jax.block_until_ready(num)  # shallow queue; reads deferred (see train_epoch)
            sums.append((num, den, corr))
            total += b
            if self.collect_predictions:
                # argmax on device, fetch ONCE after the loop — a per-batch
                # np.asarray(logits) costs a 30-50 ms RPC on the tunnel
                kept_preds.append(jnp.argmax(logits, axis=-1))
                kept_labels.append(labels[:b])
                kept_b.append(b)
        if self.collect_predictions:
            preds = np.asarray(jnp.stack(kept_preds)) if kept_preds else np.zeros((0, 0))
            y_pred = [preds[i, :b] for i, b in enumerate(kept_b)]
            self.val_predictions = (
                np.concatenate(kept_labels).astype(np.int64)
                if kept_labels else np.zeros(0, np.int64),
                np.concatenate(y_pred).astype(np.int64)
                if y_pred else np.zeros(0, np.int64),
            )
        if not sums:
            return 0.0, 0.0
        stacked = np.asarray(jnp.stack([jnp.stack(s) for s in sums]))  # (N, 3)
        # reference averages per-batch criterion values (trainer_fixed.py:224,237)
        val_loss = float(np.mean(stacked[:, 0] / np.maximum(stacked[:, 1], 1e-12)))
        val_acc = 100.0 * float(stacked[:, 2].sum()) / max(total, 1.0)
        return val_loss, val_acc

    # ------------------------------------------------------------------ loop

    def _epoch_metrics(self, epoch: int) -> dict[str, float]:
        """Hook: extra per-epoch validation metrics (ICBHI trainer overrides)."""
        return {}

    def _selection_metric(self, val_loss: float, extra: dict) -> float:
        return val_loss

    def _is_improvement(self, metric: float) -> bool:
        return metric < self.best_val_loss

    def precompile(self, barrier_timeout_s: float = 600.0) -> None:
        """Compile-ahead: trace + compile the per-step programs the first
        epoch will run WITHOUT executing them, then (multi-process) hold
        every process at a coordination-service barrier until all have.

        Why: a jitted collective program's first dispatch compiles AND
        executes. Across hosts, compile time varies (persistent-cache
        hits vs misses, host contention), so fast hosts enter the
        program's FIRST collective while stragglers still compile. XLA's
        gloo CPU transport forms each executable's communicator clique at
        first execution inside a fixed ~30 s rendezvous window, so >30 s
        of compile skew is fatal (observed: the 4-process full-Trainer
        test dying with "Gloo context initialization failed:
        DEADLINE_EXCEEDED"); on a TPU pod the same skew just burns
        chip-seconds in the collective. Compiling ahead writes the
        executables into the persistent compilation cache
        (ensure_compile_cache, on by default) so the jit call path hits
        it, and the barrier rides the coordination service — NOT the
        collective fabric — so it tolerates arbitrary skew.

        train() calls this automatically under multi-process meshes.
        Single-process callers may use it for fail-fast compilation.
        Scope: the per-step (non-fused) programs — the only ones a
        multi-process Trainer runs (the fused dispatch paths are
        single-controller and disable themselves under multi-host).
        """
        import time as _time

        t0 = _time.perf_counter()
        B = self.batch_size
        L = self.frontend.target_length
        lab_dtype = np.int32  # BatchLoader contract: (B, L) f32, (B,) i32
        a = self.accum_steps
        s_total = len(self.train_dataset) // B  # loader drops partial batches
        lr = np.float32(self.scheduler.lr)
        key = self._replicated_key(
            jax.random.fold_in(jax.random.fold_in(self.train_key, 0), 0))

        def lower_train(group):
            wavs = np.zeros((group, B, L), np.float32)
            labels = np.zeros((group, B), lab_dtype)
            if self._multiprocess:
                wavs, labels = self._global_train_group(wavs, labels)
            args = (self.params, self.batch_stats, self.opt_state,
                    wavs, labels, self.class_weights, lr, key)
            if self.dynamic_loss_scale:
                args = args + (self.scale_state,)
            self.steps.train_step.lower(*args).compile()

        groups, tail = s_total // a, s_total % a
        if groups:
            lower_train(a)
        if tail:
            lower_train(tail)  # the partial tail group is its own shape

        ewavs, elabels, emask = self._global_eval_batch(
            np.zeros((B, L), np.float32), np.zeros((B,), lab_dtype),
            np.zeros((B,), np.float32))
        self.steps.eval_step.lower(
            self.params, self.batch_stats, ewavs, elabels, emask,
            self.class_weights).compile()
        print(f"precompile: step programs compiled in "
              f"{_time.perf_counter() - t0:.1f}s")

        if self._multiprocess:
            from jax._src import distributed

            client = distributed.global_state.client
            if client is not None:
                client.wait_at_barrier(
                    "trainer-precompile", timeout_in_ms=int(barrier_timeout_s * 1000))
                print("precompile: all processes compiled (barrier passed)")

    def train(self, resume_from: str | None = None, profile_dir: str | None = None) -> dict:
        """profile_dir enables a jax.profiler trace of the first trained
        epoch (TensorBoard-viewable) — the tracing subsystem the reference
        lacks (SURVEY.md §5)."""
        if resume_from:
            self.restore(resume_from)
        print(f"\nStarting training for {self.epochs} epochs...")
        print(f"Training samples: {len(self.train_dataset)}")
        print(f"Validation samples: {len(self.val_dataset)}")
        print(f"Devices: {self.mesh.devices.size}x {jax.devices()[0].platform}")
        print(f"Batch size: {self.batch_size} (grad accum {self.accum_steps})")
        print(f"Learning rate: {self.learning_rate}")

        if self._multiprocess:
            # compile-ahead + cross-process barrier: keeps every process's
            # first collective aligned (see precompile's docstring)
            self.precompile()

        try:
            self._train_loop(profile_dir)
        except BaseException:
            # a printed "✓ saved" must mean a durable file even when a later
            # epoch raises (tunnel RPC error, Ctrl-C): drain queued async
            # writes — but never let a drain failure mask the PRIMARY error
            # the operator needs to debug
            try:
                self.wait_for_checkpoints(close=True)
            except Exception:
                pass
            raise
        self.wait_for_checkpoints(close=True)  # clean exit: errors surface
        print("\n✓ Training completed!")
        self.writer.close()
        return self.history

    def _train_loop(self, profile_dir: str | None) -> None:
        for epoch in range(self.start_epoch, self.epochs):
            t0 = time.time()
            tracing = profile_dir is not None and epoch == self.start_epoch
            if tracing:
                jax.profiler.start_trace(profile_dir)
            train_loss, train_acc = self.train_epoch(epoch)
            if tracing:
                jax.profiler.stop_trace()
                print(f"✓ Profiler trace written to {profile_dir}")
            val_loss, val_acc = self.validate(epoch)
            extra = self._epoch_metrics(epoch)

            metric = self._selection_metric(val_loss, extra)
            self.scheduler.step(metric)

            self.writer.add_scalar("Loss/train", train_loss, epoch)
            self.writer.add_scalar("Loss/val", val_loss, epoch)
            self.writer.add_scalar("Accuracy/train", train_acc, epoch)
            self.writer.add_scalar("Accuracy/val", val_acc, epoch)
            self.writer.add_scalar("Learning_Rate", self.scheduler.lr, epoch)
            for tag, value in extra.items():
                self.writer.add_scalar(tag, value, epoch)
            self.writer.flush()

            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)
            self.history["train_acc"].append(train_acc)
            self.history["val_acc"].append(val_acc)
            self._extend_history(extra)

            print(
                f"\nEpoch {epoch + 1}/{self.epochs} - "
                f"Train Loss: {train_loss:.4f}, Train Acc: {train_acc:.2f}% - "
                f"Val Loss: {val_loss:.4f}, Val Acc: {val_acc:.2f}% - "
                f"LR: {self.scheduler.lr:.6f} ({time.time() - t0:.1f}s)"
            )

            if self._is_improvement(metric):
                self._record_best(metric)
                self.patience_counter = 0
                self.save_checkpoint(
                    self.checkpoint_dir / "best_model.ckpt", epoch, val_loss, extra
                )
                print(f"✓ Best model saved ({self._best_description()})")
            else:
                self.patience_counter += 1
                print(
                    f"  No improvement ({self.patience_counter}/{self.early_stopping_patience})"
                )

            if (epoch + 1) % self.save_every == 0:
                self.save_checkpoint(
                    self.checkpoint_dir / f"checkpoint_epoch_{epoch + 1}.ckpt",
                    epoch, val_loss, extra,
                )

            if self.patience_counter >= self.early_stopping_patience:
                print(f"\nEarly stopping triggered after {epoch + 1} epochs")
                break

    def _extend_history(self, extra: dict) -> None:
        pass

    def _record_best(self, metric: float) -> None:
        self.best_val_loss = metric

    def _best_description(self) -> str:
        return f"validation loss: {self.best_val_loss:.4f}"

    # ------------------------------------------------------------------ ckpt

    def _checkpoint_payload(self, epoch: int, val_loss: float, extra: dict) -> dict:
        return {
            "epoch": epoch,
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "val_loss": float(val_loss),
            "config": self.config,
            "class_weights": np.asarray(self.class_weights),
            # trainer-loop state for exact resume: a replayed plateau
            # scheduler resets bad_epochs each epoch, and resuming from a
            # periodic (non-best) checkpoint must not lower the best bar
            "scheduler": self.scheduler.state_dict(),
            "best_metric": float(self._best_metric()),
            "patience_counter": int(self.patience_counter),
        } | (
            # fp16 GradScaler state must resume exactly, or the first
            # post-resume steps overflow at the reset 65536 scale and get
            # skipped while it halves back down
            {"scale_state": np.asarray(
                [float(np.asarray(self.scale_state[0])),
                 float(np.asarray(self.scale_state[1]))], np.float64)}
            if self.dynamic_loss_scale else {}
        )

    def _best_metric(self) -> float:
        return self.best_val_loss

    def _restore_best_metric(self, value: float, ckpt: dict) -> None:
        self.best_val_loss = value

    def save_checkpoint(self, path, epoch: int, val_loss: float, extra: dict | None = None):
        # training.checkpoint_format: "msgpack" (single file, default) or
        # "orbax" (directory; sharded-array/multi-host-aware writes)
        fmt = self.config["training"].get("checkpoint_format", "msgpack")
        if self._multiprocess and fmt == "msgpack" and jax.process_index() != 0:
            # one writer for the single-file format (all processes hold
            # identical replicated state); orbax coordinates its own
            # multi-host writes and needs every process to call save
            return
        payload = self._checkpoint_payload(epoch, val_loss, extra or {})
        if self.async_checkpoint:
            if self._ckpt_writer is None:
                self._ckpt_writer = AsyncCheckpointWriter()
            self._ckpt_writer.save(path, payload, format=fmt)
        else:
            save_checkpoint(path, payload, format=fmt)

    def wait_for_checkpoints(self, close: bool = False) -> None:
        """Block until every queued async checkpoint write is on disk
        (no-op when async_checkpoint is off or nothing was saved).
        close=True also retires the worker thread; a later save()
        transparently gets a fresh writer (lazy construction)."""
        if self._ckpt_writer is not None:
            if close:
                writer, self._ckpt_writer = self._ckpt_writer, None
                writer.close()
            else:
                self._ckpt_writer.wait()

    def restore(self, path) -> None:
        """Resume from a checkpoint (capability the reference lacks).

        Resume is exact: scheduler state, the best-metric bar, and the
        early-stopping patience counter are restored verbatim, so a resumed
        run matches an uninterrupted one epoch for epoch (tested). Legacy
        checkpoints without that state fall back to replaying the scheduler.
        """
        self.wait_for_checkpoints()  # a queued write may be the file we read
        ckpt = load_checkpoint(path)
        # restore into existing pytree structure (msgpack returns plain dicts)
        from flax import serialization

        self.params = serialization.from_state_dict(self.params, ckpt["params"])
        self.batch_stats = serialization.from_state_dict(self.batch_stats, ckpt["batch_stats"])
        self.opt_state = serialization.from_state_dict(self.opt_state, ckpt["opt_state"])
        if self._multiprocess:
            # restored leaves are host arrays; the global-mesh jit needs
            # global placement (every process restores the same file)
            rep_tree = functools.partial(jax.tree_util.tree_map, self._replicated)
            self.params = rep_tree(self.params)
            self.batch_stats = rep_tree(self.batch_stats)
            self.opt_state = rep_tree(self.opt_state)
        self.start_epoch = int(ckpt["epoch"]) + 1

        if self.dynamic_loss_scale and "scale_state" in ckpt:
            s = np.asarray(ckpt["scale_state"])
            self.scale_state = (np.float32(s[0]), np.int32(s[1]))

        if "best_metric" in ckpt:
            self._restore_best_metric(float(ckpt["best_metric"]), ckpt)
        else:  # legacy checkpoint: the old (bar-lowering) approximation
            self._restore_best_metric(self._legacy_best_metric(ckpt), ckpt)
        self.patience_counter = int(ckpt.get("patience_counter", 0))

        if "scheduler" in ckpt:
            from audio_classification_icbhi_tpu.training.schedules import restore_scheduler

            restore_scheduler(self.scheduler, ckpt["scheduler"])
        else:  # legacy: replay with the selection metric, not raw val_loss
            for _ in range(self.start_epoch):
                self.scheduler.step(self._best_metric())
        print(f"Resumed from {path} at epoch {self.start_epoch}")

    def _legacy_best_metric(self, ckpt: dict) -> float:
        return float(ckpt.get("val_loss", float("inf")))
