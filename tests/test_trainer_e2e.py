"""End-to-end Trainer tests on synthetic data (8-device CPU mesh).

Covers the full L0->L5 loop in-process: dataset -> loader -> sharded train
steps -> validation -> scheduler -> checkpoints -> TB events -> resume, for
both the default and ICBHI trainers (SURVEY.md §4 integration plan).
"""

import numpy as np
import pytest

from audio_classification_icbhi_tpu.data import generate_segmented_dataset
from audio_classification_icbhi_tpu.data.dataset_segmented import ICBHISegmentedDataset
from audio_classification_icbhi_tpu.models import build_model
from audio_classification_icbhi_tpu.training import LegacyTrainer, Trainer, TrainerWithICBHI
from audio_classification_icbhi_tpu.utils.checkpoint import load_checkpoint
from audio_classification_icbhi_tpu.utils.tensorboard import read_scalars


def tiny_config(tmp_path, epochs=2):
    return {
        "data": {
            "dataset_path": "unused",
            "sample_rate": 4000,
            "n_mels": 32,
            "n_fft": 256,
            "hop_length": 64,
            "duration": 0.8,
            "augmentation": True,
            "train_split": 0.7,
            "val_split": 0.15,
        },
        "model": {"architecture": "cnn", "num_classes": 4, "dropout": 0.1},
        "training": {
            "batch_size": 8,
            "epochs": epochs,
            "learning_rate": 3e-3,
            "weight_decay": 1e-4,
            "optimizer": "adam",
            "scheduler": "cosine",
            "mixed_precision": False,
            "gradient_accumulation_steps": 2,
            "early_stopping_patience": 50,
            "checkpoint_dir": str(tmp_path / "ckpts"),
            "log_dir": str(tmp_path / "runs"),
            "save_every": 2,
        },
        "device": {"use_cuda": False, "num_workers": 2, "pin_memory": False},
        "classes": ["normal", "crackles", "wheezes", "both"],
        "seed": 0,
    }


@pytest.fixture(scope="module")
def seg_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("seg4k")
    generate_segmented_dataset(root, per_class=16, duration=0.8, sample_rate=4000)
    return root


def make_datasets(root, config):
    train = ICBHISegmentedDataset(root, "train", config, augment=True)
    val = ICBHISegmentedDataset(root, "val", config, augment=False)
    return train, val


class TestTrainerEndToEnd:
    def test_train_checkpoints_events_history(self, seg_data, tmp_path):
        config = tiny_config(tmp_path)
        train, val = make_datasets(seg_data, config)
        model = build_model(config, axis_name="data")
        trainer = Trainer(model, train, val, config)
        history = trainer.train()

        assert len(history["train_loss"]) == 2
        assert all(np.isfinite(history["train_loss"]))
        ckpt_dir = tmp_path / "ckpts"
        assert (ckpt_dir / "best_model.ckpt").exists()
        assert (ckpt_dir / "checkpoint_epoch_2.ckpt").exists()

        # checkpoint contract: embedded config + class weights
        ckpt = load_checkpoint(ckpt_dir / "best_model.ckpt")
        assert ckpt["config"]["model"]["architecture"] == "cnn"
        assert len(ckpt["class_weights"]) == 4
        assert "opt_state" in ckpt and "batch_stats" in ckpt

        # TB events with reference tag names
        events = list((tmp_path / "runs").glob("events.out.tfevents.*"))
        assert events
        scalars = read_scalars(events[0])
        for tag in ("Loss/train", "Loss/val", "Accuracy/train", "Accuracy/val", "Learning_Rate"):
            assert tag in scalars, tag
        # cosine schedule: epoch-1 LR < epoch-0 LR
        lrs = [v for _, v in scalars["Learning_Rate"]]
        assert lrs[1] < lrs[0]

    def test_resume_from_checkpoint(self, seg_data, tmp_path):
        config = tiny_config(tmp_path, epochs=2)
        train, val = make_datasets(seg_data, config)
        trainer = Trainer(build_model(config, axis_name="data"), train, val, config)
        trainer.train()

        config4 = tiny_config(tmp_path, epochs=4)
        trainer2 = Trainer(build_model(config4, axis_name="data"), train, val, config4)
        history = trainer2.train(resume_from=str(tmp_path / "ckpts" / "checkpoint_epoch_2.ckpt"))
        assert trainer2.start_epoch == 2
        assert len(history["train_loss"]) == 2  # epochs 3 and 4 only

    def test_icbhi_trainer_selects_on_score(self, seg_data, tmp_path):
        config = tiny_config(tmp_path)
        train, val = make_datasets(seg_data, config)
        trainer = TrainerWithICBHI(build_model(config, axis_name="data"), train, val, config)
        history = trainer.train()
        assert len(history["icbhi_score"]) == 2
        assert all(0.0 <= s <= 1.0 for s in history["icbhi_score"])
        ckpt = load_checkpoint(tmp_path / "ckpts" / "best_model.ckpt")
        assert "icbhi_score" in ckpt
        events = list((tmp_path / "runs").glob("events.out.tfevents.*"))
        scalars = read_scalars(events[0])
        assert "ICBHI/score" in scalars

    def test_legacy_trainer_uniform_weights(self, seg_data, tmp_path):
        config = tiny_config(tmp_path, epochs=1)
        train, val = make_datasets(seg_data, config)
        trainer = LegacyTrainer(build_model(config, axis_name="data"), train, val, config)
        np.testing.assert_array_equal(trainer.class_weights, np.ones(4, np.float32))
        history = trainer.train()
        assert np.isfinite(history["train_loss"][0])

    def test_pretrained_torch_weights_seed_trainer(self, seg_data, tmp_path):
        """model.pretrained + model.pretrained_path: a torch state_dict
        (reference resnet.py:19-26 semantics, here the CNN twin from
        test_torch_import) seeds params/batch_stats before training."""
        import torch

        from tests.test_torch_import import TorchLightweightCNN

        tmodel = TorchLightweightCNN().eval()
        torch.save({"model_state_dict": tmodel.state_dict()}, tmp_path / "pre.pt")

        config = tiny_config(tmp_path, epochs=1)
        config["model"]["pretrained"] = True
        config["model"]["pretrained_path"] = str(tmp_path / "pre.pt")
        train, val = make_datasets(seg_data, config)
        trainer = Trainer(build_model(config, axis_name="data"), train, val, config)
        want = tmodel.fc2.weight.detach().numpy().T
        np.testing.assert_allclose(
            np.asarray(trainer.params["Dense_1"]["kernel"]), want, atol=1e-6)
        history = trainer.train()
        assert np.isfinite(history["train_loss"][0])

        # pretrained=true without a path is a clear error (no-egress image)
        config2 = tiny_config(tmp_path / "b", epochs=1)
        config2["model"]["pretrained"] = True
        with pytest.raises(ValueError, match="pretrained_path"):
            Trainer(build_model(config2, axis_name="data"), train, val, config2)

    def test_partial_accum_group_still_trains(self, seg_data, tmp_path):
        """Regression: fewer loader batches than accum_steps must still
        train (found live: the epoch silently yielded zero optimizer steps,
        loss 0.0)."""
        import jax

        config = tiny_config(tmp_path, epochs=1)
        config["training"]["gradient_accumulation_steps"] = 16  # >> n_batches
        train, val = make_datasets(seg_data, config)
        trainer = Trainer(build_model(config, axis_name="data"), train, val, config)
        before = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0]).copy()
        history = trainer.train()
        assert history["train_loss"][0] > 0.5  # real loss, not the empty-epoch 0.0
        after = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0])
        assert not np.array_equal(before, after)  # optimizer actually stepped

    def test_batch_size_mesh_divisibility_error(self, seg_data, tmp_path):
        config = tiny_config(tmp_path)
        config["training"]["batch_size"] = 6  # not divisible by 8 devices
        train, val = make_datasets(seg_data, config)
        with pytest.raises(ValueError, match="divisible"):
            Trainer(build_model(config, axis_name="data"), train, val, config)

    def test_plateau_resume_equals_uninterrupted(self, seg_data, tmp_path):
        """Exact resume: scheduler state + best bar + patience live in the
        checkpoint, so a 2+2-epoch resumed run reproduces a 4-epoch run
        (VERDICT r1 weak #6: replaying plateau steps reset bad_epochs)."""
        cfg_a = tiny_config(tmp_path / "a", epochs=4)
        cfg_a["training"]["scheduler"] = "plateau"
        train, val = make_datasets(seg_data, cfg_a)
        t_full = Trainer(build_model(cfg_a, axis_name="data"), train, val, cfg_a)
        hist_full = t_full.train()

        cfg_b = tiny_config(tmp_path / "b", epochs=2)
        cfg_b["training"]["scheduler"] = "plateau"
        t_half = Trainer(build_model(cfg_b, axis_name="data"), train, val, cfg_b)
        t_half.train()

        cfg_c = tiny_config(tmp_path / "b", epochs=4)
        cfg_c["training"]["scheduler"] = "plateau"
        t_resumed = Trainer(build_model(cfg_c, axis_name="data"), train, val, cfg_c)
        hist_res = t_resumed.train(
            resume_from=str(tmp_path / "b" / "ckpts" / "checkpoint_epoch_2.ckpt")
        )

        np.testing.assert_allclose(
            hist_res["train_loss"], hist_full["train_loss"][2:], rtol=1e-5
        )
        np.testing.assert_allclose(
            hist_res["val_loss"], hist_full["val_loss"][2:], rtol=1e-5
        )
        assert t_resumed.scheduler.state_dict() == t_full.scheduler.state_dict()
        assert t_resumed.best_val_loss == pytest.approx(t_full.best_val_loss, rel=1e-5)
        assert t_resumed.patience_counter == t_full.patience_counter

    def test_icbhi_validation_single_pass_and_resume_bar(self, seg_data, tmp_path):
        """ICBHI trainer: (a) the val loader is iterated ONCE per epoch
        (reference ran it twice), (b) resume restores best_icbhi_score so a
        worse post-resume epoch cannot clobber best_model.ckpt."""
        config = tiny_config(tmp_path, epochs=2)
        train, val = make_datasets(seg_data, config)
        trainer = TrainerWithICBHI(build_model(config, axis_name="data"), train, val, config)

        eval_calls = []
        orig_eval = trainer.steps.eval_step

        def counting_eval(*a, **k):
            eval_calls.append(1)
            return orig_eval(*a, **k)

        trainer.steps = trainer.steps._replace(eval_step=counting_eval)
        trainer.train()
        n_val_batches = -(-len(val) // config["training"]["batch_size"])
        assert len(eval_calls) == 2 * n_val_batches  # 2 epochs x ONE pass each

        trainer2 = TrainerWithICBHI(build_model(config, axis_name="data"), train, val, config)
        trainer2.restore(str(tmp_path / "ckpts" / "checkpoint_epoch_2.ckpt"))
        assert trainer2.best_icbhi_score == pytest.approx(trainer.best_icbhi_score)
        assert np.isfinite(trainer2.best_icbhi_score)

    def test_device_cache_matches_host_loader(self, seg_data, tmp_path):
        """data.cache_on_device keeps decoded waveforms in HBM and ships
        only index batches; batches must match the host loader bit-for-bit
        (same seeded shuffle, same PCM16 dequant values) and training must
        match up to cross-program float rounding."""
        import jax

        from audio_classification_icbhi_tpu.data.device_cache import DeviceCachedLoader
        from audio_classification_icbhi_tpu.data.loader import BatchLoader

        config = tiny_config(tmp_path / "host", epochs=2)
        train, val = make_datasets(seg_data, config)

        host = BatchLoader(train, 8, shuffle=True, drop_last=True, seed=5)
        host.set_epoch(3)
        from audio_classification_icbhi_tpu.parallel.mesh import get_mesh

        dev = DeviceCachedLoader(train, 8, mesh=get_mesh(),
                                 shuffle=True, drop_last=True, seed=5)
        # PCM16-sourced synthetic WAVs round-trip losslessly, so the default
        # cache_dtype="auto" must have stored int16 — and everything below
        # (bit-exact batches vs the host loader, identical training) then
        # exercises the on-device dequant path
        assert dev.cache.dtype == np.int16
        assert dev.nbytes == dev.cache.size * 2
        dev.set_epoch(3)
        for (w1, l1), (w2, l2) in zip(host, dev):
            assert not isinstance(w2, np.ndarray)  # device-resident
            np.testing.assert_array_equal(l1, l2)
            np.testing.assert_allclose(w1, np.asarray(w2), atol=0)

        t_host = Trainer(build_model(config, axis_name="data"), train, val, config)
        hist_host = t_host.train()
        config_dev = tiny_config(tmp_path / "dev", epochs=2)
        config_dev["data"]["cache_on_device"] = True
        t_dev = Trainer(build_model(config_dev, axis_name="data"), train, val, config_dev)
        hist_dev = t_dev.train()
        # identical math; the device arm runs the fused whole-epoch program
        # (cache_on_device enables it), where XLA fuses the PCM16 dequant /
        # augment chain differently than the per-step program — observed
        # ~2e-5 relative on loss histories, pure float rounding
        np.testing.assert_allclose(hist_dev["train_loss"], hist_host["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(hist_dev["val_loss"], hist_host["val_loss"],
                                   rtol=1e-4)
        jax.block_until_ready(t_dev.params)

    def test_cache_dtype_modes(self, seg_data, tmp_path):
        """data.cache_dtype: "auto" quantizes to PCM16 only when the
        round-trip is bit-exact (falling back to fp32 on e.g. gain-scaled
        audio), "float32" forces fp32 even for PCM16 sources, and "int16"
        asserts losslessness instead of silently degrading."""
        import pytest as _pytest

        from audio_classification_icbhi_tpu.data.device_cache import (
            DeviceCachedLoader, _pcm16_quantize, dequantize,
        )

        config = tiny_config(tmp_path / "modes", epochs=1)
        train, _ = make_datasets(seg_data, config)

        forced = DeviceCachedLoader(train, 8, cache_dtype="float32")
        assert forced.cache.dtype == np.float32

        # _pcm16_quantize ground truth: exact for PCM16 grids (full-scale
        # endpoints included), None for anything off-grid or non-finite
        grid = np.array([[-32768, -1, 0, 1, 32767]], np.float32) / 32768.0
        q = _pcm16_quantize(grid)
        np.testing.assert_array_equal(
            np.asarray(dequantize(q)), grid)
        assert _pcm16_quantize(grid * 0.3) is None            # gain off grid
        assert _pcm16_quantize(grid + np.float32(2.0)) is None  # out of range
        bad = grid.copy(); bad[0, 0] = np.nan
        assert _pcm16_quantize(bad) is None

        class LossyLoader(DeviceCachedLoader):
            """Loader whose decode applies an off-grid gain (models
            resampled/normalized corpora that must not be quantized)."""

            def _load_batch(self, idxs):
                w, lbl = super()._load_batch(idxs)
                return w * np.float32(0.3), lbl

        lossy = LossyLoader(train, 8, cache_dtype="auto")
        assert lossy.cache.dtype == np.float32  # auto fell back, no error
        with _pytest.raises(ValueError, match="round-trip"):
            LossyLoader(train, 8, cache_dtype="int16")
        with _pytest.raises(ValueError, match="cache_dtype"):
            DeviceCachedLoader(train, 8, cache_dtype="pcm")

    def test_multi_step_dispatch_matches_per_step(self, seg_data, tmp_path):
        """The multi-step-per-dispatch path (train_many: whole epoch or K
        steps scanned in ONE jitted call against the HBM-resident cache)
        must train identically to the per-step dispatch path — same
        per-step PRNG keys (in-graph fold_in == host fold_in), same
        gathers, same optimizer math. Runs chunked (steps_per_dispatch=2)
        so non-zero step0 offsets are exercised too."""
        import jax

        def run(spd):
            config = tiny_config(tmp_path / f"spd{spd}", epochs=2)
            config["data"]["cache_on_device"] = True
            config["training"]["steps_per_dispatch"] = spd
            train, val = make_datasets(seg_data, config)
            t = Trainer(build_model(config, axis_name="data"), train, val, config)
            assert t._use_multi_dispatch() == (spd != 1)
            hist = t.train()
            return t, hist

        t_per_step, hist_per = run(1)
        t_whole, hist_whole = run(0)
        t_chunk, hist_chunk = run(2)
        # same keys, same gathers, same optimizer math; rtol covers XLA
        # fusing the dequant/augment chain differently inside the scanned
        # whole-epoch program than in the standalone step (~2e-5 observed)
        np.testing.assert_allclose(hist_whole["train_loss"], hist_per["train_loss"], rtol=1e-4)
        np.testing.assert_allclose(hist_chunk["train_loss"], hist_per["train_loss"], rtol=1e-4)
        np.testing.assert_allclose(hist_whole["val_loss"], hist_per["val_loss"], rtol=1e-4)
        # No param-tree comparison here: adam divides by sqrt(2nd moment),
        # so cross-program float rounding (the fused program fuses the
        # dequant/augment chain differently than the standalone step)
        # compounds chaotically per-element over two epochs of this noisy
        # 44-clip dataset (observed up to ~8e-3 on near-zero params). The
        # loss trajectories above pin path equivalence at 1e-4; the TIGHT
        # per-step equivalence (grads, stats, losses) is pinned by
        # tests/test_training.py::TestParallelAccum.

    def test_parallel_accum_trainer_matches_scan(self, seg_data, tmp_path):
        """training.accum_mode=parallel through the FULL Trainer (fused
        whole-epoch dispatch included: train_many's scan body runs the
        vmapped accumulator) must reproduce the default sequential-scan
        accumulation's training trajectory up to float summation order."""
        import jax

        def run(mode):
            config = tiny_config(tmp_path / f"accum_{mode}", epochs=2)
            config["data"]["cache_on_device"] = True
            config["training"]["gradient_accumulation_steps"] = 2
            config["training"]["accum_mode"] = mode
            train, val = make_datasets(seg_data, config)
            t = Trainer(build_model(config, axis_name="data"), train, val, config)
            hist = t.train()
            return t, hist

        t_scan, hist_scan = run("scan")
        t_par, hist_par = run("parallel")
        np.testing.assert_allclose(hist_par["train_loss"],
                                   hist_scan["train_loss"], rtol=1e-4)
        np.testing.assert_allclose(hist_par["val_loss"],
                                   hist_scan["val_loss"], rtol=1e-3, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(t_par.params),
                        jax.tree_util.tree_leaves(t_scan.params)):
            # sanity bound only: adam divides by sqrt(2nd moment), so
            # summation-order noise compounds per-element over two epochs
            # (observed ~5e-4 worst case); the TIGHT single-step
            # equivalence is pinned by test_training.py::TestParallelAccum
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=2e-3)

    def test_fused_validation_matches_per_batch(self, seg_data, tmp_path):
        """_validate_fused (the WHOLE val epoch — tail batch mask-padded
        inside the same program — scanned in ONE eval_many dispatch) must
        reproduce the per-batch validate exactly: same
        mean-of-per-batch-criterion loss, same accuracy, same
        (y_true, y_pred) — the val fixture (~10 clips, batch 8) exercises
        both the full-batch scan and the mask-padded tail."""
        config = tiny_config(tmp_path, epochs=1)
        config["data"]["cache_on_device"] = True
        train, val = make_datasets(seg_data, config)
        t = Trainer(build_model(config, axis_name="data"), train, val, config)
        t.collect_predictions = True
        t.train_epoch(0)  # real (non-init) params so logits are non-trivial

        many_calls = []
        orig_many = t.steps.eval_many

        def counting_many(*a, **k):
            many_calls.append(1)
            return orig_many(*a, **k)

        t.steps = t.steps._replace(eval_many=counting_many)
        assert t._use_fused_eval()
        loss_f, acc_f = t.validate(0)
        true_f, pred_f = t.val_predictions
        assert len(many_calls) == 1  # the whole epoch, tail included: ONE dispatch

        t.config["training"]["steps_per_dispatch"] = 1
        assert not t._use_fused_eval()
        loss_p, acc_p = t.validate(0)
        true_p, pred_p = t.val_predictions

        assert loss_f == pytest.approx(loss_p, rel=1e-5)
        assert acc_f == pytest.approx(acc_p)
        np.testing.assert_array_equal(true_f, true_p)
        np.testing.assert_array_equal(pred_f, pred_p)

    def test_chunked_fused_validation_matches_per_batch(self, seg_data, tmp_path):
        """steps_per_dispatch=K bounds the eval_many program size: a
        2-device mesh with batch 2 gives ~5 full val batches, so K=2 splits
        them into 3 eval_many dispatches (2+2+1) — results must equal the
        per-batch path exactly, like the single-dispatch case."""
        from audio_classification_icbhi_tpu.parallel.mesh import get_mesh

        config = tiny_config(tmp_path, epochs=1)
        config["data"]["cache_on_device"] = True
        config["training"]["batch_size"] = 2
        config["training"]["steps_per_dispatch"] = 2
        train, val = make_datasets(seg_data, config)
        t = Trainer(build_model(config, axis_name="data"), train, val, config,
                    mesh=get_mesh(num_devices=2))
        t.collect_predictions = True

        calls = []
        orig_many = t.steps.eval_many
        t.steps = t.steps._replace(
            eval_many=lambda *a, **k: (calls.append(1), orig_many(*a, **k))[1]
        )
        assert t._use_fused_eval()
        loss_f, acc_f = t.validate(0)
        true_f, pred_f = t.val_predictions
        nb = len(t.val_loader._batch_indices())  # tail rides eval_many too
        assert len(calls) == -(-nb // 2)  # ceil(batches/K) chunked dispatches

        t.config["training"]["steps_per_dispatch"] = 1
        loss_p, acc_p = t.validate(0)
        true_p, pred_p = t.val_predictions
        assert loss_f == pytest.approx(loss_p, rel=1e-5)
        assert acc_f == pytest.approx(acc_p)
        np.testing.assert_array_equal(true_f, true_p)
        np.testing.assert_array_equal(pred_f, pred_p)

    def test_rbg_rng_impl_trains(self, seg_data, tmp_path):
        """training.rng_impl='rbg' (XLA hardware RngBitGenerator bits,
        threefry-style splitting) must flow through the whole jitted train
        step — shard_map, per-microbatch scan, vmapped per-example
        augmentation keys, dropout — and train normally. The TPU win is
        measured separately; this pins cross-backend functionality."""
        config = tiny_config(tmp_path, epochs=1)
        config["training"]["rng_impl"] = "rbg"
        config["data"]["cache_on_device"] = True  # fused path too
        train, val = make_datasets(seg_data, config)
        t = Trainer(build_model(config, axis_name="data"), train, val, config)
        loss, acc = t.train_epoch(0)
        assert np.isfinite(loss) and 0.0 <= acc <= 100.0
        vloss, vacc = t.validate(0)
        assert np.isfinite(vloss)
        # determinism holds per key impl: same seed -> same first epoch
        t2 = Trainer(build_model(config, axis_name="data"), train, val, config)
        loss2, acc2 = t2.train_epoch(0)
        assert loss2 == pytest.approx(loss, rel=1e-5) and acc2 == acc

    def test_fp16_legacy_trainer_and_scale_state_resume(self, seg_data, tmp_path):
        """Two regressions: (1) LegacyTrainer's step rebuild dropped
        dynamic_loss_scale, so fp16 runs crashed with an arity mismatch at
        the first step; (2) GradScaler state was not checkpointed, so fp16
        resume restarted at scale 65536 and skipped steps while halving
        back down — violating restore()'s exact-resume contract."""
        config = tiny_config(tmp_path, epochs=1)
        config["training"]["precision"] = "fp16"
        train, val = make_datasets(seg_data, config)
        t = LegacyTrainer(build_model(config, axis_name="data"), train, val, config)
        assert t.dynamic_loss_scale
        loss, acc = t.train_epoch(0)  # (1): must not crash
        assert np.isfinite(loss)
        t.scale_state = (np.float32(512.0), np.int32(7))  # a settled scale
        t.save_checkpoint(tmp_path / "fp16.ckpt", 0, 1.0)
        t.wait_for_checkpoints()
        t2 = LegacyTrainer(build_model(config, axis_name="data"), train, val, config)
        t2.restore(tmp_path / "fp16.ckpt")
        assert float(t2.scale_state[0]) == 512.0
        assert int(t2.scale_state[1]) == 7

    def test_async_checkpoint_durable_across_midtrain_crash(self, seg_data, tmp_path):
        """A printed 'Best model saved' must mean a durable file even when a
        later epoch raises: train() drains the async writer in a finally,
        so the epoch-0 best checkpoint is complete and loadable after a
        crash in epoch 1 (tunnel RPC errors / Ctrl-C in real runs)."""
        config = tiny_config(tmp_path, epochs=3)
        train, val = make_datasets(seg_data, config)
        t = Trainer(build_model(config, axis_name="data"), train, val, config)
        assert t.async_checkpoint  # the default

        calls = []
        orig = t.validate

        def crashing_validate(epoch):
            if calls:
                raise RuntimeError("simulated mid-train failure")
            calls.append(epoch)
            return orig(epoch)

        t.validate = crashing_validate
        with pytest.raises(RuntimeError, match="simulated"):
            t.train()
        assert t._ckpt_writer is None  # worker retired by the finally
        ckpt = load_checkpoint(tmp_path / "ckpts" / "best_model.ckpt")
        assert ckpt["epoch"] == 0
        assert ckpt["config"]["model"]["architecture"] == "cnn"
        # resumable: a fresh trainer restores from the crash artifact
        t2 = Trainer(build_model(config, axis_name="data"), train, val, config)
        t2.restore(tmp_path / "ckpts" / "best_model.ckpt")
        assert t2.start_epoch == 1

    def test_unsynced_bn_model_rejected_on_multidevice_mesh(self, seg_data, tmp_path):
        """Regression (advisor r1, medium): a model built without
        axis_name on a multi-device mesh silently diverges its BatchNorm
        stats per device; the Trainer must refuse it up front."""
        config = tiny_config(tmp_path)
        train, val = make_datasets(seg_data, config)
        with pytest.raises(ValueError, match="axis_name"):
            Trainer(build_model(config), train, val, config)
