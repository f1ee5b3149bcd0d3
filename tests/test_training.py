"""Training stack tests on the 8-device virtual CPU mesh.

Integration strategy from SURVEY.md §4: one train step decreases loss on
synthetic data, checkpoint round-trip, torch-parity unit checks for the
weighted CE / clipping / schedules, and ICBHI scoring on hand-computed
confusion matrices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from audio_classification_icbhi_tpu.parallel import (
    get_mesh,
    make_step_fns,
    weighted_cross_entropy,
)
from audio_classification_icbhi_tpu.parallel.data_parallel import clip_by_global_norm
from audio_classification_icbhi_tpu.training.schedules import (
    CosineAnnealingLR,
    ReduceLROnPlateau,
    StepLR,
)
from audio_classification_icbhi_tpu.utils.icbhi_metrics import (
    calculate_icbhi_score,
    calculate_detailed_confusion_metrics,
)
from audio_classification_icbhi_tpu.utils.metrics import calculate_metrics
from audio_classification_icbhi_tpu.utils.checkpoint import (
    load_checkpoint,
    latest_checkpoint,
    save_checkpoint,
)
from audio_classification_icbhi_tpu.utils.tensorboard import SummaryWriter, read_scalars


class TestLossParity:
    def test_weighted_ce_matches_torch(self, rng):
        logits = rng.standard_normal((16, 4)).astype(np.float32)
        labels = rng.integers(0, 4, 16)
        weights = np.array([0.5, 2.0, 1.0, 3.0], np.float32)
        num, den = weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights),
            jnp.ones(16, jnp.float32),
        )
        ours = float(num) / float(den)
        want = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(weights))(
            torch.from_numpy(logits), torch.from_numpy(labels)
        ).item()
        assert abs(ours - want) < 1e-5

    def test_clip_matches_torch(self, rng):
        grads = {"a": rng.standard_normal((8, 8)).astype(np.float32) * 5,
                 "b": rng.standard_normal((4,)).astype(np.float32)}
        jt = jax.tree_util.tree_map(jnp.asarray, grads)
        clipped, gnorm = clip_by_global_norm(jt, 1.0)
        tp = [torch.from_numpy(grads["a"].copy()), torch.from_numpy(grads["b"].copy())]
        for t in tp:
            t.grad = t.clone()
        params = [torch.nn.Parameter(t) for t in tp]
        for p, t in zip(params, tp):
            p.grad = t.clone()
        tnorm = torch.nn.utils.clip_grad_norm_(params, 1.0)
        assert abs(float(gnorm) - tnorm.item()) < 1e-4
        np.testing.assert_allclose(np.asarray(clipped["a"]), params[0].grad.numpy(), atol=1e-5)


class TestSchedules:
    def test_cosine_matches_torch(self):
        lr0, epochs = 0.003, 10
        sched = CosineAnnealingLR(lr0, t_max=epochs)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr0)
        tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
        for _ in range(epochs):
            assert abs(sched.lr - opt.param_groups[0]["lr"]) < 1e-9
            sched.step()
            tsched.step()

    def test_step_lr(self):
        s = StepLR(1.0, step_size=2, gamma=0.1)
        lrs = []
        for _ in range(5):
            lrs.append(s.lr)
            s.step()
        np.testing.assert_allclose(lrs, [1.0, 1.0, 0.1, 0.1, 0.01])

    def test_plateau_min_mode(self):
        s = ReduceLROnPlateau(1.0, mode="min", factor=0.5, patience=2)
        for m in [1.0, 0.9, 0.95, 0.95, 0.95]:  # 3 bad epochs after best=0.9
            s.step(m)
        assert s.lr == 0.5

    def test_plateau_max_mode(self):
        s = ReduceLROnPlateau(1.0, mode="max", factor=0.5, patience=1)
        for m in [0.5, 0.6, 0.55, 0.55]:
            s.step(m)
        assert s.lr == 0.5

    def test_plateau_rel_threshold_matches_torch_default(self):
        """torch's default threshold=1e-4 (rel): a sub-0.01% relative
        improvement is still a bad epoch, so near-flat metrics cut the LR
        after `patience` epochs (regression: any strict improvement used to
        reset bad_epochs forever)."""
        s = ReduceLROnPlateau(1.0, mode="min", factor=0.5, patience=2)
        s.step(0.5)
        for _ in range(3):
            s.step(0.4999999)  # improves, but by < 1e-4 relative
        assert s.lr == 0.5
        # a genuine improvement resets the counter
        s2 = ReduceLROnPlateau(1.0, mode="min", factor=0.5, patience=2)
        s2.step(0.5)
        s2.step(0.49)
        for m in [0.49, 0.49]:
            s2.step(m)
        assert s2.lr == 1.0

    def test_linear_warmup_wraps_cosine(self):
        from audio_classification_icbhi_tpu.training.schedules import build_scheduler

        s = build_scheduler("cosine", 1.0, 100, warmup_epochs=4)
        lrs = []
        for _ in range(6):
            lrs.append(s.lr)
            s.step()
        cos = CosineAnnealingLR(1.0, t_max=100)
        expect = []
        for e in range(6):
            expect.append(cos.lr * min(1.0, (e + 1) / 4))
            cos.step()
        np.testing.assert_allclose(lrs, expect)
        # state roundtrips through a fresh instance (exact resume)
        state = s.state_dict()
        s2 = build_scheduler("cosine", 1.0, 100, warmup_epochs=4)
        s2.load_state_dict(state)
        assert s2.lr == s.lr

    def test_warmup_zero_is_identity(self):
        from audio_classification_icbhi_tpu.training.schedules import build_scheduler

        s = build_scheduler("cosine", 0.003, 10, warmup_epochs=0)
        assert isinstance(s, CosineAnnealingLR)

    def test_warmup_toggle_between_save_and_resume(self):
        """A checkpoint saved without warmup restores into a warmup
        scheduler (and vice versa) instead of raising KeyError (advisor r2)."""
        from audio_classification_icbhi_tpu.training.schedules import (
            build_scheduler,
            restore_scheduler,
        )

        # saved WITHOUT warmup -> resumed WITH warmup
        plain = build_scheduler("cosine", 1.0, 100, warmup_epochs=0)
        for _ in range(7):
            plain.step()
        warm = build_scheduler("cosine", 1.0, 100, warmup_epochs=4)
        restore_scheduler(warm, plain.state_dict())
        assert warm.base._epoch == 7
        assert warm.lr == plain.lr  # epoch 7 is past warmup -> scale 1

        # saved WITH warmup -> resumed WITHOUT
        warm2 = build_scheduler("cosine", 1.0, 100, warmup_epochs=4)
        for _ in range(7):
            warm2.step()
        plain2 = build_scheduler("cosine", 1.0, 100, warmup_epochs=0)
        restore_scheduler(plain2, warm2.state_dict())
        assert plain2._epoch == 7


class TestICBHIScore:
    def test_hand_computed_confusion(self):
        # 4 samples per class, diag-heavy: class 0 perfect; class 1 2/4 etc.
        y_true = np.repeat([0, 1, 2, 3], 4)
        y_pred = np.array([0, 0, 0, 0,
                           1, 1, 0, 0,
                           2, 2, 2, 0,
                           3, 3, 3, 3])
        m = calculate_icbhi_score(y_true, y_pred)
        sens = [1.0, 0.5, 0.75, 1.0]
        np.testing.assert_allclose(m["sensitivities"], sens)
        # specificity of class 0: TN = 12 - 5 false positives... compute directly
        spec0 = np.mean((y_pred[y_true != 0] != 0))
        assert abs(m["specificities"][0] - spec0) < 1e-9
        a_s, a_p = np.mean(sens), np.mean(m["specificities"])
        assert abs(m["icbhi_score"] - 2 * a_s * a_p / (a_s + a_p)) < 1e-9
        assert abs(m["accuracy"] - 13 / 16) < 1e-9

    def test_perfect_and_degenerate(self):
        y = np.array([0, 1, 2, 3])
        perfect = calculate_icbhi_score(y, y)
        assert perfect["icbhi_score"] == 1.0
        wrong = calculate_icbhi_score(y, (y + 1) % 4)
        assert wrong["avg_sensitivity"] == 0.0
        assert wrong["icbhi_score"] == 0.0  # guard against 0/0

    def test_detailed_confusion(self):
        y_true = [0, 0, 1, 1]
        y_pred = [0, 1, 1, 1]
        d = calculate_detailed_confusion_metrics(y_true, y_pred)
        assert d["per_class"]["normal"] == {
            "TP": 1, "FP": 0, "FN": 1, "TN": 2, "precision": 1.0, "recall": 0.5,
        }
        assert d["confusion_matrix"].sum() == 4

    def test_generic_metrics_vs_sklearn_shapes(self):
        y_true = np.array([0, 1, 2, 3, 0, 1])
        y_pred = np.array([0, 1, 2, 2, 0, 0])
        y_prob = np.random.default_rng(0).dirichlet(np.ones(4), 6)
        m = calculate_metrics(y_true, y_pred, y_prob)
        assert m["accuracy"] == 4 / 6
        assert len(m["precision_per_class"]) == 4
        assert "roc_auc_macro" in m


class TestCheckpoint:
    def test_roundtrip_contract(self, tmp_path):
        ckpt = {
            "epoch": 3,
            "params": {"dense": {"kernel": np.ones((4, 2), np.float32)}},
            "batch_stats": {"bn": {"mean": np.zeros(4, np.float32)}},
            "opt_state": {"count": np.int32(7)},
            "val_loss": 0.5,
            "config": {"model": {"architecture": "cnn"}, "classes": ["a", "b"]},
            "class_weights": np.array([1.0, 2.0], np.float32),
        }
        p = save_checkpoint(tmp_path / "best_model.ckpt", ckpt)
        back = load_checkpoint(p)
        assert back["epoch"] == 3
        assert back["config"]["model"]["architecture"] == "cnn"  # embedded config
        np.testing.assert_array_equal(back["class_weights"], ckpt["class_weights"])
        np.testing.assert_array_equal(
            back["params"]["dense"]["kernel"], ckpt["params"]["dense"]["kernel"]
        )

    def test_latest_checkpoint(self, tmp_path):
        assert latest_checkpoint(tmp_path) is None
        for e in (5, 10, 2):
            save_checkpoint(tmp_path / f"checkpoint_epoch_{e}.ckpt", {"epoch": e})
        assert latest_checkpoint(tmp_path).name == "checkpoint_epoch_10.ckpt"

    def test_orbax_roundtrip_contract(self, tmp_path):
        """format='orbax' writes a directory with the same logical payload;
        load_checkpoint sniffs the format (dir vs file) transparently.
        Includes an optax-like tuple state: to_state_dict flattens it to the
        same nested-dict shape the msgpack path produces."""
        ckpt = {
            "epoch": 3,
            "params": {"dense": {"kernel": np.ones((4, 2), np.float32)}},
            "batch_stats": {"bn": {"mean": np.zeros(4, np.float32)}},
            "opt_state": ({"count": np.int32(7)}, {"mu": np.ones(2, np.float32)}),
            "val_loss": 0.5,
            "config": {"model": {"architecture": "cnn"}, "classes": ["a", "b"]},
            "class_weights": np.array([1.0, 2.0], np.float32),
            "scheduler": {"last_lr": 0.001, "bad_epochs": 2},
            "best_metric": 0.9,
            "patience_counter": 1,
        }
        p = save_checkpoint(tmp_path / "best_model.ckpt", ckpt, format="orbax")
        assert p.is_dir()
        back = load_checkpoint(p)
        assert back["epoch"] == 3
        assert back["config"]["model"]["architecture"] == "cnn"
        assert back["scheduler"]["bad_epochs"] == 2
        assert back["best_metric"] == 0.9
        np.testing.assert_array_equal(back["class_weights"], ckpt["class_weights"])
        np.testing.assert_array_equal(
            back["params"]["dense"]["kernel"], ckpt["params"]["dense"]["kernel"]
        )
        # tuple state flattened identically to the msgpack path
        msg = load_checkpoint(save_checkpoint(tmp_path / "m.ckpt", ckpt))
        assert set(back["opt_state"].keys()) == set(msg["opt_state"].keys())

    def test_unknown_format_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            save_checkpoint(tmp_path / "x.ckpt", {"epoch": 0}, format="pickle")

    def test_async_writer_survives_donation(self, tmp_path):
        """AsyncCheckpointWriter.save snapshots with an on-device copy, so
        the written file carries save-time values even when the live
        buffers are donated (invalidated) by the very next dispatch —
        exactly what the fused train loop does to params/opt_state."""
        import jax
        import jax.numpy as jnp

        from audio_classification_icbhi_tpu.utils.checkpoint import (
            AsyncCheckpointWriter,
        )

        params = jnp.arange(8, dtype=jnp.float32)
        expect = np.asarray(params).copy()
        w = AsyncCheckpointWriter()
        try:
            w.save(tmp_path / "async.ckpt", {"epoch": 1, "params": {"x": params}})
            # donate the live buffer: after this, `params` is deleted and
            # any fetch of it would raise — the snapshot must not care
            bumped = jax.jit(lambda p: p + 1.0, donate_argnums=0)(params)
            bumped.block_until_ready()
            w.wait()
        finally:
            w.close()
        back = load_checkpoint(tmp_path / "async.ckpt")
        np.testing.assert_array_equal(back["params"]["x"], expect)

    def test_async_writer_packed_snapshot_bit_exact(self, tmp_path):
        """The single-buffer byte-packed snapshot (one device->host RPC per
        checkpoint instead of one per leaf) must round-trip every dtype the
        state tree can carry bit-exactly: fp32/bf16 (NaN payloads included
        via bitcast), int32/int64 counts, bools, 0-d scalars, odd shapes."""
        import jax.numpy as jnp

        from audio_classification_icbhi_tpu.utils.checkpoint import (
            AsyncCheckpointWriter,
        )

        rng = np.random.default_rng(0)
        f32 = rng.standard_normal((7, 5)).astype(np.float32)
        f32[0, 0] = np.nan  # bitcast must preserve the exact NaN bits
        tree = {
            "f32": jnp.asarray(f32),
            "bf16": jnp.asarray(rng.standard_normal(33), jnp.bfloat16),
            "i32": jnp.asarray(rng.integers(-(2**30), 2**30, 11), jnp.int32),
            "count": jnp.asarray(7, jnp.int32),  # 0-d scalar leaf
            "flag": jnp.asarray([True, False, True]),
            "host_np": np.arange(4.0),  # host leaf: bypasses the pack
            "epoch": 3,
        }
        expect = {k: np.asarray(v) for k, v in tree.items() if k != "epoch"}
        w = AsyncCheckpointWriter()
        try:
            w.save(tmp_path / "packed.ckpt", tree)
            w.wait()
        finally:
            w.close()
        back = load_checkpoint(tmp_path / "packed.ckpt")
        assert back["epoch"] == 3
        for k, v in expect.items():
            got = np.asarray(back[k]).astype(v.dtype)  # msgpack keeps dtype
            np.testing.assert_array_equal(
                np.atleast_1d(got).view(np.uint8),
                np.atleast_1d(v).view(np.uint8), err_msg=k)

    def test_async_writer_raises_worker_errors(self, tmp_path):
        from audio_classification_icbhi_tpu.utils.checkpoint import (
            AsyncCheckpointWriter,
        )

        blocker = tmp_path / "not_a_dir"
        blocker.write_text("file, not dir")
        w = AsyncCheckpointWriter()
        w.save(blocker / "sub" / "x.ckpt", {"epoch": 0})  # mkdir will fail
        with pytest.raises(RuntimeError, match="async checkpoint"):
            w.wait()
        w.close()
        with pytest.raises(RuntimeError, match="closed"):
            w.save(tmp_path / "y.ckpt", {"epoch": 0})  # no worker would drain it


class TestConfigIsolation:
    def test_load_config_never_aliases_defaults(self, tmp_path):
        """Callers mutate configs in place (train.py writes
        config['model']['architecture']); un-overridden sections must be
        deep copies, or the module-global DEFAULT_CONFIG is silently
        corrupted for every later load_config() in the process."""
        from audio_classification_icbhi_tpu.utils.config import load_config

        p = tmp_path / "partial.yaml"
        p.write_text("data:\n  sample_rate: 8000\n")  # no model/classes keys
        cfg = load_config(str(p))
        cfg["model"]["architecture"] = "mutated"
        cfg["classes"].append("extra")
        cfg["training"]["batch_size"] = -1
        fresh = load_config(str(p))
        assert fresh["model"]["architecture"] != "mutated"
        assert "extra" not in fresh["classes"]
        assert fresh["training"]["batch_size"] != -1
        blank = load_config(None)
        blank["classes"].append("extra2")
        assert "extra2" not in load_config(None)["classes"]


class TestTensorBoard:
    def test_long_tags_and_negative_steps_roundtrip(self, tmp_path):
        """Writer emits multi-byte varints for lengths >= 128 and 10-byte
        two's-complement varints for negative steps; the reader must decode
        both (regressions: single-byte length reads mis-parsed ~121+-char
        tags; a negative step hung _varint forever)."""
        long_tag = "Loss/" + "x" * 150
        with SummaryWriter(tmp_path) as w:
            w.add_scalar(long_tag, 0.25, 3)
            w.add_scalar("Accuracy/val", 50.0, -1)
        (f,) = tmp_path.glob("events.out.tfevents.*")
        back = read_scalars(f)
        assert back[long_tag] == [(3, 0.25)]
        assert back["Accuracy/val"] == [(-1, 50.0)]

    def test_write_and_read_scalars(self, tmp_path):
        with SummaryWriter(tmp_path) as w:
            for step in range(3):
                w.add_scalar("Loss/train", 1.0 / (step + 1), step)
                w.add_scalar("Accuracy/val", 50.0 + step, step)
        files = list(tmp_path.glob("events.out.tfevents.*"))
        assert len(files) == 1
        scalars = read_scalars(files[0])
        assert [s for s, _ in scalars["Loss/train"]] == [0, 1, 2]
        np.testing.assert_allclose(
            [v for _, v in scalars["Accuracy/val"]], [50.0, 51.0, 52.0]
        )

    def test_readable_by_tensorboard_library(self, tmp_path):
        """Cross-check the wire format against the real tensorboard parser."""
        from tensorboard.backend.event_processing import event_accumulator

        with SummaryWriter(tmp_path) as w:
            w.add_scalar("Loss/train", 0.25, 7)
        ea = event_accumulator.EventAccumulator(str(tmp_path))
        ea.Reload()
        assert "Loss/train" in ea.Tags()["scalars"]
        ev = ea.Scalars("Loss/train")[0]
        assert ev.step == 7 and abs(ev.value - 0.25) < 1e-6


@pytest.fixture(scope="module")
def mesh8():
    return get_mesh()


@pytest.fixture(scope="module")
def tiny_setup(mesh8):
    """Tiny model + frontend + steps on the 8-device mesh."""
    from audio_classification_icbhi_tpu.models import LightweightCNN
    from audio_classification_icbhi_tpu.ops.mel import MelFrontend
    from audio_classification_icbhi_tpu.training.optimizers import build_optimizer

    frontend = MelFrontend(
        sample_rate=4000, n_mels=32, n_fft=256, hop_length=64, duration=0.8
    )
    model = LightweightCNN(num_classes=4, axis_name="data")
    tx = build_optimizer("adam", weight_decay=1e-4)
    steps = make_step_fns(
        model, frontend, tx, mesh8, accum_steps=2, augment=True
    )
    dummy = jnp.zeros((2, 32, frontend.num_frames, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    return model, frontend, tx, steps, variables


class TestShardedTrainStep:
    @staticmethod
    def _copy(tree):
        # train_step donates its state args (buffer reuse on TPU); tests keep
        # the fixture intact by passing fresh copies.
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)

    def test_loss_decreases_on_learnable_batch(self, tiny_setup, rng):
        model, frontend, tx, steps, variables = tiny_setup
        params = self._copy(variables["params"])
        batch_stats = self._copy(variables.get("batch_stats", {}))
        opt_state = tx.init(params)
        B, L = 16, frontend.target_length
        # one strongly separable batch: class = dominant tone
        labels = np.tile(np.arange(4), B // 4).astype(np.int32)
        t = np.arange(L) / 4000.0
        wavs = np.stack(
            [np.sin(2 * np.pi * (200 + 400 * c) * t) for c in labels]
        ).astype(np.float32)
        wavs += 0.01 * rng.standard_normal(wavs.shape).astype(np.float32)
        awavs = np.stack([wavs, wavs])  # accum=2 microbatches
        albls = np.stack([labels, labels])
        cw = np.ones(4, np.float32)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            params, batch_stats, opt_state, m = steps.train_step(
                params, batch_stats, opt_state, awavs, albls, cw,
                np.float32(3e-3), jax.random.fold_in(key, i),
            )
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.8, losses
        assert np.isfinite(losses).all()
        assert float(m["count"]) == 32  # accum * batch

    def test_eval_step_mask_and_agreement(self, tiny_setup, rng):
        model, frontend, tx, steps, variables = tiny_setup
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        B, L = 16, frontend.target_length
        wavs = rng.standard_normal((B, L)).astype(np.float32)
        labels = rng.integers(0, 4, B).astype(np.int32)
        mask = np.ones(B, np.float32)
        cw = np.ones(4, np.float32)
        logits, num, den, correct = steps.eval_step(
            params, batch_stats, wavs, labels, mask, cw
        )
        assert logits.shape == (B, 4)
        # masking the second half must not change the first half's logits,
        # and the loss sums must shrink accordingly
        mask2 = mask.copy()
        mask2[8:] = 0
        logits2, num2, den2, corr2 = steps.eval_step(
            params, batch_stats, wavs, labels, mask2, cw
        )
        np.testing.assert_allclose(
            np.asarray(logits)[:8], np.asarray(logits2)[:8], rtol=2e-4, atol=2e-4
        )
        assert float(den2) < float(den)
        # loss ratio equals the reference criterion over just the valid rows
        lp = jax.nn.log_softmax(jnp.asarray(np.asarray(logits)[:8]))
        want = float(-jnp.mean(jnp.take_along_axis(lp, jnp.asarray(labels[:8])[:, None], 1)))
        assert abs(float(num2) / float(den2) - want) < 5e-3

    def test_fp16_dynamic_loss_scale(self, tiny_setup, rng):
        """GradScaler parity (reference trainer_fixed.py:95,:161-174):
        finite steps apply + bump good-step counter; overflow steps are
        skipped and halve the scale."""
        from audio_classification_icbhi_tpu.training.optimizers import build_optimizer

        model, frontend, tx, _, variables = tiny_setup
        steps = make_step_fns(
            model, frontend, build_optimizer("adam"), get_mesh(),
            accum_steps=1, augment=False, dynamic_loss_scale=True,
        )
        params = self._copy(variables["params"])
        bs = self._copy(variables.get("batch_stats", {}))
        opt = build_optimizer("adam").init(params)
        B, L = 16, frontend.target_length
        wavs = rng.standard_normal((1, B, L)).astype(np.float32)
        labels = rng.integers(0, 4, (1, B)).astype(np.int32)
        cw = np.ones(4, np.float32)
        scale_state = (np.float32(65536.0), np.int32(0))

        p1, bs, opt, m, scale_state = steps.train_step(
            params, bs, opt, wavs, labels, cw, np.float32(1e-3),
            jax.random.PRNGKey(0), scale_state,
        )
        assert float(m["step_skipped"]) == 0.0
        assert float(scale_state[0]) == 65536.0
        assert int(scale_state[1]) == 1

        # Overflow injection: NaN wave -> non-finite grads -> skip + halve
        before = np.asarray(jax.tree_util.tree_leaves(p1)[0])  # p1 gets donated
        bad = wavs.copy()
        bad[0, 0, 0] = np.nan
        p2, bs, opt, m2, scale_state = steps.train_step(
            p1, bs, opt, bad, labels, cw, np.float32(1e-3),
            jax.random.PRNGKey(1), scale_state,
        )
        assert float(m2["step_skipped"]) == 1.0
        assert float(scale_state[0]) == 32768.0
        assert int(scale_state[1]) == 0
        # params unchanged on the skipped step
        after = np.asarray(jax.tree_util.tree_leaves(p2)[0])
        np.testing.assert_array_equal(before, after)

    def test_sharded_step_equals_single_device(self, tiny_setup, rng):
        """Data-parallel invariance: the 8-device sharded step must produce
        the same updated parameters and loss as a 1-device run on the same
        global batch (psum-inside-loss makes grads globally exact; BN stats
        pmean to the global statistics). Uses a dropout-free module —
        dropout masks intentionally differ per device (keys fold in
        axis_index), so a model with dropout cannot be layout-invariant."""
        import flax.linen as nn
        from audio_classification_icbhi_tpu.training.optimizers import build_optimizer

        class TinyNet(nn.Module):
            """BN-free: cross-replica BatchNorm's stat-path backward is an
            approximation (flax pmean AD carries only each device's own
            cotangent), so exact 8-vs-1 equality holds for the DP machinery
            itself, which this model isolates."""

            @nn.compact
            def __call__(self, x, *, train: bool = False):
                x = nn.Conv(8, (3, 3))(x)
                x = nn.relu(x)
                x = jnp.mean(x, axis=(1, 2))
                return nn.Dense(4)(x).astype(jnp.float32)

        _, frontend, _, _, _ = tiny_setup
        model = TinyNet()
        dummy = jnp.zeros((2, 32, frontend.num_frames, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
        B, L = 16, frontend.target_length
        wavs = rng.standard_normal((1, B, L)).astype(np.float32)
        labels = rng.integers(0, 4, (1, B)).astype(np.int32)
        cw = np.array([0.5, 2.0, 1.0, 1.5], np.float32)

        def run(n_dev):
            p = self._copy(variables["params"])
            bs = self._copy(variables.get("batch_stats", {}))
            # SGD: adam's sign(g)-scaled first step would amplify f32
            # reduction-order noise on near-zero grads into full +-lr deltas
            opt = build_optimizer("sgd", 0.0).init(p)
            steps = make_step_fns(
                model, frontend, build_optimizer("sgd", 0.0),
                get_mesh(num_devices=n_dev), accum_steps=1, augment=False,
            )
            p, bs, opt, m = steps.train_step(
                p, bs, opt, wavs, labels, cw, np.float32(1e-3), jax.random.PRNGKey(0)
            )
            return p, float(m["loss"]), float(m["correct"])

        p8, loss8, corr8 = run(8)
        p1, loss1, corr1 = run(1)
        assert abs(loss8 - loss1) < 1e-5
        assert corr8 == corr1
        for a, b in zip(jax.tree_util.tree_leaves(p8), jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)

    def test_batch_stats_synced_across_shards(self, tiny_setup, rng):
        """Cross-replica BN: stats after a step must be identical no matter
        how samples are distributed over devices."""
        model, frontend, tx, steps, variables = tiny_setup
        B, L = 16, frontend.target_length
        wavs = rng.standard_normal((1, B, L)).astype(np.float32)
        labels = rng.integers(0, 4, (1, B)).astype(np.int32)
        cw = np.ones(4, np.float32)

        def run(perm):
            p = self._copy(variables["params"])
            bs = self._copy(variables.get("batch_stats", {}))
            opt = tx.init(p)
            steps1 = make_step_fns(
                model, frontend, tx, get_mesh(), accum_steps=1, augment=False
            )
            _, bs, _, _ = steps1.train_step(
                p, bs, opt, wavs[:, perm], labels[:, perm], cw,
                np.float32(1e-3), jax.random.PRNGKey(0),
            )
            return jax.tree_util.tree_leaves(bs)[0]

        a = run(np.arange(B))
        b = run(np.roll(np.arange(B), 5))  # different device placement
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


class TestParallelAccum:
    """training.accum_mode="parallel": the A microbatches of one optimizer
    step evaluate concurrently (flattened front end + vmapped model) and
    must reproduce the sequential scan path — exactly for the front end,
    up to float summation order for gradients and BN running stats."""

    @staticmethod
    def _copy(tree):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)

    def test_grouped_features_match_per_microbatch(self, tiny_setup, rng):
        from audio_classification_icbhi_tpu.parallel.data_parallel import (
            features_from_wavs, features_from_wavs_grouped,
        )

        _, frontend, *_ = tiny_setup
        a, b, L = 3, 8, frontend.target_length
        wavs = jnp.asarray(rng.standard_normal((a, b, L)).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(7), a)
        for augment in (False, True):
            grouped = features_from_wavs_grouped(frontend, wavs, keys,
                                                 augment=augment)
            per_mb = jnp.stack([
                features_from_wavs(frontend, wavs[i], augment=augment,
                                   key=keys[i])
                for i in range(a)
            ])
            # per-example ops + identical key streams -> bitwise equal
            np.testing.assert_array_equal(
                np.asarray(grouped), np.asarray(per_mb),
                err_msg=f"augment={augment}")

    def test_parallel_mode_matches_scan(self, mesh8, rng):
        from audio_classification_icbhi_tpu.models import LightweightCNN
        from audio_classification_icbhi_tpu.ops.mel import MelFrontend
        from audio_classification_icbhi_tpu.training.optimizers import build_optimizer

        frontend = MelFrontend(
            sample_rate=4000, n_mels=32, n_fft=256, hop_length=64, duration=0.8
        )
        model = LightweightCNN(num_classes=4, axis_name="data")
        tx = build_optimizer("adam", weight_decay=1e-4)
        kw = dict(accum_steps=2, augment=True)
        scan_steps = make_step_fns(model, frontend, tx, mesh8,
                                   accum_mode="scan", **kw)
        par_steps = make_step_fns(model, frontend, tx, mesh8,
                                  accum_mode="parallel", **kw)
        dummy = jnp.zeros((2, 32, frontend.num_frames, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy, train=False)

        B, L = 16, frontend.target_length
        wavs = rng.standard_normal((4, 2, B, L)).astype(np.float32) * 0.3
        labels = rng.integers(0, 4, (4, 2, B)).astype(np.int32)
        cw = np.asarray([1.0, 2.0, 0.5, 1.5], np.float32)
        key = jax.random.PRNGKey(3)

        def run(steps):
            p = self._copy(variables["params"])
            bs = self._copy(variables.get("batch_stats", {}))
            opt = tx.init(p)
            losses, corrects = [], []
            for i in range(4):
                p, bs, opt, m = steps.train_step(
                    p, bs, opt, wavs[i], labels[i], cw, np.float32(3e-3),
                    jax.random.fold_in(key, i),
                )
                losses.append(float(m["loss"]))
                corrects.append(float(m["correct"]))
            return p, bs, losses, corrects

        p_s, bs_s, loss_s, corr_s = run(scan_steps)
        p_p, bs_p, loss_p, corr_p = run(par_steps)
        # identical per-example compute; only grad/stat summation order
        # differs, so four adam steps stay within tight float tolerance
        np.testing.assert_allclose(loss_p, loss_s, rtol=1e-5)
        assert corr_p == corr_s  # integer counts: exact
        for a_, b_ in zip(jax.tree_util.tree_leaves(p_p),
                          jax.tree_util.tree_leaves(p_s)):
            # adam divides by sqrt(second moment), amplifying the fp
            # summation-order noise on tiny-gradient params; the raw
            # mismatch is <2e-5 absolute over four optimizer steps
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=2e-3, atol=2e-5)
        for a_, b_ in zip(jax.tree_util.tree_leaves(bs_p),
                          jax.tree_util.tree_leaves(bs_s)):
            # closed-form EMA chain vs sequential EMA: same value, few-ulp
            # rounding differences
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("momentum", [0.5, 0.9, 0.99])
    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_ema_chain_recovery_closed_form(self, momentum, depth, rng):
        """recover_ema_chain (the parallel accumulator's BN running-stats
        fold, VERDICT r3 #6) vs the LITERAL sequential EMA chain the scan
        path computes, at multiple momenta and accum depths — pure math,
        f64, no model in the loop."""
        from audio_classification_icbhi_tpu.parallel.data_parallel import (
            recover_ema_chain,
        )

        base = jnp.asarray(rng.standard_normal(16))  # f64 under x64? CPU f32
        bs_all = rng.standard_normal((depth, 16))
        # one-step results from the shared base, as vmap produces them
        r_all = jnp.asarray(momentum * np.asarray(base) + (1 - momentum) * bs_all)

        got = np.asarray(recover_ema_chain(base, r_all, momentum=momentum))

        want = np.asarray(base, np.float64)
        for i in range(depth):
            want = momentum * want + (1 - momentum) * bs_all[i]
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_invalid_accum_mode_rejected(self, tiny_setup):
        from audio_classification_icbhi_tpu.training.optimizers import build_optimizer

        model, frontend, *_ = tiny_setup
        with pytest.raises(ValueError, match="accum_mode"):
            make_step_fns(model, frontend, build_optimizer("adam"), get_mesh(),
                          accum_steps=2, augment=False, accum_mode="vmap")
