"""Worker for the cross-process data-parallel test (not a pytest module).

Launched twice by tests/test_distributed.py::test_two_process_train_step —
each launch is one jax.distributed process owning 4 virtual CPU devices of
a global 8-device 'data' mesh. The two processes run the SAME
make_step_fns train steps in SPMD lockstep on a batch sharded across the
process boundary: gradient psums cross it via gloo CPU collectives, the
role ICI/DCN collectives play on a pod slice (SURVEY.md §2.3 TPU-native
mapping; README multi-host recipe).

`build_case()` is imported by the test for the single-process reference
run, so both sides share model/data construction by definition.
"""

from __future__ import annotations

import sys


def build_case():
    """Deterministic (model, frontend, variables, wavs, labels, cw).

    BN-free and dropout-free so 8-vs-1-process equality is exact, like the
    in-process invariance test (test_training.py): cross-replica BN's
    stat-path backward is approximate and dropout keys fold in axis_index.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_classification_icbhi_tpu.ops.mel import MelFrontend

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            x = nn.Conv(8, (3, 3))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(4)(x).astype(jnp.float32)

    frontend = MelFrontend(sample_rate=4000, n_mels=32, n_fft=256,
                           hop_length=64, duration=0.8)
    model = TinyNet()
    dummy = jnp.zeros((2, 32, frontend.num_frames, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    rng = np.random.default_rng(7)
    B, L = 16, frontend.target_length
    wavs = rng.standard_normal((1, B, L)).astype(np.float32) * 0.1
    labels = rng.integers(0, 4, (1, B)).astype(np.int32)
    cw = np.array([0.5, 2.0, 1.0, 1.5], np.float32)
    return model, frontend, variables, wavs, labels, cw


def reference_steps(mesh, n_steps: int = 2):
    """Single-process run of the same steps on `mesh` (test-side)."""
    import jax
    import numpy as np

    from audio_classification_icbhi_tpu.parallel.data_parallel import make_step_fns
    from audio_classification_icbhi_tpu.training.optimizers import build_optimizer

    model, frontend, variables, wavs, labels, cw = build_case()
    tx = build_optimizer("sgd", 0.0)
    steps = make_step_fns(model, frontend, tx, mesh, accum_steps=1, augment=False)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opt = tx.init(params)
    loss = None
    for i in range(n_steps):
        params, bs, opt, m = steps.train_step(
            params, bs, opt, wavs, labels, cw, np.float32(1e-3),
            jax.random.PRNGKey(i),
        )
        loss = float(m["loss"])
    return params, loss


def main() -> None:
    port, pid, nproc, out = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

    import jax

    # Backend pinning BEFORE first device use (site config would otherwise
    # route to the axon TPU tunnel, see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from audio_classification_icbhi_tpu.parallel.mesh import (
        init_distributed,
        local_batch_slice,
    )

    idx = init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert idx == pid, (idx, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from audio_classification_icbhi_tpu.parallel.data_parallel import make_step_fns
    from audio_classification_icbhi_tpu.training.optimizers import build_optimizer

    # Global mesh spans both processes' devices.
    mesh = Mesh(np.array(jax.devices()), ("data",))
    model, frontend, variables, wavs, labels, cw = build_case()

    # Per-host input sharding: each process materializes ONLY its slice of
    # the global batch (the multi-host loading contract local_batch_slice
    # documents) and assembles the global array from process-local shards.
    B = wavs.shape[1]
    sl = local_batch_slice(B)
    assert (sl.stop - sl.start) * nproc == B
    assert sl.start == pid * (B // nproc)  # disjoint, ordered by process

    batch_sharding = NamedSharding(mesh, P(None, "data"))
    g_wavs = jax.make_array_from_process_local_data(batch_sharding, wavs[:, sl])
    g_labels = jax.make_array_from_process_local_data(batch_sharding, labels[:, sl])

    rep = NamedSharding(mesh, P())

    def replicate(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)), tree
        )

    tx = build_optimizer("sgd", 0.0)
    params = replicate(variables["params"])
    bs = replicate(variables.get("batch_stats", {}))
    opt = replicate(tx.init(variables["params"]))
    g_cw = jax.make_array_from_process_local_data(rep, cw)

    steps = make_step_fns(model, frontend, tx, mesh, accum_steps=1, augment=False)
    loss = None
    for i in range(2):
        key = jax.make_array_from_process_local_data(
            rep, np.asarray(jax.random.PRNGKey(i))
        )
        params, bs, opt, m = steps.train_step(
            params, bs, opt, g_wavs, g_labels, g_cw, np.float32(1e-3), key
        )
        loss = float(np.asarray(m["loss"]))  # replicated -> addressable

    if pid == 0:
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
        np.savez(out, loss=np.float32(loss),
                 **{f"leaf{i}": l for i, l in enumerate(leaves)})
    print(f"WORKER-OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
