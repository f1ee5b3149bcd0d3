"""CNN-stage roofline on the real chip (VERDICT r4 #2 step 1).

For the full CNN and for each ConvBlock prefix, measure wall time with
bench hygiene and pull XLA's own post-optimization cost analysis
(flops + bytes accessed). implied_GBps = bytes_accessed/clip * clips/s.
v5e HBM streaming bandwidth ~819 GB/s; >=60% => bandwidth-bound.
"""
import json
import sys
import time



import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from audio_classification_icbhi_tpu.models import LightweightCNN
from audio_classification_icbhi_tpu.models.cnn import ConvBlock

BATCHES = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["128", "1024"])]
H, W = 128, 157  # n_mels x frames (5 s / 16 kHz / 2048 / 512)
PEAK_GBPS = 819.0
PEAK_TFLOPS = 197.0


def measure(fn, inputs, batch):
    red = jax.jit(lambda w: fn(w).sum())
    for w in inputs:
        fn(w)
        float(np.asarray(red(w)))
    def window(reps):
        t0 = time.perf_counter()
        for i in range(reps - 1):
            fn(inputs[i % len(inputs)])
        out = red(inputs[(reps - 1) % len(inputs)])
        float(np.asarray(out))
        return time.perf_counter() - t0
    reps = 6
    while True:
        dt = window(reps)
        if dt > 1.0 or reps >= 192:
            break
        reps *= 2
    dt = min(dt, window(reps), window(reps))
    return batch * reps / dt


def cost(fn, example):
    c = fn.lower(example).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c


def main():
    model = LightweightCNN(num_classes=4, dtype=jnp.bfloat16)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        dummy = jnp.zeros((1, H, W, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy, train=False)

    rng = np.random.default_rng(0)

    for batch in BATCHES:
        inputs = [jnp.asarray(rng.standard_normal((batch, H, W, 1)).astype(np.float32))
                  for _ in range(2)]

        @jax.jit
        def full(x):
            return model.apply(variables, x, train=False)

        c = cost(full, inputs[0])
        cps = measure(full, inputs, batch)
        bpc = float(c.get("bytes accessed", 0.0)) / batch
        fpc = float(c.get("flops", 0.0)) / batch
        print(json.dumps({
            "stage": "cnn_full", "batch": batch,
            "clips_per_sec": round(cps, 1),
            "bytes_per_clip": round(bpc, 1),
            "flops_per_clip": round(fpc, 1),
            "implied_GBps": round(bpc * cps / 1e9, 1),
            "pct_hbm_peak": round(100 * bpc * cps / 1e9 / PEAK_GBPS, 1),
            "pct_mxu_peak": round(100 * fpc * cps / 1e12 / PEAK_TFLOPS, 2),
        }), flush=True)

        # per-block prefixes: block k in isolation (input = previous block's
        # output shape, random data — conv timing is data-independent)
        shapes = [(H, W, 1)]
        x = dummy
        feats = (32, 64, 128, 256, 256)
        params_blocks = []
        with jax.default_device(cpu):
            for i, f in enumerate(feats):
                blk = ConvBlock(f, dtype=jnp.bfloat16)
                v = blk.init(jax.random.PRNGKey(i), x, train=False)
                params_blocks.append((blk, v))
                x = blk.apply(v, x, train=False)
                shapes.append(tuple(x.shape[1:]))
        for i, (blk, v) in enumerate(params_blocks):
            shp = (batch,) + shapes[i]
            blk_in = [jnp.asarray(rng.standard_normal(shp).astype(np.float32))
                      for _ in range(2)]

            @jax.jit
            def one(xx, blk=blk, v=v):
                return blk.apply(v, xx, train=False)

            c = cost(one, blk_in[0])
            cps = measure(one, blk_in, batch)
            bpc = float(c.get("bytes accessed", 0.0)) / batch
            fpc = float(c.get("flops", 0.0)) / batch
            print(json.dumps({
                "stage": f"block{i+1}", "batch": batch,
                "in_shape": list(shapes[i]),
                "clips_per_sec": round(cps, 1),
                "us_per_clip": round(1e6 / cps, 3),
                "bytes_per_clip": round(bpc, 1),
                "implied_GBps": round(bpc * cps / 1e9, 1),
                "pct_hbm_peak": round(100 * bpc * cps / 1e9 / PEAK_GBPS, 1),
                "pct_mxu_peak": round(100 * fpc * cps / 1e12 / PEAK_TFLOPS, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
