#!/usr/bin/env python
"""Training-step throughput benchmark: WeightCE fine-tune step (forward +
backward + AdamW) on one chip.

Prints one JSON line:
  {"metric": "train_audio_sec_per_sec", "value": ...,
   "unit": "audio_s/s", ...}

i.e. how many seconds of (30 s-padded) training audio one chip consumes per
wall second at the reference recipe's effective batch (8 x 4 accumulation,
scripts/train.py:227-229).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whisper_context_biasing_tpu.utils import setup_jax
setup_jax()

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "base.en")
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
ACCUM = int(os.environ.get("BENCH_ACCUM", "4"))
SEQ = int(os.environ.get("BENCH_SEQ", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def main():
    import jax
    import jax.numpy as jnp

    from whisper_context_biasing_tpu.models import get_config, init_params
    from whisper_context_biasing_tpu.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    cfg = get_config(
        MODEL, dtype="bfloat16",
        flash_attention=os.environ.get("BENCH_FLASH", "1") == "1",
        flash_block_q=int(os.environ.get("BENCH_FLASH_BLOCK", "256")),
        flash_decoder=os.environ.get("BENCH_FLASH_DEC", "1") == "1",
        # "full" measured FASTEST on v5e (docs/PERF.md round 4): with the
        # fused flash backward the step is no longer compute-dominated, and
        # recomputing the blocks costs less than writing+reading the saved
        # activations (4560 vs none 4092 vs dots 4373 audio_s/s)
        remat=os.environ.get("BENCH_REMAT", "full"),
        # tanh gelu: fwd error below bf16 rounding; the gradient difference
        # is the same order, well under bf16 training noise
        gelu_approx=os.environ.get("BENCH_GELU_APPROX", "1") == "1",
        # fused LN+QKV / LN+bias+gelu Pallas kernels (ops/fused_block.py) —
        # the round-5 attack on the VPU/HBM fusion tail. FALSIFIED for the
        # training path: the kernel's forward wins ~6%/op but its backward
        # loses 9-12% end-to-end (extra pre-activation matmul + custom_vjp
        # fusion boundary; measured A/B + per-op microbench in docs/PERF.md
        # round 5). Default OFF; BENCH_FUSED_LN=1 re-enables for A/B.
        fused_ln_qkv=os.environ.get("BENCH_FUSED_LN", "0") == "1",
        fused_ln_mlp=os.environ.get("BENCH_FUSED_LN", "0") == "1",
    )
    params = init_params(cfg, 0)
    rng = np.random.default_rng(0)

    def mk(a):
        return jnp.asarray(np.stack([a] * ACCUM)) if ACCUM > 1 else jnp.asarray(a)

    mel = (rng.standard_normal((BATCH, cfg.n_mels, 3000)) * 0.4).astype(np.float32)
    dec = rng.integers(0, 5000, (BATCH, SEQ)).astype(np.int32)
    dec[:, 0] = cfg.decoder_start_token_id
    labels = np.concatenate(
        [dec[:, 1:], np.full((BATCH, 1), cfg.pad_token_id, np.int32)], axis=1
    )
    spans = np.full((BATCH, 8, 6), 50256, np.int32)
    spans[:, 0, :2] = labels[:, 3:5]
    batch = {
        "input_features": mk(mel),
        "decoder_input_ids": mk(dec),
        "labels": mk(labels),
        "bias_spans": mk(spans),
    }

    opt = make_optimizer(peak_lr=1e-5, warmup_steps=50, total_steps=1000)
    step = make_train_step(cfg, opt, bias_weight=1.5, grad_accum=ACCUM)
    state = init_train_state(params, opt)

    state, m = step(state, batch)  # compile
    jax.block_until_ready((state, m))

    # distinct device-resident batches per iteration: the runtime memoizes
    # repeated dispatches with identical content (tunnel artifact)
    variants = []
    for i in range(ITERS):
        v = dict(batch)
        v["input_features"] = batch["input_features"] * (1.0 + 1e-4 * (i + 1))
        v = jax.tree.map(jnp.asarray, v)
        jax.block_until_ready(v)
        variants.append(v)

    times = []
    for v in variants:
        t0 = time.perf_counter()
        state, m = step(state, v)
        # force a device->host read: block_until_ready alone does not
        # guarantee completion on the tunneled platform
        _ = float(m["loss"]) + float(jax.numpy.sum(state.params["decoder"]["ln"]["scale"]))
        times.append(time.perf_counter() - t0)

    wall = min(times)
    audio_s = BATCH * ACCUM * 30.0
    # explicit-FLOPs MFU (utils/flops.py): matmul FLOPs of the step over
    # wall time, against the chip's published bf16 peak
    from whisper_context_biasing_tpu.utils.flops import (
        device_peak_flops, train_step_flops,
    )

    step_flops = train_step_flops(cfg, BATCH, SEQ, ACCUM)
    peak = device_peak_flops(jax.devices()[0])
    mfu = (step_flops / wall / peak) if peak else None
    print(json.dumps({
        "metric": "train_audio_sec_per_sec",
        "value": round(audio_s / wall, 2),
        "unit": "audio_s/s",
        "vs_baseline": None,
        "detail": {
            "model": MODEL, "batch": BATCH, "accum": ACCUM, "seq": SEQ,
            "wall_s": round(wall, 4), "loss": float(m["loss"]),
            "step_tflops": round(step_flops / 1e12, 2),
            "device": str(jax.devices()[0]),
        },
    }))
    if mfu is not None:
        print(json.dumps({
            "metric": "train_mfu",
            "value": round(mfu, 4),
            "unit": "fraction_of_bf16_peak",
            "vs_baseline": None,
            "detail": {
                "model": MODEL, "batch": BATCH, "accum": ACCUM, "seq": SEQ,
                "step_tflops": round(step_flops / 1e12, 2),
                "achieved_tflops_per_s": round(step_flops / wall / 1e12, 1),
                "peak_tflops": round(peak / 1e12, 1),
                "wall_s": round(wall, 4),
            },
        }))


if __name__ == "__main__":
    main()
