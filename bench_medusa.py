#!/usr/bin/env python
"""Medusa chain-mode verify-cost sweep on the real chip.

With random weights acceptance is ~0, so every round advances exactly one
token — rounds == tokens — and the RTF ratio between ``n_chains`` settings
isolates the per-round cost of widening the verify forward from ``1+K`` to
``1+S*K`` positions (decode/medusa.py chain mode). With real weights the
same sweep (plus ``medusa_results.json:eval_tokens_per_round``) picks the
chain count that trades verify width against acceptance.

Run: python bench_medusa.py [model] [batch] [tokens]
Prints one JSON line per chain setting (docs/PERF.md pending measurements).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whisper_context_biasing_tpu.utils import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_context_biasing_tpu.decode import pack_prefixes  # noqa: E402
from whisper_context_biasing_tpu.decode.medusa import (  # noqa: E402
    medusa_greedy_decode,
)
from whisper_context_biasing_tpu.models import (  # noqa: E402
    get_config, init_medusa_params, init_params,
)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    cfg = get_config(model, dtype="bfloat16", flash_attention=True,
                     flash_block_q=1536, quantize_cross_kv=True,
                     fused_quant_cross=True, gelu_approx=True)
    params = init_params(cfg, 0)
    md = init_medusa_params(cfg, 4, 0)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        (rng.standard_normal((batch, cfg.n_mels, 3000)) * 0.3)
        .astype(np.float32), dtype=jnp.bfloat16)
    sot = cfg.decoder_start_token_id
    ids, mask = pack_prefixes([[sot]] * batch, 50256)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    audio_s = batch * 30.0
    for s in (1, 2, 4):
        r = medusa_greedy_decode(params, cfg, md, mel, ids, mask,
                                 max_new=tokens, eot_id=-1, n_chains=s)
        np.asarray(r.tokens)  # compile + warm (full host sync)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            r = medusa_greedy_decode(params, cfg, md, mel, ids, mask,
                                     max_new=tokens, eot_id=-1, n_chains=s)
            # host transfer, not block_until_ready: the tunneled device has
            # been observed to release block_until_ready before execution
            # finished (a 0.83 ms "call" for a 145 ms program); a D2H copy
            # of the result cannot lie about completion.
            np.asarray(r.tokens)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": "medusa_chain_rtf", "value": round(audio_s / dt, 1),
            "unit": "x_realtime",
            "detail": {"model": model, "batch": batch, "tokens": tokens,
                       "n_chains": s, "rounds": int(r.spec_rounds),
                       "ms_per_call": round(dt * 1000, 2)},
        }))


if __name__ == "__main__":
    main()
