#!/usr/bin/env python
"""Streaming (online) serving latency benchmark — VERDICT r3 ask #4.

Drives ``decode.StreamingTranscriber`` sessions the way serve.py's WS path
does (0.5 s host chunks into ``feed``) and reports COMPUTE latency — the
wall time of the feed() calls themselves, excluding the real-time wait for
audio to arrive (which is fixed by the window length, not by this code):

  {"metric": "stream_first_segment_latency_s", ...}
      cumulative feed() wall until the first closed segment is returned,
      single session — the "time to first text" a client observes past the
      unavoidable audio buffering
  {"metric": "stream_window_latency_p50_s" / "_p95_s", ...}
      per-window decode latency across sessions: every feed() that consumed
      a buffered window (i.e. ran a decode) is one sample; measured for
      BENCH_STREAM_SESSIONS (default 8) sessions fed round-robin on one
      chip, the concurrency shape of the serve worker

Decode config mirrors the latency-oriented serving recipe: single rung
(temperature 0.0, no quality fallbacks -> one compiled program), no
timestamps (every window closes its segment), history conditioning on,
BENCH_STREAM_TOKENS (default 80 ~ the corpus mean transcript length)
max_new per window. Random weights never emit EOT, so every window decodes
the full budget — a latency upper bound.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whisper_context_biasing_tpu.utils import setup_jax
setup_jax()

import numpy as np

MODEL = os.environ.get("BENCH_STREAM_MODEL", "small")
TOKENS = int(os.environ.get("BENCH_STREAM_TOKENS", "80"))
SESSIONS = int(os.environ.get("BENCH_STREAM_SESSIONS", "8"))
FILE_S = int(os.environ.get("BENCH_STREAM_FILE_SECONDS", "120"))
CHUNK_S = float(os.environ.get("BENCH_STREAM_CHUNK_SECONDS", "0.5"))


def make_session(params, cfg, tok, jnp):
    from whisper_context_biasing_tpu.decode import StreamingTranscriber
    from whisper_context_biasing_tpu.ops.mel_kernel import log_mel_spectrogram_fused

    def mel_fn(chunk):
        # streaming passes an already-batched (1, N) chunk
        return log_mel_spectrogram_fused(jnp.asarray(chunk),
                                         n_mels=cfg.n_mels)

    return StreamingTranscriber(
        params, cfg, tok, mel_fn=mel_fn, max_new=TOKENS,
        use_timestamps=False, temperatures=(0.0,),
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None)


def main():
    import jax
    import jax.numpy as jnp

    from whisper_context_biasing_tpu.models import get_config, init_params
    from whisper_context_biasing_tpu.tokenizer import load_tokenizer

    cfg = get_config(MODEL, dtype="bfloat16",
                     flash_attention=True, flash_block_q=1536,
                     gelu_approx=True, quantize_cross_kv=True,
                     fused_quant_cross=True)
    params = init_params(cfg, 0)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    tok = load_tokenizer()
    rng = np.random.default_rng(0)
    chunk_n = int(CHUNK_S * 16000)

    def feed_file(sess_list, on_event):
        """Round-robin 0.5 s chunks into every session; time each feed.
        Audio draws from the shared module rng (content is irrelevant to
        latency with fixed-length decodes)."""
        audio = [(rng.standard_normal(FILE_S * 16000) * 0.1)
                 .astype(np.float32) for _ in sess_list]
        for off in range(0, FILE_S * 16000, chunk_n):
            for si, sess in enumerate(sess_list):
                t0 = time.perf_counter()
                segs = sess.feed(audio[si][off: off + chunk_n])
                dt = time.perf_counter() - t0
                on_event(si, dt, segs)

    # --- warmup: compile the window decode once (excluded like every other
    # compile in this suite)
    warm = make_session(params, cfg, tok, jnp)
    warm.feed((rng.standard_normal(31 * 16000) * 0.1).astype(np.float32))

    # --- single session: time-to-first-segment (compute only)
    sess = make_session(params, cfg, tok, jnp)
    state = {"compute": 0.0, "first": None}

    def on1(si, dt, segs):
        if state["first"] is None:
            state["compute"] += dt
            if segs:
                state["first"] = state["compute"]

    feed_file([sess], on1)
    print(json.dumps({
        "metric": "stream_first_segment_latency_s",
        "value": round(state["first"], 4) if state["first"] else None,
        "unit": "s_compute",
        "vs_baseline": None,
        "detail": {"model": MODEL, "max_new": TOKENS,
                   "chunk_s": CHUNK_S,
                   "note": "feed() wall until first closed segment; "
                           "excludes the real-time audio wait"},
    }))

    # --- concurrent sessions: per-window decode latency p50/p95
    sessions = [make_session(params, cfg, tok, jnp) for _ in range(SESSIONS)]
    events = []
    feed_file(sessions, lambda si, dt, segs:
              events.append(dt) if dt > 0.01 else None)
    lat = np.sort(np.asarray(events))
    total_audio = SESSIONS * FILE_S
    total_compute = float(np.sum(events))
    for name, q in (("p50", 50), ("p95", 95)):
        print(json.dumps({
            "metric": f"stream_window_latency_{name}_s",
            "value": round(float(np.percentile(lat, q)), 4),
            "unit": "s_compute",
            "vs_baseline": None,
            "detail": {"model": MODEL, "sessions": SESSIONS,
                       "max_new": TOKENS, "windows_decoded": len(events),
                       "aggregate_rtf": round(total_audio / total_compute, 1)
                       if total_compute else None},
        }))


if __name__ == "__main__":
    main()
