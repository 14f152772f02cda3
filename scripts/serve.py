#!/usr/bin/env python
"""HTTP transcription server — the online-serving entry point.

Stdlib-only HTTP front over the batched TPU pipeline: requests are queued,
micro-batched up to ``--batch`` (padded with silence so the XLA program shape
stays fixed — no recompiles), decoded in one program, and answered.

    python scripts/serve.py --model base.en --port 8080 \
        [--init_checkpoint model.safetensors] [--num_beams 5] \
        [--bias_words aspirin promisec --bias_boost 2.0]

    curl -s --data-binary @clip.wav http://localhost:8080/transcribe
    curl -s "http://localhost:8080/health"

POST /transcribe accepts a WAV or MP3 body; optional headers:
    X-Context:         conditioning text (placed after <|startofprev|>)
    X-Bias-Words:      comma-separated bias words (per-request shallow fusion)
    X-Language:        language code or "auto" (multilingual models)
    X-Task:            "translate" for speech -> English (multilingual models)
    X-Word-Timestamps: "1" adds per-word start/end times (any length)
    X-Window-Info:     "1" adds per-window QC dicts (>30 s requests)

Streaming (incremental) sessions — decode/streaming.py:
    POST /stream            -> {"session": id}   (same option headers)
    POST /stream/<id>       WAV or raw PCM16-LE body; returns segments
                            closed by the newly completed windows
    POST /stream/<id>/end   flush the tail; returns the final transcript
"""

import argparse
import io
import json
import os
import queue
import sys
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from whisper_context_biasing_tpu.utils import setup_jax
setup_jax()

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="base.en")
    p.add_argument("--init_checkpoint", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--merges", default=None)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch", type=int, default=8,
                   help="micro-batch size (static shape; padded with silence)")
    p.add_argument("--max_wait_ms", type=int, default=30,
                   help="max queueing delay before a partial batch is flushed")
    p.add_argument("--max_tokens", type=int, default=128)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--draft_model", default=None,
                   help="speculative decoding draft family (greedy path; "
                        "output exactly matches the target model)")
    p.add_argument("--draft_checkpoint", default=None)
    p.add_argument("--spec_k", type=int, default=4)
    p.add_argument("--medusa", default=None,
                   help="medusa.npz (scripts/medusa.py): self-speculative "
                        "multi-token heads — no draft model; output exactly "
                        "matches plain greedy. Applies to short-form, "
                        "long-form, and streaming greedy paths")
    p.add_argument("--medusa_chains", type=int, default=None,
                   help="branch on head-1's top-S candidates per round "
                        "(tree-attention chain mode; default: the value "
                        "saved in medusa.npz, else 1)")
    p.add_argument("--bias_words", nargs="*", default=None,
                   help="server-wide default bias words")
    p.add_argument("--bias_boost", type=float, default=0.0)
    p.add_argument("--model_parallelism", type=int, default=1,
                   help="tensor-parallel degree; with >1 device a "
                        "(data, model) mesh shards the decode batch over "
                        "'data' and the weights over 'model'")
    p.add_argument("--long_chunked", action="store_true",
                   help="serve >30 s requests with the parallel-window "
                        "chunked decoder (decode/chunked.py): all windows "
                        "of a request batch in max --chunked_batch decode "
                        "calls with padded static shapes — the throughput "
                        "mode; word-timestamp requests compose (batched "
                        "DTW per decode call)")
    p.add_argument("--chunked_batch", type=int, default=32,
                   help="window-batch size for --long_chunked")
    p.add_argument("--vad", action="store_true",
                   help="host-side energy VAD: long-form/chunked windows "
                        "and buffered stream windows with no detected "
                        "speech skip all device work (audio/vad.py)")
    p.add_argument("--no_long_form", action="store_true",
                   help="truncate >30 s requests to one window instead of "
                        "routing them through the long-form seek loop")
    p.add_argument("--timestamps", action="store_true",
                   help="long-form requests use timestamp-conditioned "
                        "seeking (segments straddling a window boundary "
                        "are re-decoded whole)")
    p.add_argument("--temperatures", type=float, nargs="*",
                   default=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
                   help="long-form quality-fallback ladder")
    p.add_argument("--best_of", type=int, default=1,
                   help="sampled fallback rungs draw N candidates per "
                        "window; best average-logprob row wins")
    p.add_argument("--logprob_threshold", type=float, default=-1.0,
                   help="long-form: avg token logprob below this triggers "
                        "fallback; pass nan to disable")
    p.add_argument("--stream_ttl", type=int, default=600,
                   help="seconds before an idle streaming session is reaped")
    p.add_argument("--max_streams", type=int, default=64,
                   help="cap on concurrent streaming sessions")
    return p.parse_args()


class Engine:
    """Compiled pipeline + micro-batching worker."""

    def __init__(self, args):
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.audio import pad_or_trim
        from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
        from whisper_context_biasing_tpu.decode import (
            beam_decode_batch, decode_batch, detect_language,
            find_word_timestamps, transcribe_chunked, transcribe_long_batch,
        )
        from whisper_context_biasing_tpu.models import (
            get_config, init_params, load_checkpoint_or_safetensors,
        )
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer
        from whisper_context_biasing_tpu.utils import RtfMeter

        self.args = args
        self.jnp = jnp
        self.pad_or_trim = pad_or_trim
        from whisper_context_biasing_tpu.audio.mel import select_mel_frontend

        self.mel_fn = select_mel_frontend()  # Pallas on TPU, jnp elsewhere
        self.decode_batch = decode_batch
        self.beam_decode_batch = beam_decode_batch
        self.transcribe_long_batch = transcribe_long_batch
        self.transcribe_chunked = transcribe_chunked
        self.detect_language = detect_language
        self.find_word_timestamps = find_word_timestamps
        self.rtf = RtfMeter()

        self.tokenizer = load_tokenizer(args.vocab, args.merges,
                                        multilingual=not args.model.endswith(".en"))
        self.cfg = get_config(args.model, dtype="bfloat16", flash_attention=True,
                              flash_block_q=1536, quantize_cross_kv=True,
                              fused_quant_cross=True, gelu_approx=True)
        from whisper_context_biasing_tpu.utils import warn_missing_assets
        warn_missing_assets(args.vocab, args.init_checkpoint, "serve")
        if args.init_checkpoint:
            self.params, self.cfg = load_checkpoint_or_safetensors(
                args.init_checkpoint, self.cfg)
        else:
            self.params = init_params(self.cfg, 0)
        self.collator = SpeechSeq2SeqCollator(
            pad_token_id=self.tokenizer.pad_token_id,
            decoder_start_token_id=self.tokenizer.sot,
            bias_span_pad_id=self.tokenizer.eot,
        )

        # multi-chip serving: shard the weights once over a (data, model)
        # mesh; decode batches are sharded per request in _run. Shared
        # semantics with Pipeline and the CLIs (parallel.mesh.auto_mesh):
        # effective-platform devices only, pure dp by default, 0 opts out.
        from whisper_context_biasing_tpu.parallel import auto_mesh, shard_params

        self.medusa = None
        if getattr(args, "medusa", None):
            from whisper_context_biasing_tpu.models import load_medusa

            self.medusa = load_medusa(
                args.medusa, n_chains=getattr(args, "medusa_chains", None))

        self.mesh = auto_mesh(args.model_parallelism)
        if self.mesh is not None:
            self.params = shard_params(self.params, self.mesh)
            print(f"mesh: {dict(self.mesh.shape)}", file=sys.stderr)

        # optional speculative decoding (greedy path, exact output —
        # decode/speculative.py). The draft inherits the fast serving
        # overrides so it runs the same kernel family as the target.
        self.draft_params = self.draft_cfg = None
        if args.draft_model:
            from whisper_context_biasing_tpu.decode import load_draft

            self.draft_params, self.draft_cfg = load_draft(
                args.draft_model, args.draft_checkpoint,
                overrides=dict(flash_attention=True, flash_block_q=1536,
                               quantize_cross_kv=True,
                               fused_quant_cross=True, gelu_approx=True),
                target_cfg=self.cfg)
            if self.mesh is not None:
                # the draft shards like the target: params over "model",
                # decode batches over "data" (speculative_decode_batch mesh=)
                self.draft_params = shard_params(self.draft_params, self.mesh)

        self.q: queue.Queue = queue.Queue()
        self.streams: dict = {}
        self.streams_lock = threading.Lock()
        threading.Thread(target=self._worker, daemon=True).start()

        # warm the compile with a silent batch
        print("compiling...", file=sys.stderr)
        self._run([np.zeros(16000, np.float32)] * args.batch,
                  [None] * args.batch, [None] * args.batch)
        print("ready", file=sys.stderr)

    MAX_SPANS = (16, 16)  # static bias-span shape: no per-request recompiles

    def _spans_for(self, words_lists):
        tok = self.tokenizer
        if not any(words_lists):
            return None
        n_max, k_max = self.MAX_SPANS
        encoded = [
            [tok.encode(w.strip().lower(), add_special_tokens=False)[:k_max]
             for w in (words or [])[:n_max] if w.strip()]
            for words in words_lists
        ]
        self.collator.max_spans = self.MAX_SPANS
        return self.collator.pad_bias_spans(encoded)

    @staticmethod
    def _needs_detection(o) -> bool:
        return (o.get("language") == "auto"
                or (o.get("task") == "translate" and not o.get("language")))

    def _starts_for(self, mel, opts, enc_out=None):
        """Per-row decode starts from X-Language/X-Task; None when every row
        uses the default bare ``[<|sot|>]`` start. Rows asking for "auto"
        (or translate without a language) share one language-id program;
        ``enc_out`` reuses already-computed encoder states."""
        from whisper_context_biasing_tpu.decode import resolve_start_tokens

        tok = self.tokenizer
        n = mel.shape[0]
        if not tok.multilingual or not any(
            o.get("language") or o.get("task") == "translate" for o in opts
        ):
            return None, [None] * n
        detected = None
        if any(self._needs_detection(o) for o in opts):
            detected = self.detect_language(self.params, self.cfg, tok, mel,
                                            enc_out=enc_out)
        starts, langs = [], []
        for i, o in enumerate(opts):
            st, lg = resolve_start_tokens(
                tok, 1, language=o.get("language"),
                task=o.get("task", "transcribe"),
                detect=(lambda i=i: [detected[i]]) if detected else None)
            starts.append(st[0] if st else [tok.sot])
            langs.append(lg[0])
        return starts, langs

    def _encode(self, mel):
        """One jitted encoder pass shared by language id and word alignment
        (the decode program still encodes internally — 2 passes, not 3)."""
        import jax

        if not hasattr(self, "_encode_jit"):
            from whisper_context_biasing_tpu.models import encode_audio

            self._encode_jit = jax.jit(
                lambda p, m: encode_audio(p, self.cfg, m))
        return self._encode_jit(self.params, self.jnp.asarray(mel))

    def _run(self, audios, contexts, bias_word_lists, opts=None):
        tok = self.tokenizer
        n = len(audios)
        opts = opts or [{} for _ in range(n)]
        # defense in depth: the handler converts short int16 uploads before
        # queueing, but this path must never see raw PCM regardless of how
        # routing thresholds evolve — an unscaled int16 row would feed the
        # mel +-32767-range values and transcribe garbage with no error
        from whisper_context_biasing_tpu.audio import pcm_to_float32

        audio = np.stack([self.pad_or_trim(pcm_to_float32(a))
                          for a in audios])
        mel = np.asarray(self.mel_fn(self.jnp.asarray(audio), n_mels=self.cfg.n_mels))
        ctx = None
        if any(contexts):
            # rows without a context stay unprompted (decode_batch treats an
            # empty per-row list as a bare [<|sot|>] prefix)
            ctx = [tok.encode(c.lower(), add_special_tokens=False) if c else []
                   for c in contexts]
        default_words = self.args.bias_words or []
        spans = self._spans_for([
            (w if w is not None else default_words) for w in bias_word_lists
        ])
        want_words = any(o.get("words") for o in opts)
        enc = None
        if want_words or (self.tokenizer.multilingual
                          and any(self._needs_detection(o) for o in opts)):
            enc = self._encode(mel)
        starts, langs = self._starts_for(mel, opts, enc_out=enc)
        kwargs = dict(contexts=ctx, max_new=self.args.max_tokens,
                      bias_spans=spans, bias_boost=self.args.bias_boost,
                      mesh=self.mesh)
        if starts is not None:
            kwargs["starts"] = starts
        if self.args.num_beams > 1:
            hyps = self.beam_decode_batch(self.params, self.cfg, tok, mel,
                                          num_beams=self.args.num_beams, **kwargs)
        elif self.medusa is not None:
            from whisper_context_biasing_tpu.decode import medusa_decode_batch

            hyps = medusa_decode_batch(self.params, self.cfg, self.medusa,
                                       tok, mel, pad_to_multiple=32, **kwargs)
        elif self.draft_params is not None:
            from whisper_context_biasing_tpu.decode import speculative_decode_batch

            mel_d = None
            if self.draft_cfg.n_mels != self.cfg.n_mels:
                mel_d = np.asarray(self.mel_fn(self.jnp.asarray(audio),
                                               n_mels=self.draft_cfg.n_mels))
            hyps = speculative_decode_batch(
                self.draft_params, self.draft_cfg, self.params, self.cfg,
                tok, mel, k=self.args.spec_k, pad_to_multiple=32,
                input_features_draft=mel_d, **kwargs)
        else:
            # prefix lengths bucketed to multiples of 32 so new context
            # lengths reuse a handful of compiled programs
            hyps = self.decode_batch(self.params, self.cfg, tok, mel,
                                     pad_to_multiple=32, **kwargs)
        results = [{"text": tok.decode(h, skip_special_tokens=True).strip()}
                   for h in hyps]
        for r, lang in zip(results, langs):
            if lang:
                r["language"] = lang
        if want_words:
            # one static-shape alignment program (token axis padded to the
            # decode budget, full frame axis), reusing the encoder pass
            timings = self.find_word_timestamps(
                self.params, self.cfg, tok, mel, hyps, starts=starts,
                num_frames=[min(len(a), 480000) // 320 for a in audios],
                pad_to=self.args.max_tokens + 8, enc_out=enc)
            for r, o, ws in zip(results, opts, timings):
                if o.get("words"):
                    r["words"] = self._word_dicts(ws)
        return results

    def _prep_long(self, audios, contexts, bias_word_lists, opts):
        """Shared request prep for both long-form paths: encoded contexts,
        bias spans, the device mel closure, per-file start tokens/langs
        (language forcing detects on each file's first window), the
        speculative draft (needs the target's mel layout), and the
        nan-disables logprob threshold."""
        tok = self.tokenizer
        ctx = [tok.encode(c.lower(), add_special_tokens=False) if c else []
               for c in contexts]
        default_words = self.args.bias_words or []
        spans = self._spans_for([
            w if w is not None else default_words for w in bias_word_lists
        ])

        def mel_fn(chunk):
            # stays on device: feeds the decode directly; D2H only happens
            # where a host consumer needs it (word-timestamp DTW)
            return self.mel_fn(self.jnp.asarray(chunk),
                               n_mels=self.cfg.n_mels)

        start_tokens = None
        langs = [None] * len(audios)
        if tok.multilingual and any(
            o.get("language") or o.get("task") == "translate" for o in opts
        ):
            # int16 pass-through audio (chunked path) needs a normalized
            # host view — of the DETECTION WINDOW only, not the whole file
            # (a 1 h int16 upload would otherwise allocate a ~230 MB float
            # copy to read its first 30 s)
            from whisper_context_biasing_tpu.audio import pcm_to_float32

            first = np.stack([self.pad_or_trim(pcm_to_float32(a[:480000]))
                              for a in audios])
            start_tokens, langs = self._starts_for(mel_fn(first), opts)
        draft = None
        if (self.draft_params is not None
                and self.draft_cfg.n_mels == self.cfg.n_mels):
            draft = (self.draft_params, self.draft_cfg, self.args.spec_k)
        lp = self.args.logprob_threshold
        return ctx, spans, mel_fn, start_tokens, langs, draft, (
            None if lp != lp else lp)

    @staticmethod
    def _word_dicts(ws):
        return [{"word": w.word.strip(), "start": w.start, "end": w.end,
                 "probability": w.probability}
                for w in ws]

    def _run_long_chunked(self, audios, contexts, bias_word_lists, opts):
        """>30 s requests, throughput mode (--long_chunked): every window of
        every request decodes in padded --chunked_batch batches — one
        compiled program regardless of request shape (decode/chunked.py)."""
        tok = self.tokenizer
        n = len(audios)
        opts = opts or [{} for _ in range(n)]
        ctx, spans, mel_fn, start_tokens, langs, draft, lp = self._prep_long(
            audios, contexts, bias_word_lists, opts)
        want_words = any(o.get("words") for o in opts[:n])
        # window QC is a LONG-request feature: gate on each request's own
        # audio length so a <=30 s request gets the same response shape
        # whether it batched with a long request or alone (the micro-batch
        # routes whole batches here when ANY member is long)
        want_info = any(o.get("window_info") and len(a) > 480000
                        for o, a in zip(opts[:n], audios[:n]))
        out = self.transcribe_chunked(
            self.params, self.cfg, tok, audios, mel_fn=mel_fn, draft=draft,
            max_new=self.args.max_tokens,
            contexts=ctx if any(ctx) else None,
            bias_spans=spans, bias_boost=self.args.bias_boost,
            use_timestamps=self.args.timestamps,
            temperatures=tuple(self.args.temperatures),
            best_of=getattr(self.args, "best_of", 1),
            logprob_threshold=lp,
            prefix_pad_to_multiple=32,
            max_batch=self.args.chunked_batch, pad_batches=True,
            start_tokens=start_tokens, num_beams=self.args.num_beams,
            medusa=self.medusa, mesh=self.mesh,
            vad=getattr(self.args, "vad", False),
            return_segments=want_words, word_timestamps=want_words,
            return_window_info=want_info)
        from whisper_context_biasing_tpu.decode import unpack_long_form

        hyps, _, words, winfo = unpack_long_form(
            out, return_segments=want_words, word_timestamps=want_words,
            return_window_info=want_info)
        results = [{"text": tok.decode(h, skip_special_tokens=True).strip()}
                   for h in hyps]
        for i, (r, lang) in enumerate(zip(results, langs)):
            if lang:
                r["language"] = lang
            if words is not None and opts[i].get("words"):
                r["words"] = self._word_dicts(words[i])
            if (winfo is not None and opts[i].get("window_info")
                    and len(audios[i]) > 480000):
                r["windows"] = winfo[i]
        return results

    def _run_long(self, audios, contexts, bias_word_lists, opts=None):
        """>30 s requests: sequential-window seek loop (decode/long_form.py).
        The window batch is padded to the static micro-batch size and prompt
        lengths are bucketed, so the greedy program shapes stay stable."""
        if getattr(self.args, "long_chunked", False):
            return self._run_long_chunked(audios, contexts, bias_word_lists,
                                          opts)
        tok = self.tokenizer
        bs = self.args.batch
        n = len(audios)
        # pad to the static micro-batch with silence so program shapes hold
        opts = (opts or [{} for _ in range(n)]) + [{}] * (bs - n)
        audios = list(audios) + [np.zeros(160, np.float32)] * (bs - n)
        contexts = list(contexts) + [None] * (bs - n)
        bias_word_lists = list(bias_word_lists) + [None] * (bs - n)
        ctx, spans, mel_fn, start_tokens, langs, draft, lp = self._prep_long(
            audios, contexts, bias_word_lists, opts)
        want_words = any(o.get("words") for o in opts[:n])
        # same per-request gate as _run_long_chunked: QC only for requests
        # that are themselves long, so batching can't change response shape
        want_info = any(o.get("window_info") and len(a) > 480000
                        for o, a in zip(opts[:n], audios[:n]))
        out = self.transcribe_long_batch(
            self.params, self.cfg, tok, audios, mel_fn=mel_fn, draft=draft,
            max_new=self.args.max_tokens,
            contexts=ctx if any(ctx) else None,
            bias_spans=spans, bias_boost=self.args.bias_boost,
            use_timestamps=self.args.timestamps,
            temperatures=tuple(self.args.temperatures),
            best_of=getattr(self.args, "best_of", 1),
            logprob_threshold=lp,
            prefix_pad_to_multiple=32,
            start_tokens=start_tokens,
            return_segments=want_words, word_timestamps=want_words,
            num_beams=self.args.num_beams, medusa=self.medusa,
            mesh=self.mesh, vad=getattr(self.args, "vad", False),
            return_window_info=want_info,
        )
        from whisper_context_biasing_tpu.decode import unpack_long_form

        hyps, _, words, winfo = unpack_long_form(
            out, return_segments=want_words, word_timestamps=want_words,
            return_window_info=want_info)
        results = [{"text": tok.decode(h, skip_special_tokens=True).strip()}
                   for h in hyps[:n]]
        for i, (r, lang) in enumerate(zip(results, langs[:n])):
            if lang:
                r["language"] = lang
            if words is not None and opts[i].get("words"):
                r["words"] = self._word_dicts(words[i])
            if (winfo is not None and opts[i].get("window_info")
                    and len(audios[i]) > 480000):
                r["windows"] = winfo[i]
        return results

    # -- streaming sessions (decode/streaming.py) -------------------------

    # idle-session TTL / concurrent cap; defaults for hand-wired engines,
    # --stream_ttl / --max_streams take precedence via getattr(self.args,...)
    STREAM_TTL_S = 600
    MAX_STREAMS = 64

    def stream_start(self, context=None, bias_words=None, opt=None) -> str:
        """Create an incremental session. Streaming decodes run b=1 outside
        the micro-batch queue (their window cadence doesn't batch well);
        compiled programs are shared across sessions via the jit cache.
        Language options follow /transcribe: an explicit code forces it,
        "auto" (or translate without a code) detects on the first window."""
        import uuid

        from whisper_context_biasing_tpu.decode import StreamingTranscriber

        opt = opt or {}
        self._reap_streams()
        tok = self.tokenizer
        spans = None
        words = bias_words if bias_words is not None else self.args.bias_words
        if words:
            self.collator.max_spans = self.MAX_SPANS
            spans = self.collator.pad_bias_spans(
                [[tok.encode(w.strip().lower(), add_special_tokens=False)[:16]
                  for w in words if w.strip()]])
        ctx = (tok.encode(context.lower(), add_special_tokens=False)
               if context else None)

        def mel_fn(chunk):
            # stays on device: feeds the decode directly; D2H only happens
            # where a host consumer needs it (word-timestamp DTW)
            return self.mel_fn(self.jnp.asarray(chunk),
                               n_mels=self.cfg.n_mels)

        st = StreamingTranscriber(
            self.params, self.cfg, tok, mel_fn=mel_fn,
            max_new=self.args.max_tokens, context=ctx, bias_spans=spans,
            bias_boost=self.args.bias_boost,
            use_timestamps=self.args.timestamps,
            temperatures=tuple(self.args.temperatures),
            best_of=getattr(self.args, "best_of", 1),
            logprob_threshold=(None if self.args.logprob_threshold
                               != self.args.logprob_threshold
                               else self.args.logprob_threshold),
            language=opt.get("language") if tok.multilingual else None,
            task=(opt.get("task", "transcribe") if tok.multilingual
                  else "transcribe"),
            word_timestamps=bool(opt.get("words")),
            vad=getattr(self.args, "vad", False),
            medusa=self.medusa,
            draft=((self.draft_params, self.draft_cfg, self.args.spec_k)
                   if (self.medusa is None and self.draft_params is not None
                       and self.draft_cfg.n_mels == self.cfg.n_mels)
                   else None),
        )
        sid = uuid.uuid4().hex[:16]
        with self.streams_lock:
            cap = getattr(self.args, "max_streams", self.MAX_STREAMS)
            if len(self.streams) >= cap:
                raise RuntimeError(f"too many active streams (max {cap})")
            self.streams[sid] = [st, threading.Lock(), time.time()]
        return sid

    def _reap_streams(self):
        """Drop sessions idle past the TTL (abandoned clients would leak
        buffered audio and history forever otherwise)."""
        cutoff = time.time() - getattr(self.args, "stream_ttl", self.STREAM_TTL_S)
        with self.streams_lock:
            for sid in [s for s, rec in self.streams.items() if rec[2] < cutoff]:
                del self.streams[sid]

    def _stream(self, sid):
        with self.streams_lock:
            if sid not in self.streams:
                raise KeyError(f"unknown stream session: {sid}")
            rec = self.streams[sid]
            rec[2] = time.time()
            return rec

    def stream_feed(self, sid, audio):
        self._reap_streams()  # abandoned sessions die even if nobody
        st, lock, _ = self._stream(sid)  # creates new streams
        with lock:
            n_words = len(st.words)
            segs = st.feed(audio)
            out = {"segments": [{"start": round(a, 3),
                                 "end": None if e is None else round(e, 3),
                                 "text": t.strip()} for a, e, t in segs],
                   "buffered_seconds": round(st.buffered_samples / 16000, 2)}
            if st.word_timestamps:
                out["words"] = self._word_dicts(st.words[n_words:])
            if st.language:
                out["language"] = st.language
            return out

    def stream_end(self, sid):
        st, lock, _ = self._stream(sid)
        with lock:
            n_words = len(st.words)
            segs = st.finish()
            out = {"segments": [{"start": round(a, 3),
                                 "end": None if e is None else round(e, 3),
                                 "text": t.strip()} for a, e, t in segs],
                   "text": st.text}
            if st.word_timestamps:
                out["words"] = self._word_dicts(st.words[n_words:])
            if st.language:
                out["language"] = st.language
        with self.streams_lock:
            self.streams.pop(sid, None)
        return out

    def submit(self, audio, context, bias_words, opt=None):
        done = threading.Event()
        box = {}
        self.q.put((audio, context, bias_words, opt or {}, done, box))
        done.wait(timeout=300)
        if "error" in box:
            raise RuntimeError(box["error"])
        if "result" not in box:
            raise TimeoutError("decode timed out")
        return box["result"]

    def _worker(self):
        bs = self.args.batch
        while True:
            first = self.q.get()
            if first is None:  # shutdown sentinel (tests / embedders)
                return
            batch = [first]
            deadline = time.time() + self.args.max_wait_ms / 1000.0
            while len(batch) < bs:
                try:
                    item = self.q.get(timeout=max(0.0, deadline - time.time()))
                except queue.Empty:
                    break
                if item is None:
                    self.q.put(None)  # re-post so the loop exits after this batch
                    break
                batch.append(item)
            audios = [b[0] for b in batch]
            ctxs = [b[1] for b in batch]
            words = [b[2] for b in batch]
            opts = [b[3] for b in batch]
            n = len(batch)
            # pad to the static batch shape with silence
            while len(audios) < bs:
                audios.append(np.zeros(16000, np.float32))
                ctxs.append(None)
                words.append(None)
                opts.append({})
            long_form = not self.args.no_long_form and any(
                len(a) > 480000 for a in audios[:n]
            )
            audio_s = (sum(len(a) for a in audios[:n]) / 16000 if long_form
                       else sum(min(len(a), 480000) for a in audios[:n]) / 16000)
            t0 = time.time()
            try:
                if long_form:
                    results = self._run_long(audios[:n], ctxs[:n], words[:n],
                                             opts[:n])
                else:
                    results = self._run(audios, ctxs, words, opts)
                self.rtf.add(audio_s, time.time() - t0)
                for (_, _, _, _, done, box), res in zip(batch, results[:n]):
                    box["result"] = res
                    done.set()
            except Exception as e:  # surface errors to all waiters
                for _, _, _, _, done, box in batch:
                    box["error"] = f"{type(e).__name__}: {e}"
                    done.set()
                print(f"batch failed: {e}", file=sys.stderr)


def decode_audio_bytes(data: bytes, keep_int16: bool = False) -> np.ndarray:
    """Route an uploaded body by magic bytes: WAV, or MP3 (the corpus's
    format, decoded via the libmpg123 binding when present).

    ``keep_int16``: mono 16-bit 16 kHz WAV returns raw int16 samples (the
    chunked long-form decoder normalizes on device, halving the upload —
    audio/io.py's load_audio(keep_int16=True) contract)."""
    if data[:4] == b"RIFF":
        return decode_wav_bytes(data, keep_int16=keep_int16)
    if data[:3] == b"ID3" or (
        len(data) > 1 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        import tempfile

        from whisper_context_biasing_tpu.audio import resample
        from whisper_context_biasing_tpu.audio.io import EXTRA_DECODERS

        dec = EXTRA_DECODERS.get(".mp3")
        if dec is None:
            raise ValueError("mp3 decoder unavailable on this host")
        with tempfile.NamedTemporaryFile(suffix=".mp3") as f:
            f.write(data)
            f.flush()
            sig, sr = dec(f.name)
        if sr != 16000:
            sig = resample(sig, sr, 16000)
        return np.asarray(sig, np.float32)
    raise ValueError("unsupported audio container (expect WAV or MP3)")


def decode_wav_bytes(data: bytes, keep_int16: bool = False) -> np.ndarray:
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if keep_int16 and width == 2 and ch == 1 and sr == 16000:
        return np.frombuffer(raw, dtype="<i2")
    if width == 2:
        sig = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        sig = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        sig = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width} bytes")
    if ch > 1:
        sig = sig.reshape(-1, ch).mean(axis=1)
    if sr != 16000:
        from whisper_context_biasing_tpu.audio import resample

        sig = resample(sig, sr, 16000)
    return sig


def _validate_opt(engine, opt) -> str | None:
    """Pre-batch request validation (language code, task name)."""
    lang = opt.get("language")
    tok = engine.tokenizer
    if lang and lang != "auto" and tok.multilingual:
        from whisper_context_biasing_tpu.tokenizer.whisper_tokenizer import (
            LANGUAGES,
        )

        if lang not in LANGUAGES[: tok.num_languages]:
            return f"unknown language code: {lang}"
    task = opt.get("task")
    if task and task not in ("transcribe", "translate"):
        return f"unknown task: {task}"
    return None


def _parse_opt_headers(headers) -> dict:
    """Shared option-header parsing for /transcribe and /stream."""
    opt = {}
    if headers.get("X-Language"):
        opt["language"] = headers["X-Language"].strip()
    if headers.get("X-Task"):
        opt["task"] = headers["X-Task"].strip()
    if (headers.get("X-Word-Timestamps") or "").strip() in ("1", "true", "yes"):
        opt["words"] = True
    if (headers.get("X-Window-Info") or "").strip() in ("1", "true", "yes"):
        opt["window_info"] = True  # long-form only: per-window QC dicts
    return opt


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quieter logs
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok", "model": engine.args.model,
                                 "rtf": round(engine.rtf.rtf, 1)
                                 if engine.rtf.wall_s else None})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path.startswith("/stream"):
                self._stream_post()
                return
            if self.path != "/transcribe":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                # int16 pass-through is only valid for requests that will
                # route to the chunked long path (it normalizes on device);
                # short requests take the host-windowed short path, so they
                # must arrive as float32
                keep = (getattr(engine.args, "long_chunked", False)
                        and not getattr(engine.args, "no_long_form", False))
                audio = decode_audio_bytes(self.rfile.read(n),
                                           keep_int16=keep)
                if audio.dtype == np.int16 and len(audio) <= 480000:
                    audio = audio.astype(np.float32) / 32768.0
                ctx = self.headers.get("X-Context")
                words = self.headers.get("X-Bias-Words")
                words = [w for w in words.split(",")] if words else None
                opt = _parse_opt_headers(self.headers)
                # reject bad options HERE: a ValueError inside the worker
                # would fail every request sharing the micro-batch
                err = _validate_opt(engine, opt)
                if err:
                    self._json(400, {"error": err})
                    return
                t0 = time.time()
                result = engine.submit(audio, ctx, words, opt)
                result.update({
                    "audio_seconds": round(len(audio) / 16000, 2),
                    "latency_ms": round((time.time() - t0) * 1000, 1),
                })
                self._json(200, result)
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def _stream_post(self):
            try:
                parts = [p for p in self.path.split("/") if p]
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                if parts == ["stream"]:  # create session
                    opt = _parse_opt_headers(self.headers)
                    err = _validate_opt(engine, opt)
                    if err:
                        self._json(400, {"error": err})
                        return
                    words = self.headers.get("X-Bias-Words")
                    sid = engine.stream_start(
                        context=self.headers.get("X-Context"),
                        bias_words=words.split(",") if words else None,
                        opt=opt)
                    self._json(200, {"session": sid})
                elif len(parts) == 2:  # feed audio
                    audio = (decode_wav_bytes(body) if body[:4] == b"RIFF"
                             else np.frombuffer(body, dtype="<i2")
                             .astype(np.float32) / 32768.0)
                    self._json(200, engine.stream_feed(parts[1], audio))
                elif len(parts) == 3 and parts[2] == "end":
                    self._json(200, engine.stream_end(parts[1]))
                else:
                    self._json(404, {"error": "not found"})
            except KeyError as e:
                self._json(404, {"error": str(e)})
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main():
    args = parse_args()
    engine = Engine(args)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(engine))
    print(f"serving on :{args.port}", file=sys.stderr)
    server.serve_forever()


if __name__ == "__main__":
    main()
