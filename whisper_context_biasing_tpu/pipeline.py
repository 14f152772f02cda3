"""High-level serving API: load once, transcribe anything.

The reference exposes its capabilities only through CLI scripts
(/root/reference/scripts/train.py, evaluation.py); library users get this
one-object surface over the same TPU pipeline the CLIs and the HTTP server
use — batched short-form decode, long-form seeking, bias-word fusion,
prompt conditioning, language id/translation, beams, and word timestamps::

    from whisper_context_biasing_tpu import Pipeline

    pipe = Pipeline("small", checkpoint="model.safetensors")
    res = pipe.transcribe(["a.wav", "b.wav"],
                          bias_words=["aspirin"], bias_boost=2.0)
    res[0].text, res[0].words, res[0].segments
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class TranscriptionResult:
    text: str
    tokens: list = field(default_factory=list)
    language: str | None = None
    # (start_s, end_s, text) cues — long-form timestamps or word grouping
    segments: list | None = None
    # word-level timings (decode/word_timestamps.WordTiming)
    words: list | None = None
    # per-window QC dicts (transcribe(window_info=True), long-form modes):
    # start_s, temperature, avg_logprob, no_speech_prob, compression_ratio,
    # accepted
    windows: list | None = None

    def srt(self) -> str:
        from .utils.subtitles import format_srt

        if self.segments is None:
            raise ValueError("no timed segments (use timestamps=True or "
                             "word_timestamps=True)")
        return format_srt(self.segments)

    def vtt(self) -> str:
        from .utils.subtitles import format_vtt

        if self.segments is None:
            raise ValueError("no timed segments (use timestamps=True or "
                             "word_timestamps=True)")
        return format_vtt(self.segments)


class Pipeline:
    """Loaded model + tokenizer + compiled decode programs.

    ``model``: family name (``tiny.en`` .. ``large-v3``); multilingual
    variants get language id / translation. ``checkpoint``: HF
    ``model.safetensors`` or a framework checkpoint; random init without.
    ``model_parallelism`` > 1 (or multiple visible devices) shards weights
    over a ``(data, model)`` mesh and decode batches over "data"."""

    def __init__(
        self,
        model: str = "base.en",
        *,
        checkpoint: str | None = None,
        vocab: str | None = None,
        merges: str | None = None,
        dtype: str = "bfloat16",
        fast: bool | None = None,
        bias_words: list[str] | None = None,
        bias_boost: float = 0.0,
        model_parallelism: int = 1,
        config_overrides: dict | None = None,
        params=None,
        config=None,
        tokenizer=None,
        draft_model: str | None = None,
        draft_checkpoint: str | None = None,
        speculative_k: int = 4,
        draft_config=None,
        draft_params=None,
        medusa: str | dict | None = None,  # medusa.npz path or head tree:
                                           # self-speculative greedy decode
                                           # (decode/medusa.py; wins over a
                                           # draft model when both given).
                                           # Composes with short-form,
                                           # long-form, chunked & streaming
        medusa_chains: int | None = None,  # override the npz-stamped
                                           # n_chains (tree-attention chain
                                           # branching width)
    ):
        from .data.collator import SpeechSeq2SeqCollator
        from .models import get_config, init_params, load_checkpoint_or_safetensors
        from .tokenizer import load_tokenizer

        self.model_name = model
        self.tokenizer = tokenizer or load_tokenizer(
            vocab, merges, multilingual=not model.endswith(".en"))
        if fast is None:  # auto: serving approximations on real TPUs only
            from .utils import effective_platform

            fast = effective_platform() == "tpu"
        overrides = dict(config_overrides or {})
        if fast:
            # the serve.py fast path: Pallas kernels + int8 cross-KV +
            # tanh gelu (errors below bf16 rounding, docs/PERF.md)
            overrides.setdefault("flash_attention", True)
            overrides.setdefault("flash_block_q", 1536)
            overrides.setdefault("quantize_cross_kv", True)
            overrides.setdefault("fused_quant_cross", True)
            overrides.setdefault("gelu_approx", True)
        if config is not None:
            self.cfg = config
        else:
            self.cfg = get_config(model, dtype=dtype, **overrides)
        if params is not None:
            self.params = params
        elif checkpoint:
            self.params, self.cfg = load_checkpoint_or_safetensors(checkpoint, self.cfg)
        else:
            self.params = init_params(self.cfg, 0)
        self.default_bias_words = bias_words
        self.default_bias_boost = bias_boost
        self.collator = SpeechSeq2SeqCollator(
            pad_token_id=self.tokenizer.pad_token_id,
            decoder_start_token_id=self.tokenizer.sot,
            bias_span_pad_id=self.tokenizer.eot,
        )

        # auto-mesh only over devices of the EFFECTIVE platform (a session
        # pinned to CPU on a TPU host must not shard onto the TPU mesh);
        # model_parallelism=0 disables. Shared semantics with the CLIs —
        # see parallel.mesh.auto_mesh.
        from .parallel import auto_mesh, shard_params

        self.mesh = auto_mesh(model_parallelism)
        if self.mesh is not None:
            self.params = shard_params(self.params, self.mesh)

        # optional speculative decoding: a small draft model accelerates
        # the greedy path with EXACT output equivalence (decode/speculative).
        # The draft inherits the target's fast-path overrides so it runs the
        # same kernel family speculation is meant to amortize.
        self.medusa = None
        if medusa is not None:
            from .models import load_medusa

            self.medusa = (load_medusa(medusa, n_chains=medusa_chains)
                           if isinstance(medusa, str) else dict(medusa))
            if medusa_chains and not isinstance(medusa, str):
                self.medusa["n_chains"] = medusa_chains
        self.draft_params = self.draft_cfg = None
        self.speculative_k = speculative_k
        if draft_model or draft_config is not None:
            # build + validate the draft config up front (cheap), then load
            # the weights
            if draft_config is not None:
                self.draft_cfg = draft_config
            else:
                ov = {km: vv for km, vv in overrides.items()
                      if km in ("flash_attention", "flash_block_q",
                                "quantize_cross_kv", "fused_quant_cross",
                                "gelu_approx")}
                self.draft_cfg = get_config(draft_model, dtype=dtype, **ov)
            if self.draft_cfg.n_vocab != self.cfg.n_vocab:
                raise ValueError(
                    f"draft {draft_model} vocab {self.draft_cfg.n_vocab}"
                    f" != target vocab {self.cfg.n_vocab}")
            if draft_params is not None:
                self.draft_params = draft_params
            elif draft_checkpoint:
                self.draft_params, self.draft_cfg = (
                    load_checkpoint_or_safetensors(draft_checkpoint,
                                                   self.draft_cfg))
            else:
                from .decode import load_draft

                self.draft_params, self.draft_cfg = load_draft(
                    draft_model, cfg=self.draft_cfg, target_cfg=self.cfg)
            if self.mesh is not None:
                # speculative decode composes with the mesh: the batch axis
                # shards over "data" (per-row cache offsets are row-local,
                # tests/test_parallel.py) and the draft's params over
                # "model" like the target's
                self.draft_params = shard_params(self.draft_params, self.mesh)

    # -- helpers ----------------------------------------------------------

    @property
    def window_samples(self) -> int:
        """Audio window in samples (480000 = 30 s for the standard configs;
        derived from the encoder context so reduced test/bucketed configs
        keep working: one encoder state per 320 samples)."""
        return self.cfg.n_audio_ctx * 320

    def _load(self, audio) -> np.ndarray:
        if isinstance(audio, (str, bytes)):
            from .audio import load_audio

            return load_audio(audio)
        from .audio import pcm_to_float32

        # raw int16 PCM arrays normalize with the ingest contract
        # (i16/32768) — a plain float cast would be 90 dB out of scale
        return pcm_to_float32(audio)

    def _mel(self, chunk: np.ndarray, n_mels: int | None = None):
        return np.asarray(self._mel_device(chunk, n_mels))

    def _mel_device(self, chunk, n_mels: int | None = None):
        """Device-resident mel for consumers that feed the decode directly
        (the chunked window gather) — no D2H/H2D round-trip, the same
        measured win as serve.py/transcribe.py (docs/PERF.md round 3)."""
        import jax.numpy as jnp

        from .audio.mel import select_mel_frontend

        frontend = select_mel_frontend()  # Pallas kernel on TPU, jnp else
        return frontend(jnp.asarray(chunk), n_mels=n_mels or self.cfg.n_mels)

    def _encode(self, mel):
        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_encode_jit"):
            from .models import encode_audio

            self._encode_jit = jax.jit(
                lambda p, m: encode_audio(p, self.cfg, m))
        return self._encode_jit(self.params, jnp.asarray(mel))

    def _spans(self, bias_words, n):
        words = bias_words if bias_words is not None else self.default_bias_words
        if not words:
            return None
        enc = [self.tokenizer.encode(w.lower(), add_special_tokens=False)
               for w in words]
        return self.collator.pad_bias_spans([enc] * n)

    def _starts(self, mel, language, task, enc_out=None):
        from .decode import resolve_start_tokens

        return resolve_start_tokens(
            self.tokenizer, mel.shape[0], language=language, task=task,
            detect=lambda: self.detect_language(mel, is_mel=True,
                                                enc_out=enc_out))

    # -- public surface ---------------------------------------------------

    def detect_language(self, audio, *, is_mel: bool = False, enc_out=None):
        """Per-clip ``(language_code, probability)``; multilingual models."""
        from .audio import pad_or_trim
        from .decode import detect_language

        if is_mel:
            mel = audio
        else:
            clips = audio if isinstance(audio, (list, tuple)) else [audio]
            mel = self._mel(np.stack([pad_or_trim(self._load(a), self.window_samples) for a in clips]))
        return detect_language(self.params, self.cfg, self.tokenizer, mel,
                               enc_out=enc_out)

    def stream(self, **kwargs):
        """A configured incremental transcriber sharing this pipeline's
        model (see decode/streaming.StreamingTranscriber): ``feed()`` audio
        chunks, ``finish()`` the tail. Session bias defaults apply unless
        overridden."""
        from .decode import StreamingTranscriber

        if "bias_spans" not in kwargs:
            spans = self._spans(kwargs.pop("bias_words", None), 1)
            if spans is not None:
                kwargs["bias_spans"] = spans
                kwargs.setdefault("bias_boost", self.default_bias_boost)
        ctx = kwargs.pop("context", None)
        if isinstance(ctx, str):
            kwargs["context"] = self.tokenizer.encode(
                ctx.lower(), add_special_tokens=False)
        elif ctx is not None:
            kwargs["context"] = ctx
        # device-resident mel: StreamingTranscriber feeds the decode
        # directly (same contract as serve.py's stream_start mel_fn)
        kwargs.setdefault("mel_fn", self._mel_device)
        kwargs.setdefault("window_samples", self.window_samples)
        # session accelerators carry into streaming (medusa wins; a draft
        # with a different mel frontend can't share the stream's mel_fn)
        if self.medusa is not None:
            kwargs.setdefault("medusa", self.medusa)
        elif self.draft_params is not None:
            if self.draft_cfg.n_mels == self.cfg.n_mels:
                kwargs.setdefault(
                    "draft", (self.draft_params, self.draft_cfg,
                              self.speculative_k))
            else:
                import warnings

                warnings.warn(
                    "streaming speculative decoding needs a draft with the "
                    f"target's n_mels ({self.cfg.n_mels}); draft has "
                    f"{self.draft_cfg.n_mels} — streaming plain")
        return StreamingTranscriber(self.params, self.cfg, self.tokenizer,
                                    **kwargs)

    def transcribe(
        self,
        audio,
        *,
        context: str | None = None,
        bias_words: list[str] | None = None,
        bias_boost: float | None = None,
        language: str | None = None,
        task: str = "transcribe",
        num_beams: int = 1,
        beam_early_stopping: str = "off",
        max_tokens: int = 224,
        long_form: bool | str = "auto",
        chunked_batch: int = 64,
        vad: bool | dict = False,   # host-side energy VAD (audio/vad.py):
                                    # long-form/chunked windows with no
                                    # detected speech skip all device work
        window_info: bool = False,  # long-form modes: per-window QC dicts
                                    # on result.windows

        timestamps: bool = False,
        word_timestamps: bool = False,
        temperatures: tuple = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        window_buckets: tuple | list | None = None,
                                    # short-form only: duration buckets in
                                    # seconds, e.g. (8, 15). Clips decode in
                                    # the smallest bucket window that holds
                                    # them (the full 30 s window is always
                                    # the implicit last bucket) — measured
                                    # 2.1x utterance throughput for short
                                    # corpora (docs/PERF.md). Whisper is
                                    # trained on 30 s windows, so validate
                                    # accuracy on-corpus before serving
        best_of: int = 1,           # sampled fallback rungs draw n
                                    # candidates; best avg-logprob wins
        prompt_reset_on_temperature: float | None = 0.5,
                                    # hot-rung windows clear the history
                                    # prompt (sequential long-form only)
        no_speech_threshold: float | None = 0.6,
        alignment_heads: list[tuple[int, int]] | None = None,
    ) -> list[TranscriptionResult]:
        """Transcribe file paths and/or 16 kHz float arrays.

        ``long_form="auto"`` routes clips through the sequential-window seek
        loop when any input exceeds the 30 s window; ``timestamps`` adds
        absolute-time segments there. ``long_form="chunked"`` decodes all
        windows in parallel (overlap-merged, no history conditioning) — the
        throughput mode for long audio; composes with ``word_timestamps``
        and ``num_beams``. Short-form ``word_timestamps`` adds
        per-word times via cross-attention alignment (and caption segments
        grouped from them)."""
        from .audio import pad_or_trim
        from .utils.subtitles import close_open_segments, words_to_segments

        single = not isinstance(audio, (list, tuple))
        clips = [self._load(a) for a in ([audio] if single else audio)]
        n = len(clips)
        boost = self.default_bias_boost if bias_boost is None else bias_boost
        spans = self._spans(bias_words, n)
        ctx = None
        if context:
            ctx = [self.tokenizer.encode(context.lower(), add_special_tokens=False)] * n

        win = self.window_samples
        chunked = long_form == "chunked"
        use_long = (long_form is True) or chunked or (
            long_form == "auto" and any(len(c) > win for c in clips))
        if window_buckets and use_long:
            # the long-form modes window at the model's full context by
            # construction; say so instead of silently ignoring the option
            import warnings

            warnings.warn(
                "window_buckets applies to the short-form route only; this "
                "call took a long-form path (a clip exceeds one window, or "
                "long_form was forced) — buckets ignored.")
        if window_info and not use_long:
            # same contract as the CLI (scripts/transcribe.py): QC dicts are
            # per long-form window; short-form has none, say so out loud
            import warnings

            warnings.warn(
                "window_info=True reports long-form window QC; this call "
                "took the short-form route (all clips <= one window) — "
                "result.windows stays None. Pass long_form=True to force "
                "the windowed path.")

        if chunked:
            # parallel-window mode: all windows of all clips decode in one
            # (or a few) large batches — the throughput path for long audio
            # (decode/chunked.py). No history conditioning; timestamps=True
            # merges by segment-core ownership, False by LCS token merge;
            # word_timestamps aligns each decode batch in one DTW call with
            # words owned by the same core tiling.
            from .decode import transcribe_chunked, unpack_long_form

            # medusa wins over a draft, so only consider (and only warn
            # about) the draft when no heads are loaded
            draft = None
            if self.medusa is None and self.draft_params is not None:
                if self.draft_cfg.n_mels == self.cfg.n_mels:
                    draft = (self.draft_params, self.draft_cfg,
                             self.speculative_k)
                else:
                    import warnings

                    warnings.warn(
                        "chunked speculative decoding needs a draft with "
                        f"the target's n_mels ({self.cfg.n_mels}); draft "
                        f"has {self.draft_cfg.n_mels} — decoding plain")
            first = self._mel(np.stack([pad_or_trim(c, win) for c in clips]))
            starts, langs = self._starts(first, language, task)
            out = transcribe_chunked(
                self.params, self.cfg, self.tokenizer, clips,
                mel_fn=self._mel_device, max_new=max_tokens, contexts=ctx,
                bias_spans=spans, bias_boost=boost,
                use_timestamps=timestamps, temperatures=tuple(temperatures),
                best_of=best_of,
                no_speech_threshold=no_speech_threshold,
                start_tokens=starts, return_segments=True,
                prefix_pad_to_multiple=32, window_samples=win, draft=draft,
                medusa=self.medusa,
                num_beams=num_beams, beam_early_stopping=beam_early_stopping,
                mesh=self.mesh, word_timestamps=word_timestamps,
                alignment_heads=alignment_heads, vad=vad,
                # pad every window batch to one static shape: repeated
                # library calls with varying audio lengths must reuse ONE
                # compiled program (docs/PERF.md chunked pitfall)
                max_batch=chunked_batch, pad_batches=True,
                return_window_info=window_info)
            hyps, segs, long_words, winfo = unpack_long_form(
                out, return_segments=True, word_timestamps=word_timestamps,
                return_window_info=window_info)
            results = []
            for i, h in enumerate(hyps):
                text = self.tokenizer.decode(h, skip_special_tokens=True).strip()
                lw = long_words[i] if long_words is not None else None
                segments = close_open_segments(
                    segs[i], clip_end=len(clips[i]) / 16000)
                if lw is not None and not timestamps:
                    segments = words_to_segments(lw)
                results.append(TranscriptionResult(
                    text=text, tokens=list(h), language=langs[i],
                    words=lw, segments=segments,
                    windows=winfo[i] if winfo is not None else None))
            return results[0] if single else results

        if use_long:
            import warnings

            from .decode import transcribe_long_batch, unpack_long_form

            draft = None
            if self.medusa is None and self.draft_params is not None:
                if self.draft_cfg.n_mels == self.cfg.n_mels:
                    draft = (self.draft_params, self.draft_cfg,
                             self.speculative_k)
                else:
                    warnings.warn(
                        "long-form speculative decoding needs a draft with "
                        f"the target's n_mels ({self.cfg.n_mels}); draft has "
                        f"{self.draft_cfg.n_mels} — decoding plain")
            first = self._mel(np.stack([pad_or_trim(c, win) for c in clips]))
            starts, langs = self._starts(first, language, task)
            out = transcribe_long_batch(
                self.params, self.cfg, self.tokenizer, clips,
                mel_fn=self._mel_device, max_new=max_tokens, contexts=ctx,
                bias_spans=spans, bias_boost=boost,
                use_timestamps=timestamps, temperatures=tuple(temperatures),
                best_of=best_of,
                prompt_reset_on_temperature=prompt_reset_on_temperature,
                no_speech_threshold=no_speech_threshold,
                start_tokens=starts, return_segments=True,
                word_timestamps=word_timestamps,
                alignment_heads=alignment_heads,
                prefix_pad_to_multiple=32, window_samples=win, draft=draft,
                medusa=self.medusa, vad=vad,
                num_beams=num_beams, beam_early_stopping=beam_early_stopping,
                mesh=self.mesh, return_window_info=window_info)
            hyps, segs, long_words, winfo = unpack_long_form(
                out, return_segments=True, word_timestamps=word_timestamps,
                return_window_info=window_info)
            results = []
            for i, h in enumerate(hyps):
                text = self.tokenizer.decode(h, skip_special_tokens=True).strip()
                lw = long_words[i] if long_words is not None else None
                segments = close_open_segments(
                    segs[i], clip_end=len(clips[i]) / 16000)
                if lw is not None and not timestamps:
                    # word-derived cues beat whole-window blobs for srt/vtt
                    segments = words_to_segments(lw)
                results.append(TranscriptionResult(
                    text=text, tokens=list(h), language=langs[i],
                    words=lw, segments=segments,
                    windows=winfo[i] if winfo is not None else None))
            return results[0] if single else results

        from .decode import beam_decode_batch, decode_batch, find_word_timestamps

        need_lang = self.tokenizer.multilingual and (
            language == "auto" or (task == "translate" and not language))

        def run(idxs, win_samples):
            """Decode the clips at ``idxs`` padded/trimmed to one shared
            ``win_samples`` window; returns per-row (hyps, timings, langs)."""
            stacked = np.stack([pad_or_trim(clips[i], win_samples)
                                for i in idxs])
            mel = self._mel(stacked)
            # one shared encoder pass for language id + word alignment
            # (decode still encodes inside its own program)
            enc = self._encode(mel) if (word_timestamps or need_lang) else None
            starts, langs = self._starts(mel, language, task, enc_out=enc)
            kwargs = dict(
                contexts=[ctx[i] for i in idxs] if ctx is not None else None,
                max_new=max_tokens,
                bias_spans=spans[list(idxs)] if spans is not None else None,
                bias_boost=boost, mesh=self.mesh)
            if starts is not None:
                kwargs["starts"] = starts
            if num_beams > 1:
                hyps = beam_decode_batch(
                    self.params, self.cfg, self.tokenizer, mel,
                    num_beams=num_beams, early_stopping=beam_early_stopping,
                    **kwargs)
            elif self.medusa is not None:
                # self-speculative: trained multi-token heads, one model,
                # exact greedy output (decode/medusa.py)
                from .decode import medusa_decode_batch

                hyps = medusa_decode_batch(
                    self.params, self.cfg, self.medusa, self.tokenizer, mel,
                    pad_to_multiple=32, **kwargs)
            elif self.draft_params is not None:
                # speculative greedy: exact same tokens, fewer target-weight
                # reads per emitted token (decode/speculative.py); under a
                # mesh the batch axis shards over "data" like plain decode
                from .decode import speculative_decode_batch

                mel_d = None
                if self.draft_cfg.n_mels != self.cfg.n_mels:
                    mel_d = self._mel(stacked, n_mels=self.draft_cfg.n_mels)
                hyps = speculative_decode_batch(
                    self.draft_params, self.draft_cfg, self.params, self.cfg,
                    self.tokenizer, mel, k=self.speculative_k,
                    pad_to_multiple=32, input_features_draft=mel_d, **kwargs)
            else:
                hyps = decode_batch(self.params, self.cfg, self.tokenizer,
                                    mel, pad_to_multiple=32, **kwargs)
            timings = None
            if word_timestamps:
                timings = find_word_timestamps(
                    self.params, self.cfg, self.tokenizer, mel, hyps,
                    starts=starts,
                    num_frames=[min(len(clips[i]), win_samples) // 320
                                for i in idxs],
                    alignment_heads=alignment_heads, enc_out=enc)
            return hyps, timings, langs

        if window_buckets:
            # duration-bucketed serving: each clip decodes in the smallest
            # requested window that holds it — encoder work scales with the
            # window, so short-utterance corpora (the reference's is 5-30 s
            # mp3 clips) skip most of the padded-silence compute. Windows
            # round up to the 320-sample encoder hop; the full window is
            # always the final bucket so nothing gets trimmed shorter than
            # the unbucketed path would.
            sizes = sorted({-(-int(float(b) * 16000) // 320) * 320
                            for b in window_buckets})
            if not sizes or sizes[0] <= 0:
                raise ValueError(f"window_buckets must be positive seconds, "
                                 f"got {window_buckets!r}")
            sizes = [s for s in sizes if s < win] + [win]
            groups: dict[int, list[int]] = {}
            for i, c in enumerate(clips):
                s = next(sz for sz in sizes if len(c) <= sz or sz == win)
                groups.setdefault(s, []).append(i)
            hyps = [None] * n
            timings = [None] * n if word_timestamps else None
            langs = [None] * n
            for s, idxs in sorted(groups.items()):
                # pad each bucket's batch to a power of two (min 8): group
                # sizes depend on the per-call duration mix, so without
                # padding every serving request would compile a fresh decode
                # program per (window, group size) pair — the same pitfall
                # the chunked path avoids with pad_batches=True. Pad rows
                # repeat the group's first clip and are stripped below.
                b = max(8, 1 << (len(idxs) - 1).bit_length())
                h, t, lg = run(list(idxs) + [idxs[0]] * (b - len(idxs)), s)
                for j, i in enumerate(idxs):
                    hyps[i] = h[j]
                    if timings is not None:
                        timings[i] = t[j]
                    langs[i] = lg[j]
        else:
            hyps, timings, langs = run(range(n), win)
        results = []
        for i, h in enumerate(hyps):
            text = self.tokenizer.decode(h, skip_special_tokens=True).strip()
            words = timings[i] if timings is not None else None
            results.append(TranscriptionResult(
                text=text, tokens=list(h), language=langs[i], words=words,
                segments=words_to_segments(words) if words is not None else None))
        return results[0] if single else results
