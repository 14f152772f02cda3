#!/usr/bin/env python
"""Batch transcription CLI — the serving entry point.

Assembles the full TPU pipeline: native C++ batch audio decode (WAV) ->
fused Pallas log-mel -> encoder -> while_loop greedy/beam decode with
optional bias-word boosting and prompt conditioning -> text / srt / vtt.

    python scripts/transcribe.py --model base.en --audio a.wav b.wav \
        [--bias_words aspirin promisec --bias_boost 2.0] \
        [--context "clinical description"] [--num_beams 5] \
        [--language auto] [--task translate] [--word_timestamps] \
        [--format srt --output_dir out/] \
        [--init_checkpoint model.safetensors] [--vocab ... --merges ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from whisper_context_biasing_tpu.utils import setup_jax
setup_jax()

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Batch transcription")
    p.add_argument("--audio", nargs="+", required=True, help="WAV files")
    p.add_argument("--model", default="base.en")
    p.add_argument("--init_checkpoint", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--merges", default=None)
    p.add_argument("--context", default=None,
                   help="conditioning text prepended after <|startofprev|>")
    p.add_argument("--bias_words", nargs="*", default=None)
    p.add_argument("--bias_boost", type=float, default=0.0)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--draft_model", default=None,
                   help="speculative decoding: small draft model family "
                        "(e.g. tiny.en; large-v3-turbo for large-v3). "
                        "Greedy only; output is exactly the target model's")
    p.add_argument("--draft_checkpoint", default=None)
    p.add_argument("--spec_k", type=int, default=4,
                   help="draft tokens proposed per verification round")
    p.add_argument("--medusa", default=None,
                   help="medusa.npz from scripts/medusa.py: self-speculative "
                        "decoding with multi-token heads (no draft model; "
                        "output exactly matches plain greedy). Applies to "
                        "the short-form and long-form greedy paths")
    p.add_argument("--medusa_chains", type=int, default=None,
                   help="branch on head-1's top-S candidates per round "
                        "(tree-attention chain mode; default: the value "
                        "saved in medusa.npz, else 1)")
    p.add_argument("--beam_early_stopping",
                   choices=["off", "true", "false", "never"], default="off",
                   help="off = frozen-beam pool (fastest); true/false/never "
                        "= HF generate semantics (2k candidates, finished-"
                        "hypothesis pool, the matching stopping rule)")
    p.add_argument("--max_tokens", type=int, default=224)
    p.add_argument("--long", action="store_true",
                   help="long-form mode: sequential 30 s windows with history "
                        "conditioning (audio of any length)")
    p.add_argument("--chunked", action="store_true",
                   help="with --long: decode ALL windows in parallel with "
                        "overlapping strides and merge (segment-core "
                        "ownership with --timestamps, LCS token merge "
                        "without) — the throughput mode for long audio; "
                        "composes with --word_timestamps and --num_beams; "
                        "trades away history conditioning")
    p.add_argument("--vad", action="store_true",
                   help="host-side energy VAD: long-form/chunked windows "
                        "with no detected speech skip all device work "
                        "(audio/vad.py)")
    p.add_argument("--clip_timestamps", default=None,
                   help='decode ONLY these second-ranges, e.g. "0-30,65-90" '
                        "(long-form/chunked; wins over --vad)")
    p.add_argument("--timestamps", action="store_true",
                   help="long-form: timestamp-conditioned seeking (window "
                        "advances to the last closed segment; straddling "
                        "segments re-decoded whole) and <|t|> segment output")
    p.add_argument("--temperatures", type=float, nargs="*",
                   default=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
                   help="long-form fallback ladder; a window failing the "
                        "quality checks retries at the next temperature")
    p.add_argument("--prompt_reset_on_temperature", type=float, default=0.5,
                   help="sequential long-form: a window produced by a rung "
                        "hotter than this clears the history prompt so "
                        "hallucinations don't propagate (nan disables)")
    p.add_argument("--best_of", type=int, default=1,
                   help="sampled fallback rungs draw N candidates per "
                        "window; the best average-logprob row wins "
                        "(OpenAI long-form best_of; greedy rung unaffected)")
    p.add_argument("--compression_ratio_threshold", type=float, default=2.4)
    p.add_argument("--logprob_threshold", type=float, default=-1.0,
                   help="avg token logprob below this triggers fallback; "
                        "pass nan to disable")
    p.add_argument("--no_speech_threshold", type=float, default=0.6,
                   help="long-form: windows with P(<|nospeech|>) above this "
                        "(and avg logprob below --logprob_threshold) emit "
                        "nothing; pass nan to disable")
    p.add_argument("--language", default=None,
                   help="multilingual models: force a language code "
                        "(e.g. fr), or 'auto' to detect per file from the "
                        "first decoder step (decode/language.py)")
    p.add_argument("--task", choices=["transcribe", "translate"],
                   default="transcribe",
                   help="translate = any-language speech -> English text "
                        "(multilingual models; auto-detects the source "
                        "language unless --language is given)")
    p.add_argument("--window_info", action="store_true",
                   help="long-form modes: add per-window QC dicts "
                        "(temperature, avg_logprob, no_speech_prob, "
                        "compression_ratio, accepted) to the JSON output")
    p.add_argument("--word_timestamps", action="store_true",
                   help="per-word start/end times via cross-attention DTW "
                        "alignment (decode/word_timestamps.py); short-form "
                        "mode only")
    p.add_argument("--alignment_heads", default=None,
                   help="comma-separated layer:head pairs for alignment "
                        "(e.g. '4:3,5:0'); default = all heads of the top "
                        "half of decoder layers")
    p.add_argument("--format", choices=["text", "json", "srt", "vtt"],
                   default=None,
                   help="output format; srt/vtt need timed segments "
                        "(--long --timestamps, or short-form word "
                        "alignment, which is enabled automatically)")
    p.add_argument("--output_dir", default=None,
                   help="write one <basename>.<format> file per input "
                        "instead of printing to stdout")
    p.add_argument("--json", action="store_true",
                   help="machine-readable output (alias for --format json)")
    p.add_argument("--exact", action="store_true",
                   help="disable the serving approximations (int8 cross-KV, "
                        "tanh gelu): bit-parity decode at ~25%% lower RTF")
    return p.parse_args()


def build_starts(args, tokenizer, params, cfg, n, mel_thunk):
    """Per-file decode start sequences from --language/--task via
    decode.resolve_start_tokens. ``mel_thunk`` computes the detection mel
    lazily — the common no-language invocation never pays for it.
    Returns (starts | None, langs)."""
    from whisper_context_biasing_tpu.decode import (
        detect_language, resolve_start_tokens,
    )

    if not tokenizer.multilingual:
        if args.language or args.task == "translate":
            print("warning: --language/--task need a multilingual model; "
                  "ignored", file=sys.stderr)
        return None, [None] * n

    def detect():
        detected = detect_language(params, cfg, tokenizer, mel_thunk())
        print("detected: " + ", ".join(f"{l} ({p:.2f})" for l, p in detected),
              file=sys.stderr)
        return detected

    try:
        return resolve_start_tokens(tokenizer, n, language=args.language,
                                    task=args.task, detect=detect)
    except ValueError as e:
        raise SystemExit(str(e))


def parse_alignment_heads(spec):
    if not spec:
        return None
    try:
        return [tuple(int(x) for x in pair.split(":"))
                for pair in spec.split(",")]
    except ValueError:
        raise SystemExit(
            f"--alignment_heads must be comma-separated layer:head pairs, "
            f"got {spec!r}")


def parse_clip_timestamps(spec):
    """'0-30,65-90' -> [(0.0, 30.0), (65.0, 90.0)] (None/empty -> None)."""
    if not spec:
        return None
    try:
        out = []
        for rng in spec.split(","):
            s, e = rng.split("-")
            out.append((float(s), float(e)))
        return out
    except ValueError:
        raise SystemExit(
            f"--clip_timestamps must be comma-separated start-end second "
            f"ranges like '0-30,65-90', got {spec!r}")


def emit(args, fmt, path, text, segments, words, language=None, windows=None):
    """One input file's output in the chosen format; returns the string."""
    from whisper_context_biasing_tpu.utils.subtitles import format_srt, format_vtt

    if fmt == "json":
        rec = {"file": path, "text": text}
        if language:
            rec["language"] = language
        if windows is not None:
            rec["windows"] = windows
        if segments is not None:
            rec["segments"] = [{"start": round(a, 3), "end": round(e, 3),
                                "text": t.strip()} for a, e, t in segments]
        if words is not None:
            rec["words"] = [{"word": w.word.strip(), "start": w.start,
                             "end": w.end, "probability": w.probability}
                            for w in words]
        return json.dumps(rec)
    if fmt in ("srt", "vtt"):
        if segments is None:
            raise SystemExit(f"--format {fmt} needs timed segments "
                             "(--long --timestamps or --word_timestamps)")
        return (format_srt if fmt == "srt" else format_vtt)(segments)
    if words is not None:
        stamped = " ".join(f"{w.word.strip()}[{w.start:.2f}-{w.end:.2f}]"
                           for w in words)
        return f"{path}: {stamped or text}"
    if segments is not None and args.timestamps:
        return f"{path}: " + " ".join(
            f"[{a:.2f}-{e:.2f}]{t}" for a, e, t in segments)
    return f"{path}: {text}"


def write_outputs(args, fmt, rendered):
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        ext = {"text": "txt", "json": "json", "srt": "srt", "vtt": "vtt"}[fmt]
        for path, out in zip(args.audio, rendered):
            base = os.path.splitext(os.path.basename(path))[0]
            dest = os.path.join(args.output_dir, f"{base}.{ext}")
            with open(dest, "w") as f:
                f.write(out if out.endswith("\n") else out + "\n")
            print(f"wrote {dest}", file=sys.stderr)
    else:
        joiner = "\n" if fmt in ("srt", "vtt") else ""
        for i, out in enumerate(rendered):
            if fmt in ("srt", "vtt") and len(rendered) > 1:
                print(f"# {args.audio[i]}")
            print(out, end=joiner + "\n" if not out.endswith("\n") else joiner)


def main():
    args = parse_args()
    fmt = args.format or ("json" if args.json else "text")
    import jax.numpy as jnp

    from whisper_context_biasing_tpu.audio import load_audio, pad_or_trim
    from whisper_context_biasing_tpu.audio import native
    from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
    from whisper_context_biasing_tpu.decode import beam_decode_batch, decode_batch
    from whisper_context_biasing_tpu.models import (
        get_config, init_params, load_checkpoint_or_safetensors,
    )
    from whisper_context_biasing_tpu.tokenizer import load_tokenizer
    from whisper_context_biasing_tpu.utils.subtitles import (
        close_open_segments, words_to_segments,
    )

    tokenizer = load_tokenizer(args.vocab, args.merges,
                               multilingual=not args.model.endswith(".en"))
    from whisper_context_biasing_tpu.utils import effective_platform

    on_tpu = effective_platform() == "tpu"
    fast = on_tpu and not args.exact
    fast_overrides = dict(
        # the serve.py fast path: Pallas kernels + int8 cross-KV
        flash_attention=fast, flash_block_q=1536 if fast else 256,
        quantize_cross_kv=fast, fused_quant_cross=fast, gelu_approx=fast)
    cfg = get_config(args.model, dtype="bfloat16", **fast_overrides)
    from whisper_context_biasing_tpu.utils import warn_missing_assets
    warn_missing_assets(args.vocab, args.init_checkpoint, "transcribe")
    if args.init_checkpoint:
        params, cfg = load_checkpoint_or_safetensors(args.init_checkpoint, cfg)
    else:
        params = init_params(cfg, 0)

    from whisper_context_biasing_tpu.audio.mel import select_mel_frontend

    mel_frontend = select_mel_frontend()  # Pallas on TPU, jnp elsewhere

    def make_mel(chunk, n_mels=None):
        return np.asarray(mel_frontend(jnp.asarray(chunk),
                                       n_mels=n_mels or cfg.n_mels))

    t0 = time.time()
    if (args.vad or args.clip_timestamps) and not args.long:
        print("warning: --vad/--clip_timestamps gate long-form/chunked "
              "windows; ignored on the single-window path (use --long)",
              file=sys.stderr)
    if args.window_info and not args.long:
        print("warning: --window_info reports long-form window QC; ignored "
              "on the single-window path (use --long)", file=sys.stderr)
    if args.long:
        from whisper_context_biasing_tpu.decode import transcribe_long_batch

        # --num_beams > 1 composes with both long-form modes: beam search
        # drives the temperature-0 rung, sampling the fallback rungs
        medusa_heads = None
        if args.medusa:
            from whisper_context_biasing_tpu.models import load_medusa

            medusa_heads = load_medusa(args.medusa,
                                       n_chains=args.medusa_chains)
            if args.num_beams > 1:
                print("warning: --num_beams > 1 takes the beam path at "
                      "temperature 0; --medusa heads unused in long-form",
                      file=sys.stderr)
        draft = None
        if args.num_beams > 1 and args.draft_model:
            print("warning: --num_beams > 1 takes the beam path; "
                  "--draft_model ignored in long-form", file=sys.stderr)
        elif medusa_heads is not None and args.draft_model:
            print("warning: --medusa wins over --draft_model; draft ignored",
                  file=sys.stderr)
        elif args.draft_model:
            from whisper_context_biasing_tpu.decode import load_draft

            dparams, dcfg = load_draft(args.draft_model,
                                       args.draft_checkpoint,
                                       overrides=fast_overrides,
                                       target_cfg=cfg)
            if dcfg.n_mels != cfg.n_mels:
                print("warning: --draft_model n_mels mismatch; speculative "
                      "long-form disabled", file=sys.stderr)
            else:
                draft = (dparams, dcfg, args.spec_k)

        # chunked mode normalizes on device, so mono 16 kHz 16-bit wavs can
        # upload raw int16 (half the bytes); host-side consumers below
        # (language detection) normalize their own view
        from whisper_context_biasing_tpu.audio import pcm_to_float32

        raw = [load_audio(p, keep_int16=args.chunked) for p in args.audio]
        contexts = None
        if args.context:
            ctx_ids = tokenizer.encode(args.context.lower(), add_special_tokens=False)
            contexts = [ctx_ids] * len(raw)
        spans = None
        if args.bias_words:
            coll = SpeechSeq2SeqCollator(
                pad_token_id=tokenizer.pad_token_id,
                decoder_start_token_id=tokenizer.sot,
                bias_span_pad_id=tokenizer.eot,
            )
            word_ids = [tokenizer.encode(w.lower(), add_special_tokens=False)
                        for w in args.bias_words]
            spans = coll.pad_bias_spans([word_ids] * len(raw))

        # language detection (lazy) reads the first 30 s window of each file
        starts, langs = build_starts(
            args, tokenizer, params, cfg, len(raw),
            # normalize only the detection window (first 30 s), not the
            # whole file — a 1 h int16 file would otherwise allocate a
            # ~230 MB float copy just to read 480000 samples
            lambda: make_mel(np.stack(
                [pad_or_trim(pcm_to_float32(a[:480000])) for a in raw])))

        lp_thresh = args.logprob_threshold
        if lp_thresh is not None and lp_thresh != lp_thresh:  # nan disables
            lp_thresh = None
        ns_thresh = args.no_speech_threshold
        if ns_thresh is not None and ns_thresh != ns_thresh:  # nan disables
            ns_thresh = None
        heads = parse_alignment_heads(args.alignment_heads)
        common = dict(
            mel_fn=make_mel, max_new=args.max_tokens, contexts=contexts,
            bias_spans=spans, bias_boost=args.bias_boost,
            use_timestamps=args.timestamps,
            temperatures=tuple(args.temperatures), best_of=args.best_of,
            compression_ratio_threshold=args.compression_ratio_threshold,
            logprob_threshold=lp_thresh, no_speech_threshold=ns_thresh,
            start_tokens=starts, return_segments=True, draft=draft,
            medusa=medusa_heads,
            num_beams=args.num_beams,
            beam_early_stopping=args.beam_early_stopping,
            word_timestamps=args.word_timestamps, alignment_heads=heads,
            vad=parse_clip_timestamps(args.clip_timestamps) or args.vad,
            return_window_info=args.window_info)
        if args.chunked:
            from whisper_context_biasing_tpu.decode import transcribe_chunked

            # stays on device: the window gather feeds the decode directly,
            # no mel D2H/H2D round-trip (docs/PERF.md round 3)
            common["mel_fn"] = lambda chunk: mel_frontend(
                jnp.asarray(chunk), n_mels=cfg.n_mels)
            out = transcribe_chunked(params, cfg, tokenizer, raw,
                                     prefix_pad_to_multiple=32, **common)
        else:
            prt = args.prompt_reset_on_temperature
            if prt is not None and prt != prt:  # nan disables
                prt = None
            out = transcribe_long_batch(params, cfg, tokenizer, raw,
                                        prompt_reset_on_temperature=prt,
                                        **common)
        from whisper_context_biasing_tpu.decode import unpack_long_form

        hyps, segments, long_words, winfo = unpack_long_form(
            out, return_segments=True, word_timestamps=args.word_timestamps,
            return_window_info=args.window_info)
        wall = time.time() - t0
        texts = [tokenizer.decode(h, skip_special_tokens=True).strip()
                 for h in hyps]
        audio_seconds = sum(len(a) for a in raw) / 16000
        rendered = []
        for i, (path, text) in enumerate(zip(args.audio, texts)):
            segs = close_open_segments(segments[i],
                                       clip_end=len(raw[i]) / 16000)
            lw = long_words[i] if long_words is not None else None
            if lw is not None and not args.timestamps:
                segs = words_to_segments(lw)  # word-derived cues
            rendered.append(emit(args, fmt, path, text, segs, lw,
                                 language=langs[i],
                                 windows=winfo[i] if winfo else None))
        write_outputs(args, fmt, rendered)
        print(f"[{len(raw)} files, {audio_seconds:.1f}s audio in {wall:.2f}s "
              f"= {audio_seconds / max(wall, 1e-9):.1f}x realtime]", file=sys.stderr)
        return

    if native.available() and all(p.lower().endswith(".wav") for p in args.audio):
        audio = native.decode_batch(args.audio, fixed_len=480000)
        # true durations from WAV headers (cheap; no second decode)
        import wave as _wave

        true_lengths = []
        for path in args.audio:
            with _wave.open(path, "rb") as w:
                n16k = int(w.getnframes() * 16000 / w.getframerate())
            true_lengths.append(min(n16k, 480000))
    else:
        raw_clips = [load_audio(p) for p in args.audio]
        true_lengths = [min(len(a), 480000) for a in raw_clips]
        audio = np.stack([pad_or_trim(a) for a in raw_clips])
    mel = make_mel(audio)

    contexts = None
    if args.context:
        ctx_ids = tokenizer.encode(args.context.lower(), add_special_tokens=False)
        contexts = [ctx_ids] * len(args.audio)

    spans = None
    if args.bias_words:
        coll = SpeechSeq2SeqCollator(pad_token_id=tokenizer.pad_token_id,
                                     decoder_start_token_id=tokenizer.sot,
                                     bias_span_pad_id=tokenizer.eot)
        raw = [tokenizer.encode(w.lower(), add_special_tokens=False)
               for w in args.bias_words]
        spans = coll.pad_bias_spans([raw] * len(args.audio))

    starts, langs = build_starts(args, tokenizer, params, cfg,
                                 mel.shape[0], lambda: mel)

    kwargs = dict(contexts=contexts, max_new=args.max_tokens,
                  bias_spans=spans, bias_boost=args.bias_boost)
    if starts is not None:
        kwargs["starts"] = starts
    if args.num_beams > 1:
        if args.draft_model:
            print("warning: --draft_model is greedy-only; ignored with "
                  "--num_beams > 1", file=sys.stderr)
        if args.medusa:
            print("warning: --medusa is greedy-only; ignored with "
                  "--num_beams > 1", file=sys.stderr)
        hyps = beam_decode_batch(params, cfg, tokenizer, mel,
                                 num_beams=args.num_beams,
                                 early_stopping=args.beam_early_stopping,
                                 **kwargs)
    elif args.medusa:
        # self-speculative: K trained heads, no separate draft model
        # (decode/medusa.py; output bit-matches plain greedy)
        from whisper_context_biasing_tpu.decode import medusa_decode_batch
        from whisper_context_biasing_tpu.models import load_medusa

        md = load_medusa(args.medusa, n_chains=args.medusa_chains)
        hyps = medusa_decode_batch(
            params, cfg, md, tokenizer, mel, **kwargs)
    elif args.draft_model:
        from whisper_context_biasing_tpu.decode import speculative_decode_batch

        from whisper_context_biasing_tpu.decode import load_draft

        dparams, dcfg = load_draft(args.draft_model, args.draft_checkpoint,
                                   overrides=fast_overrides, target_cfg=cfg)
        mel_d = None
        if dcfg.n_mels != cfg.n_mels:
            mel_d = make_mel(audio, n_mels=dcfg.n_mels)
        hyps = speculative_decode_batch(
            dparams, dcfg, params, cfg, tokenizer, mel, k=args.spec_k,
            input_features_draft=mel_d, **kwargs)
    else:
        hyps = decode_batch(params, cfg, tokenizer, mel, **kwargs)

    # srt/vtt need timed segments: enable word alignment implicitly
    want_words = args.word_timestamps or fmt in ("srt", "vtt")
    word_timings = None
    if want_words:
        from whisper_context_biasing_tpu.decode import find_word_timestamps

        heads = parse_alignment_heads(args.alignment_heads)
        nf = [n // 320 for n in true_lengths]  # content frames per clip
        word_timings = find_word_timestamps(
            params, cfg, tokenizer, mel, hyps,
            starts=starts, num_frames=nf, alignment_heads=heads)
    wall = time.time() - t0

    texts = [tokenizer.decode(h, skip_special_tokens=True).strip() for h in hyps]
    audio_seconds = sum(true_lengths) / 16000  # pre-padding durations
    rendered = []
    for i, (path, text) in enumerate(zip(args.audio, texts)):
        words = word_timings[i] if word_timings is not None else None
        segs = words_to_segments(words) if words is not None else None
        rendered.append(emit(args, fmt, path, text, segs, words,
                             language=langs[i]))
    write_outputs(args, fmt, rendered)
    print(f"[{len(args.audio)} files, {audio_seconds:.1f}s audio in {wall:.2f}s "
          f"= {audio_seconds / wall:.1f}x realtime]", file=sys.stderr)


if __name__ == "__main__":
    main()
