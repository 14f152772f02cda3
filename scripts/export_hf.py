#!/usr/bin/env python
"""Export a native checkpoint to HF Whisper format (model.safetensors).

The reference's artifacts are HF checkpoints (hub pushes,
/root/reference/scripts/train.py:285-307); this closes the interop loop:
models fine-tuned here load in transformers / any HF tooling.

    python scripts/export_hf.py --model base.en \
        --checkpoint results/checkpoint-405 --out exported/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    p = argparse.ArgumentParser(description="Export native checkpoint to HF format")
    p.add_argument("--model", default="base.en",
                   help="architecture name (sets dims for native checkpoints)")
    p.add_argument("--checkpoint", required=True,
                   help="native checkpoint-N dir (params.npz) or an HF "
                        "safetensors file/dir (roundtrip)")
    p.add_argument("--out", required=True,
                   help="output directory (or .safetensors path)")
    args = p.parse_args()

    from whisper_context_biasing_tpu.models import (
        get_config, load_checkpoint_or_safetensors, save_safetensors,
    )

    from whisper_context_biasing_tpu.train.checkpoint import is_native_checkpoint

    native = is_native_checkpoint(args.checkpoint)
    # native checkpoints need --model for dims; HF inputs carry their own
    # dims — inferring them prevents silently truncating a bigger model
    cfg = get_config(args.model) if native else None
    params, cfg = load_checkpoint_or_safetensors(args.checkpoint, cfg)
    save_safetensors(params, cfg, args.out)
    dest = (args.out if args.out.endswith(".safetensors")
            else os.path.join(args.out, "model.safetensors"))
    print(f"exported {args.model} weights -> {dest}")


if __name__ == "__main__":
    main()
