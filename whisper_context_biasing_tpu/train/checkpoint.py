"""Checkpoint / resume.

The reference relies on HF Trainer ``checkpoint-NNN`` dirs with
``save_total_limit=1`` and best-by-eval-WER selection
(scripts/train.py:236,242-245; scripts/evaluation.py:75-94). This module
provides the same lifecycle natively and offline:

  * ``save_checkpoint(dir, state_dict)`` -> ``checkpoint-{step}/`` with the
    flattened pytree in a single .npz plus a json metadata/trainer-state file
  * retention: keep the newest N checkpoints plus the best-by-wer one
  * ``latest_checkpoint`` / ``find_best_checkpoint`` mirror the reference's
    resume and best-selection logic (max by step / min by eval_wer scanned
    from the recorded log history)
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

import jax
import numpy as np

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def fix(node):
        if not isinstance(node, dict):
            return node
        keys = list(node)
        if keys and all(k.isdigit() for k in keys):
            return [fix(node[k]) for k in sorted(keys, key=int)]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def is_native_checkpoint(path: str) -> bool:
    """True when ``path`` is a checkpoint-N dir this module can load —
    either npz (``params.npz``) or Orbax (``params_ocp/``) backed. The one
    detection rule every entry point shares (train/evaluation/export/
    acceptance CLIs, models.load_checkpoint_or_safetensors)."""
    if not path or not os.path.isdir(path):
        return False
    return (os.path.isfile(os.path.join(path, "params.npz"))
            or os.path.isdir(os.path.join(path, "params_ocp")))


def _orbax_save(path: str, params, opt_state) -> None:
    """Orbax (tensorstore) array serialization: sharded jax.Arrays are
    written without a host gather — each device contributes its own shards,
    the scalable path for large meshes (SURVEY §5's 'Orbax-style' ask). The
    pytree is flattened to a string-keyed dict so restore needs no
    structure template."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params_ocp"), _flatten_jax(params),
                   force=True)
        if opt_state is not None:
            ckptr.save(os.path.join(path, "opt_ocp"),
                       {str(i): a for i, a in
                        enumerate(jax.tree.leaves(opt_state))},
                       force=True)


def _flatten_jax(tree: Any, prefix: str = "") -> dict[str, Any]:
    """_flatten without the np.asarray host gather (orbax consumes
    jax.Arrays, sharded or not, directly)."""
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten_jax(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_jax(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def save_checkpoint(
    output_dir: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    metadata: dict | None = None,
    keep: int = 1,
    best_metric_key: str = "eval_wer",
    backend: str = "npz",
) -> str:
    """``backend="orbax"`` writes arrays through Orbax/tensorstore (sharded
    arrays save without a host gather); everything else — directory layout,
    trainer_state.json, retention, best-selection — is backend-invariant,
    and ``load_checkpoint`` auto-detects the format."""
    path = os.path.join(output_dir, f"checkpoint-{step}")
    os.makedirs(path, exist_ok=True)
    if backend == "orbax":
        _orbax_save(path, params, opt_state)
    elif backend == "npz":
        params_np = jax.tree.map(np.asarray, params)
        np.savez(os.path.join(path, "params.npz"), **_flatten(params_np))
        if opt_state is not None:
            opt_np = jax.tree.map(np.asarray, jax.tree.leaves(opt_state))
            np.savez(
                os.path.join(path, "opt_state.npz"),
                **{str(i): a for i, a in enumerate(opt_np)},
            )
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r} "
                         "(expected 'npz' or 'orbax')")
    meta = {"step": step, **(metadata or {})}
    with open(os.path.join(path, "trainer_state.json"), "w") as f:
        json.dump(meta, f, indent=2)
    _apply_retention(output_dir, keep, best_metric_key)
    return path


def _apply_retention(output_dir: str, keep: int, best_metric_key: str) -> None:
    ckpts = list_checkpoints(output_dir)
    if len(ckpts) <= keep:
        return
    best = find_best_checkpoint(output_dir, metric_key=best_metric_key)
    by_step = sorted(ckpts, key=lambda p: checkpoint_step(p))
    protected = set(by_step[-keep:])
    if best:
        protected.add(best)
    for c in by_step:
        if c not in protected:
            shutil.rmtree(c, ignore_errors=True)


def list_checkpoints(output_dir: str) -> list[str]:
    if not os.path.isdir(output_dir):
        return []
    return [
        os.path.join(output_dir, d)
        for d in os.listdir(output_dir)
        if _CKPT_RE.match(d) and os.path.isdir(os.path.join(output_dir, d))
    ]


def checkpoint_step(path: str) -> int:
    m = _CKPT_RE.match(os.path.basename(path))
    return int(m.group(1)) if m else -1


def latest_checkpoint(output_dir: str) -> str | None:
    """Resume source: newest checkpoint-N (scripts/train.py:172-176)."""
    ckpts = list_checkpoints(output_dir)
    return max(ckpts, key=checkpoint_step) if ckpts else None


def find_best_checkpoint(output_dir: str, metric_key: str = "eval_wer") -> str | None:
    """Checkpoint whose OWN eval metric is lowest.

    Attribution rule: the save path stamps the latest eval value plus the
    step it was measured at (``eval_step``). The stamp counts as the
    checkpoint's own metric only when ``eval_step`` equals the checkpoint's
    step — when save_steps is not a multiple of eval_steps the stamped value
    was produced by an EARLIER step's params, and judging by it could retain
    a checkpoint that never achieved it. Checkpoints with same-step stamps
    are preferred outright; only if none exist does selection fall back to
    stale stamps / scanning log_history (the reference's method,
    scripts/evaluation.py:75-94, kept for reference-style checkpoints)."""
    attributed, attributed_val = None, float("inf")
    fallback, fallback_val = None, float("inf")
    for c in sorted(list_checkpoints(output_dir), key=checkpoint_step):
        state_file = os.path.join(c, "trainer_state.json")
        if not os.path.isfile(state_file):
            continue
        with open(state_file) as f:
            meta = json.load(f)
        step = checkpoint_step(c)
        # a stamp is the checkpoint's OWN metric when eval_step matches, or
        # (legacy stamps without eval_step) when log_history shows an eval
        # at exactly this step with this value — verifiable attribution for
        # checkpoints written before the eval_step key existed
        own = metric_key in meta and (
            meta.get("eval_step") == step
            or ("eval_step" not in meta and any(
                e.get("step") == step and e.get(metric_key) == meta[metric_key]
                for e in meta.get("log_history", [])))
        )
        if own:
            if meta[metric_key] < attributed_val:
                attributed_val, attributed = meta[metric_key], c
            continue
        if metric_key in meta:
            val = meta[metric_key]  # stale or legacy (no eval_step) stamp
        else:
            val = min((e[metric_key] for e in meta.get("log_history", [])
                       if metric_key in e), default=None)
        if val is not None and val < fallback_val:
            fallback_val, fallback = val, c
    return attributed if attributed is not None else fallback


def load_checkpoint(path: str, opt_state_template: Any = None):
    """Returns (params, opt_state_or_None, metadata). The storage backend
    (npz / orbax) is auto-detected from the directory contents; both return
    host numpy arrays — callers re-shard onto their mesh as usual."""
    ocp_dir = os.path.join(path, "params_ocp")
    if os.path.isdir(ocp_dir):
        import orbax.checkpoint as ocp

        def restore_flat(ckptr, d):
            # restore to host numpy regardless of the devices the arrays
            # were sharded over at save time (a checkpoint written on an
            # 8-chip mesh must load on any topology — callers re-shard)
            im = ckptr.metadata(d).item_metadata
            tmpl = {k: np.empty(v.shape, v.dtype) for k, v in im.items()}
            return ckptr.restore(d, tmpl)

        with ocp.StandardCheckpointer() as ckptr:
            flat = restore_flat(ckptr, ocp_dir)
            params = _unflatten(
                {k: np.asarray(v) for k, v in flat.items()})
            opt_state = None
            opt_dir = os.path.join(path, "opt_ocp")
            if opt_state_template is not None and os.path.isdir(opt_dir):
                flat_opt = restore_flat(ckptr, opt_dir)
                leaves = [np.asarray(flat_opt[str(i)])
                          for i in range(len(flat_opt))]
                opt_state = jax.tree.unflatten(
                    jax.tree.structure(opt_state_template), leaves)
    else:
        with np.load(os.path.join(path, "params.npz")) as z:
            params = _unflatten({k: z[k] for k in z.files})
        opt_state = None
        opt_file = os.path.join(path, "opt_state.npz")
        if opt_state_template is not None and os.path.isfile(opt_file):
            with np.load(opt_file) as z:
                leaves = [z[str(i)] for i in range(len(z.files))]
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state_template), leaves)
    with open(os.path.join(path, "trainer_state.json")) as f:
        meta = json.load(f)
    return params, opt_state, meta
