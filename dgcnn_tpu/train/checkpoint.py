"""Checkpoint save/restore.

Reference: periodic `tf.train.Saver.save` to WEIGHT_PREFIX, restore from
MODEL_PATH for resume/inference [H per SURVEY.md §2 #8]. The rebuild
serializes the full train state pytree ``{params, model_state, opt_state,
step, rng}`` plus the config to a single msgpack file
``{weight_prefix}-{step}.ckpt`` (flax.serialization — no TF dependency),
with the same flag surface (`--weight_prefix`, `--model_path`,
`--checkpoint_step`).
"""

from __future__ import annotations

import glob
import json
import os
import re

import jax
import numpy as np
from flax import serialization


def save(path_prefix: str, step: int, tree, config_dict=None) -> str:
    """Write ``{path_prefix}-{step}.ckpt``; returns the path."""
    d = os.path.dirname(path_prefix)
    if d:
        os.makedirs(d, exist_ok=True)
    payload = {
        "tree": serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, tree)
        ),
        "step": int(step),
        "config": json.dumps(config_dict or {}, default=list),
    }
    path = f"{path_prefix}-{step}.ckpt"
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint
    return path


def _step_of(path_prefix: str, path: str):
    """Step number iff ``path`` is EXACTLY ``{prefix}-<step>.ckpt``.

    A loose ``-(\\d+).ckpt$`` suffix search would also match checkpoints
    of a sibling run whose prefix extends this one (``snap-lr01-700.ckpt``
    matches prefix ``snap``) — fatal for prune(), which deletes."""
    m = re.fullmatch(re.escape(path_prefix) + r"-(\d+)\.ckpt", path)
    return int(m.group(1)) if m else None


def prune(path_prefix: str, keep: int) -> list:
    """Delete all but the ``keep`` highest-step checkpoints of a prefix
    (the reference's Saver keeps a bounded history [M]); returns the
    removed paths. ``keep <= 0`` keeps everything."""
    if keep <= 0:
        return []
    found = []
    for p in glob.glob(f"{path_prefix}-*.ckpt"):
        step = _step_of(path_prefix, p)
        if step is not None:
            found.append((step, p))
    found.sort()
    removed = []
    for _, p in found[:-keep] if len(found) > keep else []:
        try:
            os.remove(p)
            removed.append(p)
        except OSError:
            pass
    return removed


def latest(path_prefix: str):
    """Highest-step checkpoint path for a prefix, or None."""
    best, best_step = None, -1
    for p in glob.glob(f"{path_prefix}-*.ckpt"):
        step = _step_of(path_prefix, p)
        if step is not None and step > best_step:
            best, best_step = p, step
    return best


def _mismatch_error(path, payload, err):
    saved = json.loads(payload.get("config", "{}"))
    hints = {
        k: saved.get(k)
        for k in (
            "model_name", "edge_filters", "head_feat_dim", "head_mlp",
            "block_convs", "optimizer", "lr_schedule", "num_class",
        )
    }
    return ValueError(
        f"checkpoint {path!r} does not match the current run "
        f"configuration: {err}\nThe checkpoint was saved with {hints}; "
        f"pass matching model/optimizer flags to resume from it."
    )


def peek(path: str):
    """Raw payload dict (keys: tree/step/config), without a pytree
    template. For consumers that must inspect shapes before building the
    model — e.g. serving export derives ``in_dim`` from the first
    EdgeConv weight instead of assuming F=4 — and that then pass the
    payload to ``restore_subtrees`` so the file is parsed once."""
    if not os.path.exists(path):
        cand = latest(path)
        if cand is None:
            raise FileNotFoundError(f"no checkpoint at {path!r}")
        path = cand
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_subtrees(path: str, templates: dict, payload: dict | None = None):
    """Load only named top-level entries (e.g. params/model_state) — for
    consumers that don't carry optimizer state (inference, serving
    export). ``payload`` short-circuits the file read when the caller
    already holds the deserialized checkpoint (e.g. from ``peek``)."""
    if payload is None:
        if not os.path.exists(path):
            cand = latest(path)
            if cand is None:
                raise FileNotFoundError(f"no checkpoint at {path!r}")
            path = cand
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
    tree_sd = payload["tree"]
    try:
        out = {
            k: serialization.from_state_dict(t, tree_sd[k])
            for k, t in templates.items()
        }
    except (ValueError, KeyError) as e:
        raise _mismatch_error(path, payload, e) from e
    return out, int(payload["step"]), json.loads(payload["config"])


# flags that define the trained function but do NOT all change parameter
# shapes — kvalue, knn_every and (at uniform widths) model_name alter
# predictions with byte-identical checkpoints, so a serving run that
# forgets to repeat them would silently compute a different model
MODEL_FLAGS = (
    "model_name", "num_class", "kvalue", "edge_filters",
    "head_feat_dim", "head_mlp", "global_pool", "knn_every",
    "block_convs", "knn_window", "head_factorized",
)


def model_flag_diffs(cfg, saved: dict) -> dict:
    """{flag: (current, saved)} for model-defining flags that disagree
    with the checkpoint's recorded config."""
    diffs = {}
    for k in MODEL_FLAGS:
        if k not in saved or saved[k] is None:
            continue
        cur = getattr(cfg, k, None)
        sav = saved[k]
        if isinstance(cur, tuple):
            sav = tuple(sav)
        if cur != sav:
            diffs[k] = (cur, sav)
    return diffs


def adopt_model_flags(cfg, path: str | None = None, payload: dict | None = None):
    """Return ``cfg`` with the checkpoint's model-defining flags adopted.

    Inference/export call this so the served function IS the trained
    function regardless of which flags the user repeated on the command
    line (training-time flags like lr/optimizer are never touched).
    Prints what was adopted; re-validates the merged config."""
    import dataclasses

    if payload is None:
        payload = peek(path)
    saved = json.loads(payload.get("config", "{}"))
    diffs = model_flag_diffs(cfg, saved)
    if not diffs:
        return cfg
    repl = {
        k: (tuple(sav) if isinstance(getattr(cfg, k), tuple) else sav)
        for k, (_, sav) in diffs.items()
    }
    print(
        "adopting model flags from checkpoint: "
        + ", ".join(f"{k}={v}" for k, v in sorted(repl.items())),
        flush=True,
    )
    cfg = dataclasses.replace(cfg, **repl)
    if hasattr(cfg, "validate"):
        cfg.validate()
    return cfg


def restore(path: str, tree_template):
    """Load a checkpoint into the structure of ``tree_template``.

    Args:
      path: a ``.ckpt`` file, or a prefix (the newest step is picked).

    Returns:
      (tree, step, config_dict)
    """
    if not os.path.exists(path):
        cand = latest(path)
        if cand is None:
            raise FileNotFoundError(f"no checkpoint at {path!r}")
        path = cand
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    try:
        tree = serialization.from_state_dict(tree_template, payload["tree"])
    except (ValueError, KeyError) as e:
        raise _mismatch_error(path, payload, e) from e
    return tree, int(payload["step"]), json.loads(payload["config"])
