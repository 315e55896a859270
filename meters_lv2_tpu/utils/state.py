"""Checkpoint / save-restore of meter state.

The reference persists small UI/config words through the LV2 State
interface (src/ebulv2.cc:514-553 packs ui_settings | transport_mode<<8 |
radar_speed<<16 into one uint32; src/goniometerlv2.c:210-293 stores float
vectors of display prefs).  Measurement state is not persisted there —
resume restarts measurement.

This framework goes further: any meter state is a pytree of arrays, so a
full measurement checkpoint is a tree-serialize.  Both are provided:

- pack_settings / unpack_settings: the reference's bit-packed config word
- save_state / load_state: full measurement checkpoint (npz), enabling
  resume of long-running batch jobs mid-stream

Compatibility: checkpoints capture internal state REPRESENTATIONS (e.g.
a filter's state-space realization), which may change between framework
versions while keeping identical shapes — load_state validates
count/shape/dtype, so restore checkpoints with the same framework
version that wrote them (the same caveat applies to the reference's LV2
State across plugin versions).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def pack_settings(ui_settings: int = 0, transport_mode: int = 0, radar_speed: int = 0) -> int:
    """EBU plugin state word (src/ebulv2.cc:519-524)."""
    return (ui_settings & 0xFF) | ((transport_mode & 0xFF) << 8) | ((radar_speed & 0xFFFF) << 16)


def unpack_settings(word: int) -> dict:
    return {
        "ui_settings": word & 0xFF,
        "transport_mode": (word >> 8) & 0xFF,
        "radar_speed": (word >> 16) & 0xFFFF,
    }


def save_state_sharded(state, path: str) -> None:
    """Checkpoint a (possibly mesh-sharded) meter-state pytree with orbax.

    Unlike save_state (host npz roundtrip), each device writes its own
    shards — no host gather — so long-running sharded analyses
    (parallel/r128_sharded on a dp x sp mesh) checkpoint at device speed.
    `path` must be a fresh absolute directory."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load_state_sharded(like_state, path: str):
    """Restore a save_state_sharded checkpoint, re-sharding to match
    `like_state`'s shardings (arrays land on the same mesh layout)."""
    import orbax.checkpoint as ocp

    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        like_state,
    )
    return ocp.StandardCheckpointer().restore(path, target)


def save_state(state, path_or_file):
    """Serialize a meter-state pytree to .npz (host roundtrip).

    A string/Path target is written at exactly that path (np.savez alone
    would append '.npz' when the suffix is missing, making save/load
    asymmetric for extensionless paths)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    if isinstance(path_or_file, (str, os.PathLike)):
        with open(path_or_file, "wb") as f:
            np.savez(f, **arrays)
    else:
        np.savez(path_or_file, **arrays)


def load_state(like_state, path_or_file):
    """Restore a pytree saved by save_state; `like_state` supplies the
    structure (and device placement via the default device).

    Leaves map positionally, so a checkpoint from a different tree would
    silently land in the wrong slots; guard by validating leaf count and
    per-leaf shape/dtype against `like_state` before materializing."""
    leaves, treedef = jax.tree_util.tree_flatten(like_state)
    n = len(leaves)
    with np.load(path_or_file) as data:  # close the npz fd promptly
        saved_n = sum(1 for k in data.files if k.startswith("leaf_"))
        if saved_n != n:
            raise ValueError(
                f"checkpoint has {saved_n} leaves, expected {n} — saved "
                "from a different meter configuration"
            )
        new_leaves = []
        for i, like in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            want_shape = np.shape(like)
            want_dtype = getattr(like, "dtype", None)
            if arr.shape != want_shape or (
                want_dtype is not None and arr.dtype != want_dtype
            ):
                raise ValueError(
                    f"checkpoint leaf {i} is {arr.shape}/{arr.dtype}, "
                    f"expected {want_shape}/{want_dtype} — saved from a "
                    "different meter configuration"
                )
            new_leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
