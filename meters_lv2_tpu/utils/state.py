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
"""

from __future__ import annotations

import io

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
    """Serialize a meter-state pytree to .npz (host roundtrip)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    np.savez(path_or_file, **arrays)


def load_state(like_state, path_or_file):
    """Restore a pytree saved by save_state; `like_state` supplies the
    structure (and device placement via the default device)."""
    data = np.load(path_or_file)
    leaves, treedef = jax.tree_util.tree_flatten(like_state)
    n = len(leaves)
    new_leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
